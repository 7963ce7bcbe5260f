"""Property-based differential test: the join family vs DuckDB.

Hypothesis generates two small tables with overlapping int64 keys,
null keys scattered across BLOCKS (the lane-flip regression shape),
duplicate right keys and duplicate timestamps; every example runs
bucketed_join (inner/left/full), semi_join_big / anti_join_big, and
asof_join / asof_join_big through the real Ray pipelines and compares
row-for-row against DuckDB's JOIN / EXISTS / ASOF JOIN.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import Phase, given, settings, strategies as st

from fluent_plugin_geoip_ray.stages.join import (
    anti_join_big,
    asof_join,
    asof_join_big,
    bucketed_join,
    semi_join_big,
)


@st.composite
def join_case(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    nl = draw(st.integers(min_value=1, max_value=120))
    nr = draw(st.integers(min_value=0, max_value=80))
    key_space = draw(st.integers(min_value=1, max_value=25))
    base = np.datetime64("2026-01-01T00:00:00", "us")

    def side(n, tag):
        k = rng.integers(0, key_space, n).astype(np.float64)
        k[rng.random(n) < draw(st.floats(0.0, 0.25))] = np.nan
        return pd.DataFrame({
            f"{tag}id": np.arange(n, dtype=np.int64),
            "k": pd.array(k).astype("Int64"),
            f"{tag}t": (base + (rng.integers(0, 50, n) * 10**6)
                        .astype("timedelta64[us]")),
            f"{tag}v": np.round(rng.normal(size=n), 3),
        })

    nparts = draw(st.integers(min_value=1, max_value=4))
    return side(nl, "l"), side(nr, "r"), nparts


def _duck(frames: dict, sql: str, sort_cols: list) -> pd.DataFrame:
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    out = con.execute(sql).fetchdf()
    con.close()
    return out.sort_values(sort_cols).reset_index(drop=True)


def _ray(res, sort_cols: list) -> pd.DataFrame:
    df = res.to_pandas()
    if df.empty:        # Ray drops columns on 0-row datasets
        return df
    return df.sort_values(sort_cols).reset_index(drop=True)


def _eq(got, exp, cols):
    assert len(got) == len(exp), f"rows {len(got)} vs {len(exp)}"
    if len(exp) == 0:
        return
    for c in cols:
        g = got[c].to_numpy(dtype=np.float64, na_value=np.nan)
        e = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
        assert np.array_equal(g, e, equal_nan=True), \
            f"column {c}:\ngot {g[:15]}\nexp {e[:15]}"


@settings(max_examples=10, deadline=None,
          phases=(Phase.explicit, Phase.reuse, Phase.generate))
@given(join_case())
def test_join_family_matches_duckdb(case):
    ldf, rdf, nparts = case
    # ingest via Arrow: Ray cannot derive Arrow types from pandas
    # extension (Int64) blocks, and the big joins fail fast on that
    lt_, rt_ = (pa.Table.from_pandas(d, preserve_index=False)
                for d in (ldf, rdf))

    def blocks(t):
        if t.num_rows == 0:
            return rd.from_arrow(t)
        step = max(t.num_rows // nparts, 1)
        return rd.from_arrow(
            [t.slice(s, step) for s in range(0, t.num_rows, step)])

    lds = lambda: blocks(lt_)   # noqa: E731
    rds = lambda: blocks(rt_)   # noqa: E731
    frames = {"l": ldf, "r": rdf}

    # --- bucketed equi-join, all three hows ---
    for how, sql_how in (("inner", "JOIN"), ("left", "LEFT JOIN"),
                         ("full", "FULL JOIN")):
        got = _ray(bucketed_join(lds(), rds(), on=["k"], how=how,
                                 num_buckets=8),
                   ["lid", "rid"])
        exp = _duck(frames, f"""
            SELECT l.lid, l.k AS k, r.rid, r.rv
            FROM l {sql_how} r USING (k)""", ["lid", "rid"])
        # full join pads k from either side; compare the id/value cols
        _eq(got, exp, ["lid", "rid", "rv"])

    # --- EXISTS / NOT EXISTS ---
    got = _ray(semi_join_big(lds(), rds(), on="k", num_buckets=8), ["lid"])
    exp = _duck(frames, """
        SELECT * FROM l WHERE EXISTS
            (SELECT 1 FROM r WHERE r.k = l.k)""", ["lid"])
    _eq(got, exp, ["lid", "k", "lv"])

    got = _ray(anti_join_big(lds(), rds(), on="k", num_buckets=8), ["lid"])
    exp = _duck(frames, """
        SELECT * FROM l WHERE NOT EXISTS
            (SELECT 1 FROM r WHERE r.k = l.k)""", ["lid"])
    _eq(got, exp, ["lid", "k", "lv"])

    # --- as-of (backward): broadcast and bucketed must both match SQL ---
    # deduplicate (k, rt) marker pairs so the matched VALUE is unique
    # (SQL ASOF picks an arbitrary row among same-key-same-time markers)
    marks = (rdf.dropna(subset=["k"])
             .sort_values("rid").drop_duplicates(["k", "rt"]))
    frames_a = {"l": ldf, "m": marks}
    exp = _duck(frames_a, """
        SELECT l.lid, m.rv AS mv
        FROM l ASOF LEFT JOIN m
          ON l.k = m.k AND l.lt >= m.rt""", ["lid"])
    # the broadcast helper expects the right side to carry the same
    # `on` column name; rename the marker time accordingly
    m2 = marks.rename(columns={"rt": "lt"})[["k", "lt", "rv"]]
    got_b = _ray(asof_join(lds(), m2, on="lt", by="k",
                           right_cols={"rv": "mv"}), ["lid"])
    _eq(got_b, exp, ["lid", "mv"])

    mt = pa.Table.from_pandas(m2, preserve_index=False)
    got_big = _ray(asof_join_big(
        lds(), rd.from_arrow(mt), on="lt", by="k",
        right_cols={"rv": "mv"}, num_buckets=8), ["lid"])
    _eq(got_big, exp, ["lid", "mv"])
