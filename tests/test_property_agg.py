"""Property test: groupby_agg over the bucketed exchange == pandas, for
randomized schemas (null string keys, negative ints, empty groups, many
partitions)."""

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from fluent_plugin_geoip_ray.stages.aggregate import groupby_agg


@st.composite
def agg_frames(draw):
    n = draw(st.integers(1, 400))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    key_kind = draw(st.sampled_from(["str", "int"]))
    if key_kind == "str":
        pool = ["a", "b", "c", None, "", "dd"]
        keys = rng.choice(len(pool), n)
        k = pd.array([pool[i] for i in keys], dtype="string")
    else:
        k = pd.array(rng.integers(-5, 5, n), dtype="int64")
    v = rng.integers(-1000, 1000, n).astype("int64")
    null_frac = draw(st.floats(0, 0.3))
    vmask = rng.random(n) < null_frac
    vv = pd.array(v, dtype="Int64")
    vv[vmask] = pd.NA
    parts = draw(st.integers(1, 7))
    return pd.DataFrame({"k": k, "v": vv}), parts


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(agg_frames())
def test_groupby_agg_bucketed_matches_pandas(case):
    df, parts = case
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = groupby_agg(rd.from_arrow(t).repartition(parts), ["k"],
                      [("v", "sum", "s"), ("v", "count", "c"),
                       ("v", "min", "lo"), ("v", "max", "hi"),
                       ("v", "count_star", "n")],
                      merge="bucketed").to_pandas()
    # SQL SUM of an all-null group is NULL (pandas defaults to 0)
    ref = df.groupby("k", dropna=False).agg(
        s=("v", lambda x: x.sum(min_count=1)), c=("v", "count"),
        lo=("v", "min"), hi=("v", "max"), n=("v", "size")).reset_index()
    assert len(out) == len(ref)
    key = lambda d: d.assign(
        __k=d["k"].astype("string").fillna("\x00NULL")) \
        .sort_values("__k").reset_index(drop=True)
    a, b = key(out), key(ref)
    assert (a["__k"] == b["__k"]).all()
    for c in ("c", "n"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    for c in ("s", "lo", "hi"):
        av = pd.array(a[c], dtype="Float64")
        bv = pd.array(b[c], dtype="Float64")
        eq = (av.isna() & bv.isna()) | (av == bv)
        assert bool(pd.array(eq).fillna(False).all()), c
