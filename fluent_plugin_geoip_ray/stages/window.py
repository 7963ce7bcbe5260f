"""Streaming-shaped operators: tumbling / sliding / session windows.

Ray Data has no event-time windowing; per the category sweep (SURVEY §2.3)
the reference has none either, but a log/telemetry engine needs them.  The
input is treated as an ordered partitioned log (the ``events`` table):

* tumbling: window id = ``ts // size`` computed vectorized per batch, then
  the partial+final grouped aggregate -- no sort needed at all.
* sliding: each event belongs to ``size/step`` windows; the assignment is an
  exploded vectorized repeat per batch, counts via partial+final groupby.
* session: gap-based sessionization needs per-key time order -> sorted-scan
  implementation (sessions are contiguous runs after a (key, ts) sort; one
  vectorized pass per block + O(blocks) boundary-carry scan); the
  per-group ``map_groups`` variant is kept only as a cross-check reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import groupby_agg


def _ts_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    col = batch.column(ts_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window(ds, ts_col: str = "ts", size_sec: int = 3600,
                    keys: list[str] | None = None,
                    aggs: list[tuple] | None = None):
    """Tumbling event-time windows: emits one row per (key..., window_start)
    with the requested aggregates (default: n = count)."""
    size_us = size_sec * 1_000_000
    keys = keys or []
    aggs = aggs or [(ts_col, "count", "n")]

    def assign(batch: pa.Table) -> pa.Table:
        w = (_ts_us(batch, ts_col) // size_us) * size_sec
        return batch.append_column("window_start", pa.array(w, type=pa.int64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return groupby_agg(assigned, keys + ["window_start"], aggs)


def sliding_window_counts(ds, ts_col: str = "ts", size_sec: int = 3600,
                          step_sec: int = 900, keys: list[str] | None = None):
    """Sliding-window counts: each event replicated into the ``size/step``
    windows covering it (vectorized explode), then partial+final counts."""
    assert size_sec % step_sec == 0
    k = size_sec // step_sec
    step_us = step_sec * 1_000_000
    keys = keys or []

    def explode(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch, ts_col)
        base = ts // step_us  # last step boundary at/before the event
        # windows starting at (base - j) * step for j in 0..k-1 contain ts
        starts = ((base[:, None] - np.arange(k)[None, :]) * step_sec).ravel()
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), k)
        cols = {"window_start": pa.array(starts, type=pa.int64())}
        for key in keys:
            col = batch.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[key] = col.take(pa.array(idx))
        t = pa.table(cols)
        g = t.group_by(keys + ["window_start"]).aggregate([([], "count_all")])
        return g.rename_columns(list(g.column_names[:-1]) + ["n"])

    partials = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return groupby_agg(partials, keys + ["window_start"], [("n", "sum", "n")])


def session_windows(ds, key: str = "user_id", ts_col: str = "ts",
                    gap_sec: int = 1800, order_tiebreak: str | None = None,
                    impl: str = "scan"):
    """Gap-based sessionization per key -> (key, session_idx, n_events,
    ts_min, ts_max), session_idx numbered 1.. per key in time order --
    equivalent to the SQL lag()+cumulative-sum idiom (the oracle).

    ``impl="scan"`` (default): global sort by (key, ts[, tiebreak]), then
    sessions are CONTIGUOUS runs -- one vectorized pass per block computes
    run breaks, with an O(blocks) boundary-carry scan (last row of each
    block -> next block's first-break flag + run-id offset) exactly like
    the pack_bins scan.  Run stats are per-block ``reduceat`` partials
    merged by run id; only O(blocks + sessions) rows ever leave the
    workers.  ``impl="groups"`` is the one-Python-call-per-key
    ``groupby().map_groups`` reference implementation -- 40x slower at
    15k keys (kept for cross-checking).
    """
    if impl == "scan":
        return _session_windows_scan(ds, key, ts_col, gap_sec, order_tiebreak)
    gap = np.timedelta64(gap_sec, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
        g = g.sort_values(sort_cols, kind="mergesort")
        ts = g[ts_col].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            brk[1:] = (np.diff(ts) > gap).astype(np.int64)
        sess = np.cumsum(brk)
        g = g.assign(__sess=sess)
        out = g.groupby("__sess").agg(
            n_events=(ts_col, "size"), ts_min=(ts_col, "min"), ts_max=(ts_col, "max")
        ).reset_index(names="session_idx")
        out.insert(0, key, g[key].iloc[0])
        # Pin physical types so the output hashes identically to a SQL
        # engine's (BIGINT session counters, microsecond timestamps): pandas
        # cumsum yields int64 but the datetime path is ns-width by default.
        out["session_idx"] = out["session_idx"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["ts_min"] = out["ts_min"].astype("datetime64[us]")
        out["ts_max"] = out["ts_max"].astype("datetime64[us]")
        return out

    return ds.groupby(key).map_groups(sessions, batch_format="pandas")


def _session_windows_scan(ds, key: str, ts_col: str, gap_sec: int,
                          order_tiebreak: str | None):
    """Sorted-scan sessionization (see :func:`session_windows`)."""
    import ray
    import ray.data as rd

    gap_us = np.int64(gap_sec) * 1_000_000
    sort_cols = [key, ts_col] + ([order_tiebreak] if order_tiebreak else [])
    sorted_ds = ds.sort(sort_cols).materialize()

    def _first_tb(batch: pa.Table):
        # block identity = full first-row sort tuple: with a tiebreak column
        # the tuple is unique per row, so blocks can never collide even when
        # duplicate (key, ts) rows split across block boundaries
        if not order_tiebreak:
            return 0
        col = batch.column(order_tiebreak)
        return int(col[0].as_py())

    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_key": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "first_tb": pa.array([], pa.int64()),
                             "last_key": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64()),
                             "internal_runs": pa.array([], pa.int64())})
        keys = batch.column(key)
        ts = _ts_us(batch, ts_col)
        k = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        kn = k.to_numpy(zero_copy_only=False)
        brk = np.empty(len(kn), dtype=bool)
        brk[0] = False  # boundary-carry decided on the driver
        if len(kn) > 1:
            brk[1:] = (kn[1:] != kn[:-1]) | (np.diff(ts) > gap_us)
        return pa.table({
            "first_key": pa.array([int(kn[0])], pa.int64()),
            "first_ts": pa.array([int(ts[0])], pa.int64()),
            "first_tb": pa.array([_first_tb(batch)], pa.int64()),
            "last_key": pa.array([int(kn[-1])], pa.int64()),
            "last_ts": pa.array([int(ts[-1])], pa.int64()),
            "internal_runs": pa.array([int(brk.sum())], pa.int64()),
        })

    summaries = pa.concat_tables(
        ray.get(
            sorted_ds.map_batches(
                block_summary, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).to_arrow_refs()
        )
    ).to_pandas()
    # blocks arrive in dataset (= sort) order; sanity-check monotonicity
    fk = summaries["first_key"].to_numpy()
    ft = summaries["first_ts"].to_numpy()
    lk = summaries["last_key"].to_numpy()
    lt = summaries["last_ts"].to_numpy()
    runs = summaries["internal_runs"].to_numpy()
    n_blocks = len(summaries)
    brk0 = np.zeros(n_blocks, dtype=bool)
    brk0[0] = True  # very first row starts run 1
    if n_blocks > 1:
        brk0[1:] = (fk[1:] != lk[:-1]) | (ft[1:] - lt[:-1] > gap_us)
    offsets = np.zeros(n_blocks, dtype=np.int64)
    acc = np.cumsum(brk0.astype(np.int64) + runs)
    offsets[1:] = acc[:-1]
    # block identified in pass 2 by its first-row sort tuple
    ftb = summaries["first_tb"].to_numpy()
    block_map = {
        (int(a), int(b), int(t)): (int(o), bool(c))
        for a, b, t, o, c in zip(fk, ft, ftb, offsets, brk0)
    }
    state = ray.put(block_map)

    def run_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "run_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "ts_min": pa.array([], pa.int64()),
                             "ts_max": pa.array([], pa.int64())})
        bm = ray.get(state)
        keys = batch.column(key)
        k = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        kn = k.to_numpy(zero_copy_only=False)
        ts = _ts_us(batch, ts_col)
        off, first_brk = bm[(int(kn[0]), int(ts[0]), _first_tb(batch))]
        brk = np.empty(len(kn), dtype=bool)
        brk[0] = first_brk
        if len(kn) > 1:
            brk[1:] = (kn[1:] != kn[:-1]) | (np.diff(ts) > gap_us)
        run_id = off + np.cumsum(brk.astype(np.int64))  # global, contiguous
        # per-run stats via reduceat over contiguous runs; row 0 always
        # starts a partial segment (its run may continue from prev block)
        seg = brk.copy()
        seg[0] = True
        starts = np.flatnonzero(seg)
        n_ev = np.diff(np.append(starts, len(kn)))
        return pa.table({
            key: pa.array(kn[starts]),
            "run_id": pa.array(run_id[starts]),
            "n_events": pa.array(n_ev.astype(np.int64)),
            "ts_min": pa.array(ts[starts]),
            "ts_max": pa.array(ts[np.append(starts[1:], len(kn)) - 1]),
        })

    partials = pa.concat_tables(
        ray.get(
            sorted_ds.map_batches(
                run_partials, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).to_arrow_refs()
        )
    ).combine_chunks()
    # merge boundary-spanning runs (a run spans blocks only at block edges)
    g = partials.group_by(["run_id"]).aggregate(
        [(key, "min"), ("n_events", "sum"), ("ts_min", "min"), ("ts_max", "max")]
    )
    kn = g.column(f"{key}_min").to_numpy(zero_copy_only=False)
    rid = g.column("run_id").to_numpy(zero_copy_only=False)
    nev = g.column("n_events_sum").to_numpy(zero_copy_only=False)
    tmin = g.column("ts_min_min").to_numpy(zero_copy_only=False)
    tmax = g.column("ts_max_max").to_numpy(zero_copy_only=False)
    order = np.lexsort((rid, kn))
    kn, rid, nev = kn[order], rid[order], nev[order]
    tmin, tmax = tmin[order], tmax[order]
    firsts = np.r_[True, kn[1:] != kn[:-1]]
    group_start = np.maximum.accumulate(np.where(firsts, np.arange(len(kn)), 0))
    session_idx = np.arange(len(kn)) - group_start + 1
    import ray.data as rd

    return rd.from_arrow(pa.table({
        key: pa.array(kn.astype(np.int64)),
        "session_idx": pa.array(session_idx.astype(np.int64)),
        "n_events": pa.array(nev.astype(np.int64)),
        "ts_min": pa.array(tmin).cast(pa.timestamp("us")),
        "ts_max": pa.array(tmax).cast(pa.timestamp("us")),
    }))
