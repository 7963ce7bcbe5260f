"""Streaming-shaped operators: tumbling / sliding / session windows.

Ray Data has no event-time windowing; per the category sweep (SURVEY §2.3)
the reference has none either, but a log/telemetry engine needs them.  The
input is treated as an ordered partitioned log (the ``events`` table):

* tumbling: window id = ``ts // size`` computed vectorized per batch, then
  the partial+final grouped aggregate -- no sort needed at all.
* sliding: each event belongs to ``size/step`` windows; the assignment is an
  exploded vectorized repeat per batch, counts via partial+final groupby.
* session: gap-based sessionization needs per-key time order ->
  ``groupby(key).map_groups`` over ts-sorted groups (the documented
  partitioning assumption: one key's events fit one group).
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

    from ray.data.aggregate import Sum

    partials = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(keys + ["window_start"]).aggregate(Sum("n", alias_name="n"))


def session_windows(ds, key: str = "user_id", ts_col: str = "ts",
                    gap_sec: int = 1800, order_tiebreak: str | None = None):
    """Gap-based sessionization per key.

    Shuffle partitions by ``key`` (skew note: a single key's events must fit
    in one group -- salt upstream if one key dominates); within each group
    events are ts-sorted and a new session starts when the gap from the
    previous event exceeds ``gap_sec``.  Emits (key, session_idx, n_events,
    ts_min, ts_max) with session_idx numbered 1.. per key in time order --
    equivalent to the SQL lag()+cumulative-sum idiom, which the oracle uses.
    """
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
