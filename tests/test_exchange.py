"""Direct tests for hash_exchange -- the substrate under every bucketed
join / dedup / aggregate path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fluent_plugin_geoip_ray.stages.exchange import hash_exchange


def _bucketed_table(n=5000, num_buckets=8, seed=0, with_strings=True):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 97, n)
    t = {
        "k": pa.array(keys.astype(np.int64)),
        "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        "__bucket": pa.array(
            (pd.util.hash_array(keys.astype(np.uint64)) % num_buckets)
            .astype(np.int32)),
    }
    if with_strings:
        t["s"] = pa.array([f"s{i % 13}" if i % 29 else None
                           for i in range(n)])
    return pa.table(t)


@pytest.mark.parametrize("num_buckets", [1, 8])
def test_exchange_partitions_exactly_once(num_buckets):
    t = _bucketed_table(num_buckets=num_buckets)

    def tag(g: pa.Table) -> pa.Table:
        # reduce fn sees the COMPLETE bucket: every k must map to one call
        return pa.table({
            "k": g.column("k"),
            "v": g.column("v"),
            "s": g.column("s"),
            "n_in_bucket": pa.array(
                np.full(g.num_rows, g.num_rows, np.int64)),
        })

    out = hash_exchange(rd.from_arrow(t).repartition(7), num_buckets, tag) \
        .to_pandas()
    # no row lost or duplicated
    src = t.to_pandas().drop(columns="__bucket")
    a = out[["k", "v", "s"]].sort_values(["k", "v", "s"],
                                         na_position="last") \
        .reset_index(drop=True)
    b = src.sort_values(["k", "v", "s"], na_position="last") \
        .reset_index(drop=True)
    assert a.equals(b)
    # co-location: each key appears in exactly one reduce call, so every
    # row of a key shares one n_in_bucket value
    per_key = out.groupby("k")["n_in_bucket"].nunique()
    assert (per_key == 1).all()


def test_exchange_empty_buckets_emit_no_block():
    # all rows in bucket 0 of 16 -> reduce must run once, not 16 times
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "__bucket": pa.array([0, 0, 0], pa.int32())})
    calls = []

    def fn(g: pa.Table) -> pa.Table:
        calls.append(g.num_rows)
        return g

    out = hash_exchange(rd.from_arrow(t), 16, fn)
    assert out.count() == 3
    # per-bucket fns never see 0-row input (map_groups semantics)
    assert all(c > 0 for c in calls) if calls else True


def test_exchange_zero_row_premap_blocks_flow_as_sentinels():
    # a 0-row block skips upstream map UDFs and arrives WITHOUT __bucket;
    # the exchange must pass it through silently
    t = _bucketed_table(n=100, num_buckets=4)
    empty = pa.table({"other": pa.array([], pa.string())})
    ds = rd.from_arrow(t).union(rd.from_arrow(empty))
    out = hash_exchange(ds, 4, lambda g: g)
    assert out.count() == 100


def test_exchange_nonempty_block_missing_bucket_raises():
    t = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="__bucket"):
        hash_exchange(rd.from_arrow(t), 4, lambda g: g).materialize()


def test_exchange_accepts_pandas_blocks():
    # upstream pandas-format maps produce pandas internal blocks
    t = _bucketed_table(n=500, num_buckets=4, with_strings=False)
    ds = rd.from_arrow(t).map_batches(lambda df: df, batch_format="pandas")
    out = hash_exchange(ds, 4, lambda g: g)
    assert out.count() == 500
