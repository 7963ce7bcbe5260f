"""Token-budget sequence packing: prefix-sum binning, partition-invariant."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fluent_plugin_geoip_ray.stages.pack import pack_bins


def _docs(n=200, seed=2):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_tokens": pa.array(rng.integers(10, 200, n).astype(np.int64)),
    })


def test_pack_matches_sequential_prefix():
    t = _docs()
    out = (
        pack_bins(rd.from_arrow(t), "doc_id", "n_tokens", budget=500)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    toks = t.column("n_tokens").to_numpy()
    excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert (out["pack_id"].to_numpy() == excl // 500).all()
    # bins are contiguous in key order and roughly budget-sized
    assert out["pack_id"].is_monotonic_increasing


def test_pack_partition_invariant():
    t = _docs()
    a = pack_bins(rd.from_arrow(t), "doc_id", "n_tokens", 500).to_pandas()
    b = pack_bins(rd.from_arrow(t).repartition(9), "doc_id", "n_tokens", 500).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["pack_id"] == b["pack_id"]).all()
