"""Similarity-search tests: brute-force exactness vs numpy, IVF recall,
embedding near-dup clustering."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fluent_plugin_geoip_ray.stages.similarity import (
    embedding_near_dup,
    knn_brute_force,
    knn_ivf,
)


def make_vectors(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m


def vec_ds(m):
    return rd.from_arrow(
        pa.table({
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), type=pa.float32()), m.shape[1]
            ).cast(pa.list_(pa.float32())),
        })
    )


def numpy_topk(m, q, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = qn @ mn.T
    return [list(np.argsort(-scores[i], kind="stable")[:k]) for i in range(len(q))]


def test_brute_force_matches_numpy():
    m = make_vectors()
    q = m[:2]
    out = knn_brute_force(vec_ds(m), q, k=5).to_pandas()
    expect = numpy_topk(m.astype(np.float64), q.astype(np.float64), 5)
    for qid in (0, 1):
        got = list(out[out["query_id"] == qid].sort_values("rank")["vec_id"])
        assert got == expect[qid]
    # self is always rank 1 with score ~1
    assert out[out["rank"] == 1]["score"].min() > 0.999999


def test_ivf_recall_reasonable():
    m = make_vectors(n=400)
    q = m[:3]
    exact = knn_brute_force(vec_ds(m), q, k=10).to_pandas()
    approx = knn_ivf(vec_ds(m), q, k=10, n_clusters=8, nprobe=4,
                     sample_n=400).to_pandas()
    recall = 0
    for qid in range(3):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall += len(e & a) / len(e)
    assert recall / 3 >= 0.6  # nprobe=4 of 8 clusters


def test_embedding_near_dup_drops_clones():
    m = make_vectors(n=50)
    clones = np.vstack([m, m[:5] * 1.0001])  # near-identical copies, ids 50..54
    out = embedding_near_dup(vec_ds(clones), threshold=0.999).to_pandas()
    ids = set(out["vec_id"])
    assert {0, 1, 2, 3, 4}.issubset(ids)
    assert not ids.intersection({50, 51, 52, 53, 54})
