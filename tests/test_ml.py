"""Distributed logistic regression: numpy-referee parity and planted-
separation recovery."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fluent_plugin_geoip_ray.stages.ml import logreg_fit, logreg_predict


def _data(n=600, seed=9, margin=2.0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 2))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(np.int64)
    # widen the margin: push points away from the boundary
    x[:, 0] += np.where(y == 1, margin, -margin) * 0.5
    return x, y


def _table(x, y):
    return pa.table({
        "f0": pa.array(x[:, 0]), "f1": pa.array(x[:, 1]),
        "y": pa.array(y),
    })


def test_logreg_matches_numpy_referee():
    """Distributed per-block gradient partials == single-process
    full-batch GD (same lr/iters) to float tolerance, regardless of
    partitioning."""
    x, y = _data()
    ds = rd.from_arrow(_table(x, y)).repartition(5)
    w = logreg_fit(ds, ["f0", "f1"], "y", iters=60, lr=0.5)

    xd = np.column_stack([x, np.ones(len(x))])
    wr = np.zeros(3)
    for _ in range(60):
        p = 1.0 / (1.0 + np.exp(-(xd @ wr)))
        wr = wr - 0.5 * (xd.T @ (p - y)) / len(y)
    assert np.allclose(w, wr, rtol=1e-9, atol=1e-9)


def test_logreg_separates_planted_data():
    x, y = _data(margin=3.0)
    ds = rd.from_arrow(_table(x, y)).repartition(3)
    w = logreg_fit(ds, ["f0", "f1"], "y", iters=200, lr=0.5)
    scored = logreg_predict(ds, w, ["f0", "f1"]).to_pandas()
    acc = (scored["pred"].to_numpy() == y).mean()
    assert acc >= 0.99
    # scores are calibrated directionally: positives higher than negatives
    assert (scored.loc[scored["pred"] == 1, "score"].min()
            >= scored.loc[scored["pred"] == 0, "score"].max() - 1e-9)


# --------------------------------------------------------------------------
# model-inference stage: TextEmbedder actor pool + the embed->ANN chain
# --------------------------------------------------------------------------

def _emb_matrix(t):
    return np.stack([np.asarray(v) for v in
                     t.column("embedding").to_pylist()])


def test_text_embedder_deterministic_and_dup_identical():
    from fluent_plugin_geoip_ray.stages.ml import TextEmbedder

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["hello world", "hello world", "",
                 "a genuinely different document body"],
    })
    e1 = _emb_matrix(TextEmbedder()(t))
    e2 = _emb_matrix(TextEmbedder()(t))           # fresh actor, same weights
    assert np.array_equal(e1, e2)
    # exact-duplicate text embeds BIT-identically (the known-answer anchor)
    assert np.array_equal(e1[0], e1[1])
    # empty text -> zero vector (not NaN)
    assert np.array_equal(e1[2], np.zeros_like(e1[2]))
    # unit norm on non-empty rows, and distinct text is clearly separated
    assert abs(np.linalg.norm(e1[0]) - 1.0) < 1e-6
    assert float(e1[0] @ e1[3]) < 0.95


def test_embed_texts_partition_invariant_actor_pool():
    from fluent_plugin_geoip_ray.stages.ml import TextEmbedder, embed_texts

    texts = [f"document number {i} body words {i % 7} {i % 3}"
             for i in range(40)]
    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(texts)})
    local = _emb_matrix(TextEmbedder()(t))
    out = (embed_texts(rd.from_arrow(t).repartition(5), concurrency=2,
                       batch_size=8)
           .to_pandas().sort_values("doc_id"))
    pooled = np.stack(out["embedding"].to_numpy())
    assert np.array_equal(pooled, local)


def test_embed_ann_chain_known_answer(tmp_path):
    """text -> embed -> IVF-PQ index -> rerank query: an exact-duplicate
    query retrieves docs with IDENTICAL text at ranks 1..3 (which of the
    equal-scored duplicates comes first is NOT pinned -- exact re-rank
    scores of bit-identical vectors differ by 1 ulp across block shapes),
    and the runner-up margin is wide (embedding collisions would break
    the oracle; this pins the measured separation)."""
    from fluent_plugin_geoip_ray.stages.ml import TextEmbedder, embed_texts
    from fluent_plugin_geoip_ray.stages.similarity import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=12).tolist())
             for _ in range(48)]
    texts += [texts[5], texts[5]]                # ids 48, 49 dup id 5
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts)})
    emb = embed_texts(rd.from_arrow(t).repartition(4), concurrency=2)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx, n_clusters=8, m=16, ksub=16,
                      id_col="doc_id")
    # queries: doc 49 (dup of 5 -> expect min id 5) and doc 7 (unique)
    qt = t.filter(pa.array([i in (49, 7) for i in range(50)]))
    q = _emb_matrix(TextEmbedder()(qt))
    hits = query_ivfpq_index(idx, q, k=3, nprobe=4, rerank=True,
                             id_col="doc_id").to_pandas()
    top = hits[hits["rank"] == 1].sort_values("query_id")
    assert top["doc_id"].iloc[0] == 7            # unique text: itself
    assert top["doc_id"].iloc[1] in (5, 48, 49)  # SOME identical-text doc
    # the dup query's ranks 1..3 are exactly the identical-text set
    dup3 = hits[hits["query_id"] == 1].sort_values("rank")["doc_id"]
    assert sorted(dup3.tolist()) == [5, 48, 49]
    # rank-1 exact scores are cosine 1.0; runner-up (rank 2 for the
    # unique query) is measurably below -- collision margin
    r1 = hits[(hits["query_id"] == 0) & (hits["rank"] == 1)]["score"]
    r2 = hits[(hits["query_id"] == 0) & (hits["rank"] == 2)]["score"]
    assert float(r1.iloc[0]) > 0.999999
    assert float(r2.iloc[0]) < 0.98
