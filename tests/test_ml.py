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
