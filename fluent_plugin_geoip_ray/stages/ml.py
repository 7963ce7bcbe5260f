"""Distributed model training over Dataset columns (engine extension).

The quality-classifier shape of a curation pipeline (fastText-style
filters): train a small linear model where ROWS NEVER MOVE -- every
iteration is one streaming ``map_batches`` pass emitting per-block
gradient partials (a (d+1)-vector per BLOCK), combined on the driver in
deterministic block order.  The same partial-reduction skeleton as
:func:`similarity.kmeans_fit` and :func:`similarity.fit_pca`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _design_matrix(t: pa.Table, feature_cols: list[str]) -> np.ndarray:
    cols = [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols]
    x = np.column_stack(cols + [np.ones(t.num_rows)])  # bias term last
    return x


def logreg_fit(ds, feature_cols: list[str], label_col: str,
               iters: int = 200, lr: float = 0.5, l2: float = 0.0,
               batch_size: int = 65536) -> np.ndarray:
    """Full-batch gradient-descent logistic regression (labels 0/1).

    Per iteration ONE streaming pass: each block contributes
    ``X_b.T @ (sigmoid(X_b w) - y_b)`` plus its row count -- a
    (d+2)-float partial per block; the driver sums partials in block
    order (deterministic) and steps ``w -= lr * (g/n + l2*w)``.
    Identical arithmetic to single-process full-batch GD up to block
    summation order (pinned against a numpy referee in tests).

    Returns the weight vector (features..., bias) as float64.
    """
    import ray

    slim = ds.select_columns(feature_cols + [label_col]).materialize()
    d = len(feature_cols) + 1
    w = np.zeros(d)
    for _ in range(iters):
        w_ref = ray.put(w)

        def partial(t: pa.Table) -> pa.Table:
            ww = ray.get(w_ref)
            x = _design_matrix(t, feature_cols)
            y = t.column(label_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
            z = x @ ww
            p = 1.0 / (1.0 + np.exp(-z))
            g = x.T @ (p - y)
            return pa.table({
                "g": pa.array([g.tolist()]),
                "n": pa.array([t.num_rows], pa.int64()),
            })

        parts = slim.map_batches(partial, batch_format="pyarrow",
                                 batch_size=batch_size).to_pandas()
        g = np.sum(np.stack(parts["g"].to_numpy()), axis=0)
        n = int(parts["n"].sum())
        if n == 0:
            break
        w = w - lr * (g / n + l2 * w)
    return w


def logreg_predict(ds, weights: np.ndarray, feature_cols: list[str],
                   out_col: str = "score", label_out: str | None = "pred",
                   threshold: float = 0.5):
    """Broadcast-scoring pass: append the sigmoid score (and optionally a
    thresholded 0/1 prediction) to every row."""
    import ray

    w_ref = ray.put(np.asarray(weights, np.float64))

    def fn(t: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        x = _design_matrix(t, feature_cols)
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        out = t.append_column(out_col, pa.array(p))
        if label_out:
            out = out.append_column(
                label_out, pa.array((p >= threshold).astype(np.int64)))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
