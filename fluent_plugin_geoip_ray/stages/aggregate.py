"""Aggregation helpers: partial-then-final counts (shuffle-light).

The reference has no aggregations (SURVEY §2.3); ``north_star`` mandates
per-sink groupby counts by ``country_code`` and ``conv_id``.  A bare
``ds.groupby(key).count()`` shuffles every row; at 100 TB that is the
bottleneck.  These helpers pre-aggregate inside ``map_batches`` (one row per
key per batch -- the combiner) and run the all-to-all only over the tiny
partials, so shuffle volume is O(distinct keys x blocks), not O(rows).
Hot-key skew (the conv_id hotspot) is irrelevant after partials: every block
contributes at most one row per key.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Sum


def _partial_count(key: str):
    def partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(key).aggregate([([], "count_all")])
        return out.rename_columns([key, "n"])

    return partial


def count_by(ds, key: str, batch_size: int = 65536):
    """``SELECT key, count(*) AS n GROUP BY key`` -- partial + final."""
    partials = ds.map_batches(
        _partial_count(key),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    agg = partials.groupby(key).aggregate(Sum("n", alias_name="n"))
    return agg


def _partial_sum_count(key: str, value: str):
    def partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(key).aggregate([(value, "sum"), ([], "count_all")])
        return out.rename_columns([key, "s", "n"])

    return partial


def sum_count_by(ds, key: str, value: str, batch_size: int = 65536):
    """Grouped sum+count with the same partial/final split."""
    partials = ds.map_batches(
        _partial_sum_count(key, value),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    return partials.groupby(key).aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
