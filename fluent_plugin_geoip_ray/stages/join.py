"""Join stages.

The only join in the reference is the geo lookup itself -- a broadcast
prefix/range join against the mmdb trie (SURVEY §2.3).  For relational
pipelines the same broadcast principle generalizes: ship the SMALL side once
(``ray.put``), hash-join per batch with pandas' C merge -- zero shuffle.
Large-large joins take the explicit bucketed path (hash-partition both sides
by ``hash(key) % B`` with a groupby, join matching buckets in ``map_groups``);
``bucketed_join_hint`` documents the partitioning assumption.
"""

from __future__ import annotations

import pyarrow as pa


class BroadcastJoin:
    """``map_batches`` callable: left batch JOIN broadcast right side.

    ``how`` in {inner, left}; right side is a pandas DataFrame shipped via
    ``ray.put`` (hydrated once per actor -- pass this class with
    ``concurrency=`` so ``__init__`` runs per actor, not per batch).
    """

    def __init__(self, right_ref, on, how: str = "inner",
                 right_prefix: str = ""):
        import ray

        right = ray.get(right_ref)
        if right_prefix:
            right = right.rename(
                columns={c: right_prefix + c for c in right.columns
                         if c not in (on if isinstance(on, list) else [on])}
            )
        self.right = right
        self.on, self.how = on, how

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = batch.to_pandas()
        out = left.merge(self.right, on=self.on, how=self.how, sort=False)
        return pa.Table.from_pandas(out, preserve_index=False)


def broadcast_join(ds, right_df, on, how: str = "inner",
                   right_prefix: str = "", batch_size: int = 65536,
                   concurrency=(1, 8)):
    """Broadcast hash join: small ``right_df`` (pandas) against every batch."""
    import ray

    right_ref = ray.put(right_df)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs=dict(
            right_ref=right_ref, on=on, how=how, right_prefix=right_prefix
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def semi_join_filter(ds, key_col: str, keys, anti: bool = False,
                     batch_size: int = 65536):
    """Semi/anti join: broadcast the key set, vectorized ``is_in`` filter."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    keys_ref = ray.put(pa.array(sorted(keys)))

    def fn(batch: pa.Table) -> pa.Table:
        vs = ray.get(keys_ref)
        mask = pc.is_in(batch.column(key_col), value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(pc.fill_null(mask, anti))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)
