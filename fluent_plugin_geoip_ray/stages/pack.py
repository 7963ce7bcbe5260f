"""Token-budget sequence packing (training-data extension).

Training pipelines pack documents into fixed token-budget bins before
batching.  Exact sequential greedy packing is inherently serial; the
deterministic, parallel formulation used here is PREFIX-SUM BINNING: order
documents globally by key, and assign ``pack_id = exclusive_prefix_tokens
// budget`` -- a document whose tokens span a boundary belongs to the bin
where it starts.  This is a pure function of (order, token counts):
independent of cluster size and restartable, and exactly expressible as a
SQL window sum (the driver oracle).

Distributed scan shape: sort by key -> pass 1 collects one (min_key,
token_sum) row per block (tiny driver merge -> per-block exclusive
offsets) -> pass 2 re-walks the SAME materialized blocks adding local
exclusive cumsum to the block offset.  Only O(blocks) scalars ever reach
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_bins(ds, key_col: str, tokens_col: str, budget: int):
    """Append ``pack_id`` (int64) = token-prefix bin in global key order.

    The input is sorted by ``key_col`` and materialized; both passes walk
    the same physical blocks (``batch_size=None`` = one batch per block),
    which is what makes offset lookup by block min-key exact.  Requires
    UNIQUE keys (document ids) -- duplicate keys split across a block
    boundary would alias two blocks in the offset map.
    """
    import ray

    sorted_ds = ds.sort(key_col).materialize()

    def block_summary(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        toks = batch.column(tokens_col)
        import pyarrow.compute as pc

        return pa.table({
            "min_key": pa.array([pc.min(keys).as_py()], pa.int64()),
            "tok_sum": pa.array([pc.sum(toks).as_py() or 0], pa.int64()),
        })

    summaries = pa.concat_tables(
        ray.get(
            sorted_ds.map_batches(
                block_summary, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            ).to_arrow_refs()
        )
    ).to_pandas().sort_values("min_key")
    min_keys = summaries["min_key"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(summaries["tok_sum"].to_numpy())[:-1]])
    state = ray.put((min_keys, offsets))

    def assign(batch: pa.Table) -> pa.Table:
        mk, off = ray.get(state)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        toks = batch.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        block = np.searchsorted(mk, keys[0], side="right") - 1
        local_excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
        pack = (off[block] + local_excl) // budget
        return batch.append_column("pack_id", pa.array(pack.astype(np.int64)))

    return sorted_ds.map_batches(assign, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
