"""Additional log sources: JSON-lines and CSV transcripts.

The reference ingests Fluentd event streams, typically JSON records from
``in_tail``/``in_forward`` (README.md:248-266).  A user switching to this
engine can point the same pipeline at JSON-lines or CSV files: these readers
normalize to the canonical transcript schema (conv_id, turn_idx, role, text,
tool, ts) so every downstream stage is format-agnostic.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

CANON_FIELDS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _normalize(batch: pa.Table) -> pa.Table:
    """Coerce a loosely-typed batch to the canonical transcript schema:
    missing columns become nulls, ints narrow to int32 for turn_idx, ts
    strings parse as ISO-8601 timestamps."""
    n = batch.num_rows
    cols = {}
    for name in CANON_FIELDS:
        if name not in batch.column_names:
            t = pa.int32() if name == "turn_idx" else (
                pa.timestamp("us") if name == "ts" else pa.string()
            )
            cols[name] = pa.nulls(n, type=t)
            continue
        col = batch.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if name == "turn_idx" and not pa.types.is_int32(col.type):
            col = col.cast(pa.int32())
        elif name == "ts" and not pa.types.is_timestamp(col.type):
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.strptime(col, format="%Y-%m-%dT%H:%M:%S", unit="us")
            else:
                col = col.cast(pa.timestamp("us"))
        elif name in ("conv_id", "role", "text", "tool") and not pa.types.is_string(col.type):
            col = col.cast(pa.string())
        cols[name] = col
    return pa.table(cols)


def read_jsonl_transcripts(paths, **read_kwargs):
    """JSON-lines -> canonical transcript Dataset."""
    import ray.data as rd

    ds = rd.read_json(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format="pyarrow")


def read_csv_transcripts(paths, **read_kwargs):
    """CSV -> canonical transcript Dataset."""
    import ray.data as rd

    ds = rd.read_csv(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format="pyarrow")
