"""Parse stage: vectorized regex extraction of lookup columns from ``text``.

The reference assumes the IP is already a record field and projects it with
record accessors (``get_address``, ``lib/fluent/plugin/filter_geoip.rb:159-165``);
our transcript input carries IPs/host tokens inside the ``text`` byte column
(``BASELINE.json:input_hint``), so this stage materializes them as columns --
the grok/regex parse step mandated by ``north_rule``.

Stateless ``map_batches`` function, zero-copy Arrow in/out, RE2 kernels
(``pc.extract_regex`` / ``pc.replace_substring_regex``) -- no Python per-row
work. ``text`` itself is passed through untouched (byte-identity invariant).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ip import HOST_NAMED, IPV4, IPV4_NAMED, IPV6_NAMED

TAG_COL = "tag"


def _extract_first(col: pa.ChunkedArray | pa.Array, named_pattern: str, group: str):
    """First regex match per row (null when absent)."""
    return pc.struct_field(pc.extract_regex(col, named_pattern), group)


def parse_transcripts(batch: pa.Table, tag_prefix: str = "transcripts.",
                      fields: tuple = ("ip", "ip2", "host")) -> pa.Table:
    """Add ``ip`` (first IPv4 in text), ``ip2`` (second), ``host`` (first
    host token) and the initial ``tag`` column (``tag_prefix + role`` --
    Fluentd events enter tagged by their source, README.md:248-266).

    ``fields`` prunes the extraction to the columns the enrich spec's lookup
    keys actually need -- each field is one RE2 pass over ``text`` (ip2 is
    two), so don't pay for unused ones in the hot path."""
    text = batch.column("text")
    cols = []
    if "ip" in fields:
        cols.append(("ip", _extract_first(text, IPV4_NAMED, "ip")))
    if "ip2" in fields:
        # second IP: drop the first occurrence, extract again
        rest = pc.replace_substring_regex(text, IPV4, "", max_replacements=1)
        cols.append(("ip2", _extract_first(rest, IPV4_NAMED, "ip")))
    if "host" in fields:
        cols.append(("host", _extract_first(text, HOST_NAMED, "host")))
    if "ip6" in fields:
        cols.append(("ip6", _extract_first(text, IPV6_NAMED, "ip6")))
    tag = pc.binary_join_element_wise(
        pa.scalar(tag_prefix, type=pa.string()),
        batch.column("role") if "role" in batch.column_names else pa.scalar(""),
        "",
    )
    cols.append((TAG_COL, tag))
    out = batch
    for name, arr in cols:
        if name in out.column_names:
            out = out.set_column(out.column_names.index(name), name, arr)
        else:
            out = out.append_column(name, arr)
    return out


def inject_columns(batch: pa.Table, tag: bool = False, time_key: str | None = None,
                   hostname: str | None = None, worker_id: int | None = None) -> pa.Table:
    """Fluentd ``inject`` helper analog (``filter_geoip.rb:34,47,111``):
    optionally copy the tag/event-time into named record fields and stamp a
    hostname / worker id -- constant or derived columns, vectorized."""
    out = batch
    n = batch.num_rows
    if time_key and "ts" in batch.column_names:
        out = out.append_column(time_key, batch.column("ts"))
    if hostname is not None:
        out = out.append_column(
            "hostname", pa.array([hostname] * n, type=pa.string())
        )
    if worker_id is not None:
        out = out.append_column(
            "worker_id", pa.array([worker_id] * n, type=pa.int32())
        )
    return out


def parse_dataset(ds, batch_size: int | None = None,
                  fields: tuple = ("ip", "ip2", "host")):
    # batch_size=None processes whole blocks zero-copy (no rebatch buffering);
    # block size is governed by the input file layout / target_max_block_size
    import functools

    return ds.map_batches(
        functools.partial(parse_transcripts, fields=fields),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def explode_column(ds, col: str, value_col: str | None = None,
                   pos_col: str = "pos"):
    """UNNEST a list column: one output row per element, parent columns
    repeated, plus the element's 0-based ``pos_col`` -- all ListArray
    offset arithmetic (repeat + take), no per-row Python.  Empty lists
    and null lists contribute no rows (SQL ``unnest`` semantics)."""
    import numpy as np

    value_col = value_col or col

    def fn(t: pa.Table) -> pa.Table:
        arr = t.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # null list slots have garbage offsets in some layouts: normalize
        # by filling nulls with empty lists via a mask on lengths
        lens = pc.list_value_length(arr)
        lens = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        starts = np.zeros(t.num_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        pos = np.arange(int(lens.sum()), dtype=np.int64) - starts[parent]
        values = arr.flatten()  # skips nulls/empties, aligns with lens
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        out = {}
        idx = pa.array(parent)
        for name in t.column_names:
            if name == col:
                continue
            c = t.column(name)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            out[name] = c.take(idx)
        out[pos_col] = pa.array(pos)
        out[value_col] = values
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ip_subnet_column(ds, ip_col: str = "ip", bits: int = 16,
                     out: str = "subnet"):
    """Append the dotted CIDR prefix of an IPv4 column -- the standard
    traffic-rollup key ("which /16 is hammering us?") the reference's
    enriched records feed downstream (filter_geoip.rb stops at the
    lookup; aggregation by network is the next stage of every log
    pipeline).

    ``bits`` must be octet-aligned (8/16/24): the label is the first
    ``bits/8`` octets joined with dots plus ``.0``-padding and the mask
    suffix (``"10.1.0.0/16"``), built from Arrow ``split_pattern`` +
    ``binary_join_element_wise`` only -- no per-row Python, and the same
    string algebra ``split_part`` reproduces in SQL.  NULL ips stay NULL.
    """
    import pyarrow.compute as pc

    if bits not in (8, 16, 24):
        raise ValueError(f"bits must be 8, 16 or 24, got {bits}")
    k = bits // 8
    suffix = "".join(".0" for _ in range(4 - k)) + f"/{bits}"

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(ip_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(col, ".")
        pieces = [pc.list_element(parts, i) for i in range(k)]
        label = pieces[0] if k == 1 else \
            pc.binary_join_element_wise(*pieces, ".")
        label = pc.binary_join_element_wise(label, suffix, "")
        return t.append_column(out, label)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
