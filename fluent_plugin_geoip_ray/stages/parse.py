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

from ..functions.ip import HOST_NAMED, IPV4, IPV4_NAMED

TAG_COL = "tag"


def _extract_first(col: pa.ChunkedArray | pa.Array, named_pattern: str, group: str):
    """First regex match per row (null when absent)."""
    return pc.struct_field(pc.extract_regex(col, named_pattern), group)


def parse_transcripts(batch: pa.Table, tag_prefix: str = "transcripts.") -> pa.Table:
    """Add ``ip`` (first IPv4 in text), ``ip2`` (second), ``host`` (first
    host token) and the initial ``tag`` column (``tag_prefix + role`` --
    Fluentd events enter tagged by their source, README.md:248-266)."""
    text = batch.column("text")
    ip1 = _extract_first(text, IPV4_NAMED, "ip")
    # second IP: drop the first occurrence, extract again (still one RE2 pass)
    rest = pc.replace_substring_regex(text, IPV4, "", max_replacements=1)
    ip2 = _extract_first(rest, IPV4_NAMED, "ip")
    host = _extract_first(text, HOST_NAMED, "host")
    tag = pc.binary_join_element_wise(
        pa.scalar(tag_prefix, type=pa.string()),
        batch.column("role") if "role" in batch.column_names else pa.scalar(""),
        "",
    )
    out = batch
    for name, arr in (("ip", ip1), ("ip2", ip2), ("host", host), (TAG_COL, tag)):
        if name in out.column_names:
            out = out.set_column(out.column_names.index(name), name, arr)
        else:
            out = out.append_column(name, arr)
    return out


def parse_dataset(ds, batch_size: int | None = None):
    # batch_size=None processes whole blocks zero-copy (no rebatch buffering);
    # block size is governed by the input file layout / target_max_block_size
    return ds.map_batches(
        parse_transcripts,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
