"""Fluentd record-accessor paths over Arrow struct/list columns.

The reference resolves every lookup key through a fluentd record accessor
(``filter_geoip.rb:60`` ``record_accessor_create(key)``; exercised by
``test_filter_geoip.rb:88-117,482-520``): ``$.from.ip`` / ``$["host"]["ip"]``
/ ``$['host']['ip']`` address nested record fields, while a plain key -- even
a dotted one, after a warning -- is a literal top-level field name.

Here records are Arrow rows, so nested access is a zero-copy
``pyarrow.compute.struct_field`` chain (integer segments index list columns
via ``pc.list_element``).  A path whose root column or any struct field is
absent resolves to all-null, matching the accessor returning nil on missing
fields (``test_filter_geoip.rb:489,503`` "missing field" rows).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_accessor", "resolve_accessor", "accessor_root"]

# bracket-style segment: ["name"] | ['name'] | [0]
_BRACKET_SEG_RE = re.compile(r"""\[(?:"([^"]*)"|'([^']*)'|(-?\d+))\]""")


def parse_accessor(key: str) -> tuple | None:
    """Parse a fluentd accessor path into segments, or None for plain keys.

    ``$.a.b`` -> ("a", "b"); ``$["a"][0]['b']`` -> ("a", 0, "b").
    Plain keys (no ``$`` prefix) return None: they are literal column names,
    including dotted ones (``filter_geoip.rb:55-59`` warns and treats them
    literally; the warning lives in ``conf.py``).
    """
    if not key.startswith("$"):
        return None
    body = key[1:]
    if body.startswith("."):
        segs: list = []
        for part in body[1:].split("."):
            # dot style allows trailing [n] indexes: $.a.b[0]
            m = re.match(r"([^\[\]]+)((?:\[-?\d+\])*)$", part)
            if not m:
                return None
            segs.append(m.group(1))
            for im in re.finditer(r"\[(-?\d+)\]", m.group(2)):
                segs.append(int(im.group(1)))
        return tuple(segs) if segs else None
    if body.startswith("["):
        segs = []
        pos = 0
        while pos < len(body):
            m = _BRACKET_SEG_RE.match(body, pos)
            if not m:
                return None
            if m.group(3) is not None:
                segs.append(int(m.group(3)))
            else:
                segs.append(m.group(1) if m.group(1) is not None else m.group(2))
            pos = m.end()
        return tuple(segs) if segs else None
    return None


def accessor_root(key: str) -> str:
    """The top-level column an accessor path (or plain key) reads."""
    path = parse_accessor(key)
    return str(path[0]) if path else key


def _list_element_or_null(col: pa.Array, idx: int) -> pa.Array:
    """``list[i]`` with nil (not error) for rows whose list is too short --
    accessor semantics, unlike ``pc.list_element`` which raises."""
    import numpy as np

    if pa.types.is_fixed_size_list(col.type):
        col = col.cast(pa.list_(col.type.value_type))
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    offsets = np.asarray(col.offsets)[:-1].astype(np.int64)
    if idx >= 0:
        ok = lengths > idx
        take_idx = offsets + idx
    else:
        ok = lengths >= -idx
        take_idx = offsets + lengths + idx
    take = np.where(ok, take_idx, -1)
    take_arr = pa.array(take, type=pa.int64())
    take_arr = pc.if_else(pa.array(ok), take_arr, pa.scalar(None, pa.int64()))
    return col.values.take(take_arr)


def resolve_accessor(batch: pa.Table, key: str):
    """Resolve ``key`` against an Arrow batch -> ChunkedArray/Array or None.

    Plain keys read the column directly; accessor paths walk struct fields
    (``pc.struct_field``) and list indexes (``pc.list_element``).  Returns
    None when the root column is absent; inner missing struct fields yield
    an all-null array (nil semantics of the fluentd accessor).
    """
    path = parse_accessor(key)
    if path is None:
        if key in batch.column_names:
            return batch.column(key)
        return None
    root = str(path[0])
    if root not in batch.column_names:
        return None
    col = batch.column(root)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for seg in path[1:]:
        typ = col.type
        if isinstance(seg, int):
            if pa.types.is_list(typ) or pa.types.is_large_list(typ) or pa.types.is_fixed_size_list(typ):
                col = _list_element_or_null(col, seg)
            elif pa.types.is_struct(typ) and 0 <= seg < typ.num_fields:
                col = pc.struct_field(col, seg)
            else:
                return pa.nulls(batch.num_rows, type=pa.string())
        else:
            if pa.types.is_struct(typ) and typ.get_field_index(seg) != -1:
                col = pc.struct_field(col, seg)
            else:
                return pa.nulls(batch.num_rows, type=pa.string())
    return col
