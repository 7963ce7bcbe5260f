"""Vectorized evaluation of compiled template plans over Arrow batches.

The reference rewrites one record at a time (``add_geoip_field``,
``lib/fluent/plugin/filter_geoip.rb:121-139``); here each plan evaluates to
ONE Arrow array per batch, built from per-placeholder arrays:

* passthrough  -> the placeholder array itself (typed; filter_geoip.rb:125-126)
* string template -> ``binary_join_element_wise`` over literal + stringified
  placeholder pieces, nil -> "" (filter_geoip.rb:133-134)
* JSON template -> nested Struct/List arrays assembled bottom-up from the
  typed placeholder arrays -- equivalent by construction to the reference's
  encode-substitute-reparse (filter_geoip.rb:127-132), golden-tested.

Placeholder arrays are computed at unique-lookup-value level (dictionary
encoding) by the enrich stage, so the Python work per batch is O(unique IPs),
not O(rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import (
    CompiledRecordSpec,
    JsonTemplatePlan,
    PassthroughPlan,
    Placeholder,
    StringTemplatePlan,
)

_ARROW_TYPES = {
    "string": pa.string(),
    "float64": pa.float64(),
    "int64": pa.int64(),
    "bool": pa.bool_(),
}


def arrow_type(dtype: str) -> pa.DataType:
    return _ARROW_TYPES[dtype]


def dig(doc, path: tuple):
    """Ruby ``Hash#dig`` equivalent over nested dict/list docs
    (filter_geoip.rb:193): missing path segment -> None, never an error."""
    cur = doc
    for seg in path:
        if isinstance(cur, dict):
            cur = cur.get(seg)
        elif isinstance(cur, (list, tuple)) and isinstance(seg, int):
            cur = cur[seg] if 0 <= seg < len(cur) else None
        else:
            return None
        if cur is None:
            return None
    return cur


def _to_s(value) -> str:
    """Ruby ``to_s`` for interpolation; pinned to Python ``str`` semantics
    (identical for the str/float/int values GeoIP docs hold)."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        return f"{value:.1f}"  # Ruby 37.0.to_s == "37.0" == Python str(37.0)
    return str(value)


class PlaceholderColumns:
    """Per-batch placeholder arrays, built lazily from unique-level values.

    ``unique_values[key]`` is the list of dug values per unique lookup value
    (already 0.0-coalesced for lat/lon on found docs); ``codes`` maps row ->
    unique index per lookup key.
    """

    def __init__(
        self,
        n_rows: int,
        placeholders: list[Placeholder],
        unique_values: dict[str, list],
        codes: dict[str, np.ndarray],
    ):
        self.n = n_rows
        self._ph = {p.key: p for p in placeholders}
        self._uvals = unique_values
        self._codes = codes
        self._typed: dict[str, pa.Array] = {}
        self._strs: dict[str, pa.Array] = {}

    def _gather(self, key: str, vals: list) -> np.ndarray:
        ph = self._ph[key]
        out = np.asarray(vals + [None], dtype=object)
        return out[self._codes[ph.record_key]]

    def typed_array(self, key: str) -> pa.Array:
        if key not in self._typed:
            ph = self._ph[key]
            rows = self._gather(key, self._uvals[key])
            self._typed[key] = pa.array(rows, type=arrow_type(ph.dtype), from_pandas=True)
        return self._typed[key]

    def string_array(self, key: str) -> pa.Array:
        """Placeholder values stringified at unique level (for interpolation).
        nil -> "" (gsub hash semantics, filter_geoip.rb:133-134)."""
        if key not in self._strs:
            svals = [_to_s(v) for v in self._uvals[key]]
            rows = self._gather(key, svals)
            rows = np.where(rows == None, "", rows)  # noqa: E711
            self._strs[key] = pa.array(rows, type=pa.string())
        return self._strs[key]

    def string_array_nullsafe(self, key: str) -> pa.Array:
        """Like string_array but nil stays null (for the mixed-type JSON
        array schema closure, where JSON null must survive as list null)."""
        svals = [None if v is None else _to_s(v) for v in self._uvals[key]]
        rows = self._gather(key, svals)
        return pa.array(rows, type=pa.string(), from_pandas=True)


def _const_array(value, n: int) -> pa.Array:
    if value is None:
        return pa.nulls(n)
    if isinstance(value, bool):
        t = pa.bool_()
    elif isinstance(value, int):
        t = pa.int64()
    elif isinstance(value, float):
        t = pa.float64()
    else:
        t = pa.string()
    return pa.array(np.repeat(np.asarray([value]), n), type=t)


def _eval_skeleton(node: tuple, cols: PlaceholderColumns) -> pa.Array:
    kind = node[0]
    n = cols.n
    if kind == "ref":
        return cols.typed_array(node[1])
    if kind == "const":
        return _const_array(node[1], n)
    if kind == "obj":
        names = [name for name, _ in node[1]]
        children = [_eval_skeleton(child, cols) for _, child in node[1]]
        return pa.StructArray.from_arrays(children, names)
    if kind == "arr":
        children = [_eval_skeleton(child, cols) for child in node[1]]
        k = len(children)
        if k == 0:
            return pa.ListArray.from_arrays(
                np.zeros(n + 1, dtype=np.int32), pa.array([], type=pa.null())
            )
        types = {c.type for c in children}
        if len(types) > 1:
            # SCHEMA CLOSURE (SURVEY §1.2): the reference can emit
            # heterogeneous JSON arrays (e.g. ["Mountain View", 37.41]);
            # Arrow lists need one element type, so mixed-type array
            # templates close to list<string> with elements stringified by
            # the same _to_s used for string templates (nulls stay null).
            children = [
                cols.string_array_nullsafe(child[1]) if child[0] == "ref"
                else (c if pa.types.is_string(c.type) else c.cast(pa.string()))
                for child, c in zip(node[1], children)
            ]
        # interleave child columns row-wise: concat + strided take
        values = pa.concat_arrays([pa.array(c, from_pandas=True) if not isinstance(c, pa.Array) else c for c in children])
        idx = (np.arange(k, dtype=np.int64)[None, :] * n + np.arange(n, dtype=np.int64)[:, None]).ravel()
        interleaved = values.take(pa.array(idx))
        offsets = np.arange(0, (n + 1) * k, k, dtype=np.int64)
        return pa.LargeListArray.from_arrays(offsets, interleaved).cast(
            pa.list_(interleaved.type)
        )
    raise AssertionError(f"unknown skeleton node {kind}")


def evaluate_plan(plan, cols: PlaceholderColumns) -> pa.Array:
    import pyarrow.compute as pc

    if isinstance(plan, PassthroughPlan):
        return cols.typed_array(plan.placeholder)
    if isinstance(plan, StringTemplatePlan):
        pieces: list = []
        for part in plan.parts:
            if part[0] == "lit":
                pieces.append(pa.array(np.repeat(np.asarray([part[1]]), cols.n), type=pa.string()))
            elif part[0] == "ph":
                pieces.append(cols.string_array(part[1]))
            # "dropped": quoted placeholder -> "" -> contributes nothing
        if not pieces:
            return pa.array(np.repeat(np.asarray([""]), cols.n), type=pa.string())
        if len(pieces) == 1:
            return pieces[0]
        return pc.binary_join_element_wise(*pieces, "")
    if isinstance(plan, JsonTemplatePlan):
        return _eval_skeleton(plan.skeleton, cols)
    raise AssertionError(f"unknown plan {plan!r}")


def output_schema(spec: CompiledRecordSpec) -> list[tuple[str, pa.DataType]]:
    """Declared Arrow types of the enrich columns, computable at config time
    (closing the reference's dynamic-schema degrees of freedom, SURVEY §1.2)."""

    def _node_type(node) -> pa.DataType:
        kind = node[0]
        if kind == "ref":
            return arrow_type(spec.placeholder_by_key[node[1]].dtype)
        if kind == "const":
            v = node[1]
            if v is None:
                return pa.null()
            if isinstance(v, bool):
                return pa.bool_()
            if isinstance(v, int):
                return pa.int64()
            if isinstance(v, float):
                return pa.float64()
            return pa.string()
        if kind == "obj":
            return pa.struct([(nm, _node_type(ch)) for nm, ch in node[1]])
        if kind == "arr":
            child_types = {_node_type(ch) for ch in node[1]}
            t = child_types.pop() if len(child_types) == 1 else pa.string()
            return pa.list_(t)
        raise AssertionError(kind)

    out = []
    for name, plan in spec.plans.items():
        if isinstance(plan, PassthroughPlan):
            out.append((name, arrow_type(spec.placeholder_by_key[plan.placeholder].dtype)))
        elif isinstance(plan, StringTemplatePlan):
            out.append((name, pa.string()))
        else:
            out.append((name, _node_type(plan.skeleton)))
    return out
