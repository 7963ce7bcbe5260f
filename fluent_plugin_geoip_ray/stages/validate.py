"""Data-quality gate with dead-letter routing -- the log-pipeline
validate/quarantine stage (fluentd pipelines park unparseable events in a
dead-letter queue; training-data pipelines reject rows violating schema
contracts before they poison downstream stages).

Declarative per-column rules compile to vectorized Arrow kernels; each
row gets the FIRST failing rule's name in ``reject_reason`` (NULL =
valid -- the SQL ``CASE WHEN (pred) IS NOT TRUE THEN 'name' ...`` shape,
so the whole gate is oracle-replicable), and :func:`split_quarantine`
routes the two classes to separate streams/sinks.  A rule passes only
when its predicate is TRUE: a NULL predicate (SQL three-valued logic)
REJECTS, so ``in_range`` on a null value fails that rule rather than
slipping through.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def not_null(col: str):
    return (f"{col}_not_null", lambda t: pc.is_valid(t.column(col)))


def in_range(col: str, lo, hi):
    def fn(t: pa.Table):
        c = t.column(col)
        return pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi))

    return (f"{col}_in_range", fn)


def in_set(col: str, values):
    vals = pa.array(sorted(values))
    return (f"{col}_in_set",
            lambda t: pc.is_in(t.column(col), value_set=vals))


def matches(col: str, pattern: str):
    return (f"{col}_matches",
            lambda t: pc.match_substring_regex(t.column(col), pattern))


def not_equal(col: str, value):
    return (f"{col}_not_equal",
            lambda t: pc.not_equal(t.column(col), value))


def validate(ds, rules, reason_col: str = "reject_reason"):
    """Append ``reason_col``: the FIRST failing rule's name, NULL when
    every rule passes.  ``rules`` is an ordered list of ``(name,
    table -> BooleanArray)`` pairs (TRUE = valid); use the constructors
    above for SQL-replicable rules or pass any vectorized callable.
    One streaming ``map_batches`` pass, no shuffle."""
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    def fn(t: pa.Table) -> pa.Table:
        reason = pa.nulls(t.num_rows, pa.string())
        # apply reversed so the FIRST rule in order wins ties
        for name, rule in reversed(rules):
            mask = pc.fill_null(rule(t), False)
            reason = pc.if_else(mask, reason, pa.scalar(name, pa.string()))
        return t.append_column(reason_col, reason)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_quarantine(ds, reason_col: str = "reject_reason"):
    """(valid_rows_without_reason_col, rejected_rows_with_reason) -- two
    lazy views of a VALIDATED dataset.  Materialize the input first if
    both sides will be consumed (a lazy Dataset re-executes per
    consumer)."""

    def good(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(reason_col))) \
            .drop_columns([reason_col])

    def bad(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(reason_col)))

    return (ds.map_batches(good, batch_format="pyarrow",
                           zero_copy_batch=True),
            ds.map_batches(bad, batch_format="pyarrow",
                           zero_copy_batch=True))
