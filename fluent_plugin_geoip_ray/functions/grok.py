"""Mini-grok: ``%{PATTERN:name}`` templates -> RE2 named groups -> columns.

Fluentd/Logstash users express log parsing as grok patterns; the north_rule
names "grok/regex parse" as the parse stage's surface.  This module compiles
a grok expression to a single RE2 pattern with named capture groups and
applies it vectorized (`pc.extract_regex`, one pass per batch) -- the same
execution shape as stages/parse.py.

Only public, self-describing base patterns are bundled; users can register
their own (``register_pattern``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# base pattern library (RE2-safe subset of the common grok core)
PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "HOSTNAME": r"[A-Za-z0-9._-]+",
    "USER": r"[A-Za-z0-9._-]+",
    "PATH": r"(?:/[\w.-]*)+",
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN|WARNING|ERROR|FATAL|TRACE)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "QS": r'"[^"]*"',
}

_GROK_RE = re.compile(r"%\{(?P<pattern>[A-Z0-9_]+)(?::(?P<name>[A-Za-z_][A-Za-z0-9_]*))?\}")

# int64-castable / float-castable base patterns get typed columns
_TYPED = {"INT": pa.int64(), "NUMBER": pa.float64()}


class GrokError(ValueError):
    pass


def register_pattern(name: str, regex: str) -> None:
    PATTERNS[name] = regex


def compile_grok(expression: str) -> tuple[str, list[tuple[str, pa.DataType]]]:
    """grok expression -> (RE2 pattern, [(group_name, arrow_type), ...])."""
    fields: list[tuple[str, pa.DataType]] = []

    def sub(m: re.Match) -> str:
        pname, gname = m.group("pattern"), m.group("name")
        if pname not in PATTERNS:
            raise GrokError(f"unknown grok pattern %{{{pname}}}")
        body = PATTERNS[pname]
        if gname is None:
            return f"(?:{body})"
        fields.append((gname, _TYPED.get(pname, pa.string())))
        return f"(?P<{gname}>{body})"

    parts: list[str] = []
    pos = 0
    for m in _GROK_RE.finditer(expression):
        parts.append(re.escape(expression[pos:m.start()]))
        parts.append(sub(m))
        pos = m.end()
    parts.append(re.escape(expression[pos:]))
    pattern = "".join(parts)
    seen = [f for f, _ in fields]
    if len(seen) != len(set(seen)):
        raise GrokError(f"duplicate field names in grok expression: {seen}")
    return pattern, fields


class GrokParse:
    """``map_batches`` callable: apply a compiled grok to a text column,
    appending one (typed) column per named field.  Pattern compiled once per
    actor/worker; one RE2 pass per batch."""

    def __init__(self, expression: str, text_col: str = "text"):
        self.pattern, self.fields = compile_grok(expression)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        matches = pc.extract_regex(batch.column(self.text_col), self.pattern)
        out = batch
        for name, dtype in self.fields:
            col = pc.struct_field(matches, name)
            if dtype != pa.string():
                col = col.cast(dtype)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, col)
            else:
                out = out.append_column(name, col)
        return out


def grok_dataset(ds, expression: str, text_col: str = "text",
                 batch_size: int | None = None):
    return ds.map_batches(
        GrokParse(expression, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
