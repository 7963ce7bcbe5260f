"""Config-time compiler: record-template DSL -> vectorized column plans.

This is the Ray-Data-native equivalent of the reference's ``configure``
(``lib/fluent/plugin/filter_geoip.rb:46-104``): all template parsing,
classification and validation happens ONCE at pipeline-build time (pure
Python, no Ray), producing a :class:`CompiledRecordSpec` whose field plans are
evaluated vectorized per Arrow batch by the enrich stage.

The template grammar is the reference's public API: the two regexes below are
ports of ``REGEXP_PLACEHOLDER_SINGLE`` / ``REGEXP_PLACEHOLDER_SCAN``
(``filter_geoip.rb:21-29``) and the allowed-key lists mirror
``GEOIP_KEYS`` / ``GEOIP2_COMPAT_KEYS`` (``filter_geoip.rb:31-32``).

Field classification (``add_geoip_field``, ``filter_geoip.rb:121-143``):

* exact single placeholder  -> typed passthrough (``:125-126``)
* ``[...]`` / ``{...}``     -> JSON template: each placeholder is substituted
  JSON-encoded then the whole string parsed (``:127-132,141-143``)
* anything else             -> string template: ``gsub`` interpolation with
  missing/nil placeholders -> ``""`` (``:133-134``)

Surrounding same-type quotes on a record value are stripped before
classification (``quoted_value?``, ``filter_geoip.rb:70,145-148``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

__all__ = [
    "ConfigError",
    "RecordSpec",
    "CompiledRecordSpec",
    "Placeholder",
    "compile_record_spec",
    "PLACEHOLDER_SINGLE_RE",
    "PLACEHOLDER_SCAN_RE",
    "GEOIP_KEYS",
    "GEOIP2_COMPAT_KEYS",
]


class ConfigError(ValueError):
    """Invalid pipeline config (analog of Fluent::ConfigError)."""


# Port of REGEXP_PLACEHOLDER_SINGLE (filter_geoip.rb:21-28): ${geo.path['key']}
# with either quote style; the conditional group keeps the reference's exact
# accept/reject behavior (e.g. `${city.names.en["host]}` is invalid,
# test_filter_geoip.rb:118-129).
PLACEHOLDER_SINGLE_RE = re.compile(
    r"""^\$\{
          (?P<geoip_key>-?[^\[\]]+)
            \[
              (?:(?P<dq>")|(?P<sq>'))
                (?P<record_key>-?(?(dq)[^"{}]+|[^'{}]+))
              (?(dq)"|')
            \]
        \}$""",
    re.X,
)

# Port of REGEXP_PLACEHOLDER_SCAN (filter_geoip.rb:29): an optionally-quoted
# ${...} occurrence. group(0) includes the quotes, group(1) is the bare key.
PLACEHOLDER_SCAN_RE = re.compile(r"""['"]?(\$\{[^\}]+?\})['"]?""")

GEOIP_KEYS = [
    "city", "latitude", "longitude", "country_code3", "country_code",
    "country_name", "dma_code", "area_code", "region",
]
GEOIP2_COMPAT_KEYS = [
    "city", "country_code", "country_name", "latitude", "longitude",
    "postal_code", "region", "region_name",
]

BACKEND_LIBRARIES = ("geoip", "geoip2_compat", "geoip2_c")


def _is_quoted(text: str) -> bool:
    """quoted_value? (filter_geoip.rb:145-148): same-type quotes both ends."""
    return bool(re.match(r"(^'.+'$|^\".+\"$)", text, re.S))


def _looks_like_json(text: str) -> bool:
    """json? (filter_geoip.rb:141-143): [..] or {..} with non-empty body."""
    return bool(re.search(r"^\[.+\]$", text, re.S) or re.search(r"^\{.+\}$", text, re.S))


@dataclass(frozen=True)
class Placeholder:
    key: str                 # the literal "${geo.path['record_key']}" string
    geoip_path: tuple        # ("city", "names", "en") / ("subdivisions", 0, "iso_code")
    record_key: str          # which lookup field this placeholder binds to
    dtype: str               # "float64" | "string" | explicit override

    @property
    def is_latlon(self) -> bool:
        # keys.last in [:latitude, :longitude] -> nil coalesces to 0.0 when
        # the lookup itself succeeded (filter_geoip.rb:194-198)
        return self.geoip_path[-1] in ("latitude", "longitude")


# ---- field plans (classification result; evaluation in templates.py) -------

@dataclass(frozen=True)
class PassthroughPlan:
    placeholder: str


@dataclass(frozen=True)
class StringTemplatePlan:
    # parts: ("lit", text) | ("ph", placeholder_key) | ("dropped", matched_text)
    # "dropped" = a quoted placeholder occurrence inside a string template: the
    # reference's gsub hash lookup uses the full quoted match, which is never a
    # placeholder key, so it interpolates "" (filter_geoip.rb:133-134).
    parts: tuple


@dataclass(frozen=True)
class JsonTemplatePlan:
    # skeleton: ("ref", ph_key) | ("const", json_value)
    #         | ("obj", ((name, node), ...)) | ("arr", (node, ...))
    skeleton: tuple


@dataclass
class RecordSpec:
    """User-facing enrich spec: the ``<record>`` directive as a dict.

    ``record`` is ordered -- field order is semantic for the
    ``skip_adding_null_record`` gate (first placeholder, filter_geoip.rb:123;
    README.md:114-192).
    """

    lookup_keys: list[str] = field(default_factory=lambda: ["host"])
    record: dict[str, str] = field(default_factory=dict)
    skip_adding_null_record: bool = False
    backend_library: str = "geoip2_c"
    # optional per-placeholder Arrow-type overrides: {"${...}": "int64"}
    placeholder_types: dict[str, str] = field(default_factory=dict)


@dataclass
class CompiledRecordSpec:
    lookup_keys: list[str]
    placeholders: list[Placeholder]          # uniq, template order (filter_geoip.rb:86)
    plans: dict[str, object]                 # out_field -> plan, record order
    skip_adding_null_record: bool
    backend_library: str

    @property
    def placeholder_by_key(self) -> dict[str, Placeholder]:
        return {p.key: p for p in self.placeholders}


def _parse_geoip_path(geoip_key: str) -> tuple:
    parts: list = []
    for seg in geoip_key.split("."):
        parts.append(int(seg) if seg.isdigit() else seg)
    return tuple(parts)


def _placeholder_dtype(path: tuple, overrides: dict[str, str], key: str) -> str:
    if key in overrides:
        return overrides[key]
    if path[-1] in ("latitude", "longitude"):
        return "float64"
    return "string"


def _compile_json_skeleton(template: str, occurrences: list) -> tuple:
    """Parse a JSON template into a skeleton with placeholder refs.

    Mirrors the runtime substitution (filter_geoip.rb:127-132): each scanned
    occurrence -- quotes stripped when symmetrically quoted -- is replaced by a
    JSON-encoded value. We substitute unique sentinel strings and parse; any
    template that survives the reference's config-time validation has every
    placeholder as a standalone JSON string token, so sentinels parse cleanly.
    """
    sentinels = {}

    def _sub(m: re.Match) -> str:
        token = f"@@PH{len(sentinels)}@@"
        matched = m.group(0)
        bare = matched[1:-1] if _is_quoted(matched) else m.group(1)
        sentinels[token] = bare
        return json.dumps(token)

    try:
        tree = json.loads(PLACEHOLDER_SCAN_RE.sub(_sub, template))
    except json.JSONDecodeError as e:  # validated earlier; defensive
        raise ConfigError(f"geoip: failed to parse '{template}' as json.") from e

    def _walk(node) -> tuple:
        if isinstance(node, str) and node in sentinels:
            return ("ref", sentinels[node])
        if isinstance(node, dict):
            return ("obj", tuple((k, _walk(v)) for k, v in node.items()))
        if isinstance(node, list):
            return ("arr", tuple(_walk(v) for v in node))
        return ("const", node)

    return _walk(tree)


def compile_record_spec(spec: RecordSpec) -> CompiledRecordSpec:
    """Full ``configure`` equivalent: validate + classify + compile.

    Raises :class:`ConfigError` on every case the reference rejects
    (``test_filter_geoip.rb:42-166``): invalid JSON template, malformed
    placeholder, unsupported key for restricted backends, unknown backend.
    """
    if spec.backend_library not in BACKEND_LIBRARIES:
        raise ConfigError(f"unsupported backend_library: {spec.backend_library!r}")

    # lookup-key normalization warnings (filter_geoip.rb:55-59): plain dotted
    # keys are treated literally; here lookup keys are column names so dots are
    # simply part of the name -- nothing to warn about, noted for parity.

    record: dict[str, str] = {}
    for out_field, template in spec.record.items():
        if _is_quoted(template):
            template = template[1:-1]  # filter_geoip.rb:70
        record[out_field] = template
        # config-time JSON validation (filter_geoip.rb:72-83): dummy-substitute
        # then parse; detector runs on the quote/backslash-stripped text.
        if _looks_like_json(template.replace("'", "").replace('"', "").replace("\\", "")):
            dummied = PLACEHOLDER_SCAN_RE.sub(json.dumps("dummy_text"), template)
            try:
                json.loads(dummied)
            except json.JSONDecodeError as e:
                raise ConfigError(
                    f"geoip: failed to parse '{template}' as json."
                ) from e

    # placeholder extraction + validation (filter_geoip.rb:86-101)
    seen: dict[str, None] = {}
    for m in PLACEHOLDER_SCAN_RE.finditer("".join(record.values())):
        seen.setdefault(m.group(1))
    placeholders: list[Placeholder] = []
    for key in seen:
        m = PLACEHOLDER_SINGLE_RE.match(key)
        if not m:
            raise ConfigError(f"Invalid placeholder attributes: {key}")
        geoip_key = m.group("geoip_key")
        if spec.backend_library == "geoip" and geoip_key not in GEOIP_KEYS:
            raise ConfigError(f"geoip: unsupported key {geoip_key}")
        if spec.backend_library == "geoip2_compat" and geoip_key not in GEOIP2_COMPAT_KEYS:
            raise ConfigError(f"geoip2_compat: unsupported key {geoip_key}")
        path = _parse_geoip_path(geoip_key)
        placeholders.append(
            Placeholder(
                key=key,
                geoip_path=path,
                record_key=m.group("record_key"),
                dtype=_placeholder_dtype(path, spec.placeholder_types, key),
            )
        )

    # classification (filter_geoip.rb:125-134)
    plans: dict[str, object] = {}
    for out_field, template in record.items():
        if PLACEHOLDER_SINGLE_RE.match(template):
            plans[out_field] = PassthroughPlan(template)
        elif _looks_like_json(template):
            occ = list(PLACEHOLDER_SCAN_RE.finditer(template))
            plans[out_field] = JsonTemplatePlan(_compile_json_skeleton(template, occ))
        else:
            parts: list = []
            pos = 0
            for m in PLACEHOLDER_SCAN_RE.finditer(template):
                if m.start() > pos:
                    parts.append(("lit", template[pos:m.start()]))
                matched = m.group(0)
                if matched == m.group(1):
                    parts.append(("ph", m.group(1)))
                else:
                    # quoted occurrence: hash lookup on the quoted text misses
                    parts.append(("dropped", matched))
                pos = m.end()
            if pos < len(template):
                parts.append(("lit", template[pos:]))
            plans[out_field] = StringTemplatePlan(tuple(parts))

    return CompiledRecordSpec(
        lookup_keys=list(spec.lookup_keys),
        placeholders=placeholders,
        plans=plans,
        skip_adding_null_record=spec.skip_adding_null_record,
        backend_library=spec.backend_library,
    )
