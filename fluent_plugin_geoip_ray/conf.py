"""Fluentd-config-style front end.

The reference is configured by a fluentd ``<filter>`` element with params +
a ``<record>`` directive (``README.md:60-88``); this module accepts the same
surface as a plain dict (or parsed from a minimal fluentd-conf text) and
produces a :class:`RecordSpec`, applying the reference's intake rules:

* ``enable_key_*`` options are obsolete -> ConfigError
  (``filter_geoip.rb:62-64``, tested ``test_filter_geoip.rb:49-53``)
* deprecated ``geoip_lookup_key`` (singular) comma-splits into the key list
  (``filter_geoip.rb:51-53``)
* plain dotted lookup keys warn (treated literally -- here: column names)
  (``filter_geoip.rb:55-59``)
* backend enum validated (``filter_geoip.rb:44``)
"""

from __future__ import annotations

import logging
import re

from .config import ConfigError, RecordSpec

logger = logging.getLogger(__name__)

_KNOWN_PARAMS = {
    "geoip_database",
    "geoip2_database",
    "geoip_lookup_keys",
    "geoip_lookup_key",
    "skip_adding_null_record",
    "backend_library",
}


def record_spec_from_conf(conf: dict) -> RecordSpec:
    """Build a RecordSpec from a fluentd-shaped config dict:
    ``{"geoip_lookup_keys": [...], "record": {...}, ...}``."""
    for key in conf:
        if key.startswith("enable_key_"):
            raise ConfigError(
                "geoip: 'enable_key_*' config format is obsoleted. "
                "use <record></record> directive instead."
            )

    lookup_keys = conf.get("geoip_lookup_keys", ["host"])
    if isinstance(lookup_keys, str):
        lookup_keys = [lookup_keys]
    if conf.get("geoip_lookup_key"):
        logger.warning("geoip_lookup_key is deprecated; use geoip_lookup_keys")
        lookup_keys = re.split(r"\s*,\s*", conf["geoip_lookup_key"])

    for key in lookup_keys:
        if "." in key and not key.startswith("$"):
            logger.warning("%s is not treated as nested attributes", key)

    return RecordSpec(
        lookup_keys=list(lookup_keys),
        record=dict(conf.get("record", {})),
        skip_adding_null_record=bool(conf.get("skip_adding_null_record", False)),
        backend_library=conf.get("backend_library", "geoip2_c"),
    )


def backend_spec_from_conf(conf: dict) -> dict | None:
    """Backend spec from the fluentd params (``load_database`` dispatch,
    ``filter_geoip.rb:204-217``): the reference dispatches on
    ``backend_library``, not on which path param is present --
    ``geoip2_c`` / ``geoip2_compat`` read ``geoip2_database`` (MaxMind
    binary .mmdb); ``geoip`` reads ``geoip_database``, a LEGACY GeoIP City
    .dat consumed via GeoIP::City -- served here by the bundled pure-Python
    reader (``state/dat.py``).  A missing/unreadable .dat raises a clear
    ConfigError at config time instead of a confusing parse error at task
    time (ADVICE r2 convention).  No database path -> None (the enrich
    stage defaults to the dict fixture backend; the duck-typed ``geoip``
    template-key restriction still applies)."""
    lib = conf.get("backend_library", "geoip2_c")
    if lib in ("geoip2_c", "geoip2_compat"):
        path = conf.get("geoip2_database")
        return {"library": "maxmind", "path": path} if path else None
    if lib == "geoip":
        path = conf.get("geoip_database")
        if path:
            try:
                from .state.dat import DatReader

                DatReader(path)
            except (OSError, ValueError) as e:
                raise ConfigError(
                    f"backend_library 'geoip': cannot open legacy GeoIP "
                    f".dat database {path!r}: {e}"
                ) from e
            return {"library": "geoip_dat", "path": path}
        return None
    raise ConfigError(f"unsupported backend_library {lib!r}")


_ELEM_RE = re.compile(r"<record>(.*?)</record>", re.S)


def parse_fluentd_conf(text: str) -> dict:
    """Minimal parser for the reference's README config snippets: top-level
    ``key value`` params + one ``<record>...</record>`` block."""
    conf: dict = {}
    record: dict = {}
    m = _ELEM_RE.search(text)
    body = text
    if m:
        body = text[: m.start()] + text[m.end():]
        for line in m.group(1).splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(None, 1)
            if len(parts) == 2:
                record[parts[0]] = parts[1].strip()
    for line in body.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or line.startswith("<"):
            continue
        parts = line.split(None, 1)
        if len(parts) != 2:
            continue
        k, v = parts[0], parts[1].strip()
        if k in ("geoip_lookup_keys",):
            conf[k] = re.split(r"\s*,\s*", v)
        elif v in ("true", "false"):
            conf[k] = v == "true"
        else:
            conf[k] = v
    if record:
        conf["record"] = record
    return conf
