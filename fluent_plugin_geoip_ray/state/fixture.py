"""Deterministic synthetic geo fixture.

The reference bundles GeoLite2 database blobs that are stripped from this
snapshot (``/root/reference/.MISSING_LARGE_BLOBS``) and CC-BY-SA licensed, so
geo truth here is a synthetic table whose values are pinned to the reference's
golden test outputs (``test/plugin/test_filter_geoip.rb:178-186,246-256,
280-299,337-349``).  One row per canonical test IP; the nested GeoIP2-style
document (what ``GeoIP2::Database#lookup`` returns,
``lib/fluent/plugin/filter_geoip.rb:204-217``) is derived from the flat row.

The flat form doubles as the DuckDB-oracle side table (written to parquet by
:func:`write_geo_fixture_parquet`).
"""

from __future__ import annotations

import os

# Flat relational rows: (ip, city, country_iso, country_name, lat, lon,
# postal, subdiv0_iso, subdiv0_name).  None means the GeoIP2 document lacks
# the field (NOT that the IP is unknown -- unknown IPs are simply absent).
GEO_FIXTURE_ROWS: list[dict] = [
    {
        "ip": "66.102.3.80",
        "city_names_en": "Mountain View",
        "country_iso_code": "US",
        "country_names_en": "United States",
        "location_latitude": 37.419200000000004,
        "location_longitude": -122.0574,
        "postal_code": "94043",
        "subdiv0_iso_code": "CA",
        "subdiv0_names_en": "California",
    },
    {
        "ip": "66.102.9.80",
        "city_names_en": "Mountain View",
        "country_iso_code": "US",
        "country_names_en": "United States",
        "location_latitude": 37.4192008972168,
        "location_longitude": -122.05740356445312,
        "postal_code": "94043",
        "subdiv0_iso_code": "CA",
        "subdiv0_names_en": "California",
    },
    {
        "ip": "8.8.8.8",
        "city_names_en": None,
        "country_iso_code": "US",
        "country_names_en": "United States",
        "location_latitude": 37.751,
        "location_longitude": -97.822,
        "postal_code": None,
        "subdiv0_iso_code": None,
        "subdiv0_names_en": None,
    },
    {
        "ip": "125.54.15.42",
        "city_names_en": "Tokorozawa",
        "country_iso_code": "JP",
        "country_names_en": "Japan",
        "location_latitude": 35.7996,
        "location_longitude": 139.4686,
        "postal_code": None,
        "subdiv0_iso_code": "11",
        "subdiv0_names_en": "Saitama",
    },
    {
        # "document exists but latitude/longitude are nil" case: exercises the
        # nil->0.0 coalesce (filter_geoip.rb:194-198; mock at
        # test_filter_geoip.rb:33-40).
        "ip": "180.94.85.84",
        "city_names_en": None,
        "country_iso_code": "AF",
        "country_names_en": "Afghanistan",
        "location_latitude": None,
        "location_longitude": None,
        "postal_code": None,
        "subdiv0_iso_code": None,
        "subdiv0_names_en": None,
    },
]

# IPv6 entry (the reference's geoip2 backends accept IPv6 addresses; one
# canonical fixture row keeps the v6 path exercised end-to-end)
GEO_FIXTURE_ROWS.append(
    {
        "ip": "2001:4860:4860::8888",
        "city_names_en": None,
        "country_iso_code": "US",
        "country_names_en": "United States",
        "location_latitude": 37.751,
        "location_longitude": -97.822,
        "postal_code": None,
        "subdiv0_iso_code": None,
        "subdiv0_names_en": None,
    }
)

# Hostname tokens resolvable to fixture IPs (the reference looks up whatever
# string the record field holds -- hostnames resolve inside the C geoip libs).
HOST_TOKENS: dict[str, str] = {
    "host_google": "66.102.3.80",
    "host_tokorozawa": "125.54.15.42",
    # host_unknown deliberately absent -> lookup miss
}


def _nested_doc(row: dict) -> dict:
    """Build the GeoIP2-style nested document from a flat fixture row.

    Mirrors the shape documented in the reference README (README.md:134-173):
    only fields present in the source data appear in the document.
    """
    doc: dict = {}
    if row["city_names_en"] is not None:
        doc["city"] = {"names": {"en": row["city_names_en"]}}
    country = {}
    if row["country_iso_code"] is not None:
        country["iso_code"] = row["country_iso_code"]
    if row["country_names_en"] is not None:
        country["names"] = {"en": row["country_names_en"]}
    if country:
        doc["country"] = country
    location = {}
    if row["location_latitude"] is not None:
        location["latitude"] = row["location_latitude"]
    if row["location_longitude"] is not None:
        location["longitude"] = row["location_longitude"]
    # GeoIP2 city documents always carry a location element (possibly empty in
    # the mock-DB scenarios); keep it present so `location.latitude` digs to
    # nil rather than missing-parent (same observable result either way).
    doc["location"] = location
    if row["postal_code"] is not None:
        doc["postal"] = {"code": row["postal_code"]}
    if row["subdiv0_iso_code"] is not None or row["subdiv0_names_en"] is not None:
        sub: dict = {}
        if row["subdiv0_iso_code"] is not None:
            sub["iso_code"] = row["subdiv0_iso_code"]
        if row["subdiv0_names_en"] is not None:
            sub["names"] = {"en": row["subdiv0_names_en"]}
        doc["subdivisions"] = [sub]
    return doc


def fixture_geo_docs() -> dict[str, dict]:
    """{ip -> nested GeoIP2-style doc} plus host-token aliases."""
    docs = {row["ip"]: _nested_doc(row) for row in GEO_FIXTURE_ROWS}
    for host, ip in HOST_TOKENS.items():
        docs[host] = docs[ip]
    return docs


def fixture_flat_docs(style: str = "geoip2_compat") -> dict[str, dict]:
    """Flat-key docs for the two restricted backends.

    ``geoip2_compat`` exposes 8 flat keys (GEOIP2_COMPAT_KEYS,
    ``filter_geoip.rb:32``) with GeoIP2 values; legacy ``geoip`` exposes 9
    keys (GEOIP_KEYS, ``filter_geoip.rb:31``) -- same fixture values (we pin
    GeoIP2 numeric precision throughout, SURVEY §2.4.5)."""
    docs: dict[str, dict] = {}
    for row in GEO_FIXTURE_ROWS:
        if style == "geoip2_compat":
            doc = {
                "city": row["city_names_en"],
                "country_code": row["country_iso_code"],
                "country_name": row["country_names_en"],
                "latitude": row["location_latitude"],
                "longitude": row["location_longitude"],
                "postal_code": row["postal_code"],
                "region": row["subdiv0_iso_code"],
                "region_name": row["subdiv0_names_en"],
            }
        elif style == "geoip":
            doc = {
                "city": row["city_names_en"],
                "latitude": row["location_latitude"],
                "longitude": row["location_longitude"],
                "country_code3": {"US": "USA", "JP": "JPN", "AF": "AFG"}.get(
                    row["country_iso_code"]
                ),
                "country_code": row["country_iso_code"],
                "country_name": row["country_names_en"],
                "dma_code": 807 if row["ip"].startswith("66.102") else None,
                "area_code": 650 if row["ip"].startswith("66.102") else None,
                "region": row["subdiv0_iso_code"],
            }
        else:
            raise ValueError(f"unknown flat-doc style {style!r}")
        docs[row["ip"]] = doc
    for host, ip in HOST_TOKENS.items():
        docs[host] = docs[ip]
    return docs


def write_geo_fixture_parquet(path: str) -> str:
    """Write the flat fixture (IPs + host aliases) for the DuckDB oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(GEO_FIXTURE_ROWS)
    by_ip = {r["ip"]: r for r in GEO_FIXTURE_ROWS}
    for host, ip in HOST_TOKENS.items():
        rows.append({**by_ip[ip], "ip": host})
    table = pa.Table.from_pylist(rows)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
