"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Nothing here calls ``ray.init()`` / ``ray.shutdown()``.

Transcript queries run over the deterministic synthetic transcript table
(FIXTURES.md §1, seed=42) generated idempotently under /tmp/graft_data/ --
the oracle SQL reads the very same parquet file via read_parquet(), so both
engines see identical bytes.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from fluent_plugin_geoip_ray.functions.ip import IPV4
from fluent_plugin_geoip_ray.sources.transcripts import (
    ensure_for_sf_dir,
    geo_fixture_path,
    sf_from_dir,
    transcripts_path,
)

# the driver compares at sf=0.01; oracle SQL is static so paths are pinned
# (transcripts is a directory of part files -> glob for DuckDB)
_SF01 = 0.01
_T_PATH = transcripts_path(_SF01) + "/*.parquet"
_G_PATH = geo_fixture_path()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: parse -> enrich -> route
    fan-out to parquet sinks -> per-sink aggregates; returns the merged
    (route, kind, key, n) stats table."""
    import tempfile

    from fluent_plugin_geoip_ray.pipelines.flagship import run_flagship

    path = ensure_for_sf_dir("/root/testdata/sf0.001")
    out_dir = tempfile.mkdtemp(prefix="graft_entry_")
    return run_flagship(path, out_dir=out_dir)


# --------------------------------------------------------------------------
# queries: one entry per implemented operator/pipeline (SURVEY.md §2)
# --------------------------------------------------------------------------

def _transcripts_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(ensure_for_sf_dir(sf_dir))


def _enriched_ds(sf_dir: str, gate: bool = False):
    from fluent_plugin_geoip_ray.pipelines.flagship import build_enriched

    ds = build_enriched(_transcripts_ds(sf_dir))
    if gate:
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.fill_null(t["geoip_enriched"], False)),
            batch_format="pyarrow",
        )
    return ds


_ENRICH_COLS = [
    "conv_id",
    "turn_idx",
    "ip",
    "city",
    "country_code",
    "country_name",
    "region",
    "latitude",
    "longitude",
]


def q_parse_extract(sf_dir: str):
    """P2 analog: vectorized regex extraction of ip/ip2/host from text."""
    from fluent_plugin_geoip_ray.stages.parse import parse_dataset

    ds = parse_dataset(_transcripts_ds(sf_dir))
    return ds.select_columns(["conv_id", "turn_idx", "ip", "ip2", "host"])


def q_enrich(sf_dir: str):
    """P3/P4/P5: geo enrich with the canonical record spec (scalar columns)."""
    return _enriched_ds(sf_dir).select_columns(_ENRICH_COLS)


def q_route_enriched(sf_dir: str):
    """P6 + routing: the gated 'enriched' sink rows with rewritten tag."""
    from fluent_plugin_geoip_ray.pipelines.flagship import canonical_routes
    from fluent_plugin_geoip_ray.stages.route import route_dataset

    route = canonical_routes(None)[0]
    ds = route_dataset(_enriched_ds(sf_dir), route)
    return ds.select_columns(["conv_id", "turn_idx", "tag"] + _ENRICH_COLS[2:])


def q_agg_country(sf_dir: str):
    """[N] per-sink aggregate: enriched-sink counts by country_code."""
    from fluent_plugin_geoip_ray.stages.aggregate import count_by

    return count_by(_enriched_ds(sf_dir, gate=True), "country_code")


def q_agg_conv(sf_dir: str):
    """[N] per-sink aggregate: enriched-sink counts by conv_id."""
    from fluent_plugin_geoip_ray.stages.aggregate import count_by

    return count_by(_enriched_ds(sf_dir, gate=True), "conv_id")


def q_sorted_text(sf_dir: str):
    """[N] ordering/byte-identity: enriched-sink (conv_id, turn_idx, text)."""
    ds = _enriched_ds(sf_dir, gate=True)
    return ds.select_columns(["conv_id", "turn_idx", "text"]).sort(
        ["conv_id", "turn_idx"]
    )


def q_events_extract(sf_dir: str):
    """Regex parse over the driver events table (grok analog on props)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def fn(t):
        k = pc.struct_field(
            pc.extract_regex(t["props"], r'"k": (?P<k>\d+)'), "k"
        ).cast("int64")
        return t.append_column("k", k)

    return ds.map_batches(fn, batch_format="pyarrow").select_columns(["event_id", "k"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "parse_extract": q_parse_extract,
        "enrich": q_enrich,
        "route_enriched": q_route_enriched,
        "agg_country": q_agg_country,
        "agg_conv": q_agg_conv,
        "sorted_text": q_sorted_text,
        "events_extract": q_events_extract,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB, same parquet bytes)
# --------------------------------------------------------------------------

_PARSED = f"""
    SELECT conv_id, turn_idx,
           nullif(regexp_extract(text, '{IPV4}', 1), '') AS ip,
           nullif(coalesce(regexp_extract_all(text, '{IPV4}')[2], ''), '') AS ip2,
           nullif(regexp_extract(text, '(host_[a-z]+)', 1), '') AS host,
           text
    FROM read_parquet('{_T_PATH}')
"""

# enrich semantics (filter_geoip.rb:187-202): LEFT JOIN against the fixture;
# found-doc-with-null-lat/lon coalesces to 0.0, unknown IP stays NULL
_ENRICHED = f"""
    SELECT p.conv_id, p.turn_idx, p.ip, p.text,
           g.city_names_en AS city,
           g.country_iso_code AS country_code,
           g.country_names_en AS country_name,
           g.subdiv0_iso_code AS region,
           CASE WHEN g.ip IS NOT NULL THEN coalesce(g.location_latitude, 0.0) END AS latitude,
           CASE WHEN g.ip IS NOT NULL THEN coalesce(g.location_longitude, 0.0) END AS longitude,
           (g.ip IS NOT NULL AND g.city_names_en IS NOT NULL) AS enriched
    FROM ({_PARSED}) p
    LEFT JOIN read_parquet('{_G_PATH}') g ON p.ip = g.ip
"""


def oracle_sql() -> dict[str, str]:
    return {
        "parse_extract": f"SELECT conv_id, turn_idx, ip, ip2, host FROM ({_PARSED})",
        "enrich": f"SELECT conv_id, turn_idx, ip, city, country_code, country_name,"
                  f" region, latitude, longitude FROM ({_ENRICHED})",
        "route_enriched": f"""
            SELECT conv_id, turn_idx,
                   'enriched.' || CASE ((turn_idx) % 3)
                       WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS tag,
                   ip, city, country_code, country_name, region, latitude, longitude
            FROM ({_ENRICHED}) WHERE enriched""",
        "agg_country": f"SELECT country_code, count(*) AS n FROM ({_ENRICHED})"
                       f" WHERE enriched GROUP BY country_code",
        "agg_conv": f"SELECT conv_id, count(*) AS n FROM ({_ENRICHED})"
                    f" WHERE enriched GROUP BY conv_id",
        "sorted_text": f"SELECT conv_id, turn_idx, text FROM ({_ENRICHED})"
                       f" WHERE enriched ORDER BY conv_id, turn_idx",
        "events_extract": "SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1)"
                          " AS BIGINT) AS k FROM events",
    }
