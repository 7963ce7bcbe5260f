"""Golden-output enrich tests, transposing the reference's scenario matrices
(test/plugin/test_filter_geoip.rb:168-521, geoip2_c backend; values pinned to
the GeoIP2 goldens) onto Arrow batches.  No Ray needed: GeoEnrich is a plain
callable over pyarrow Tables."""

import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.config import RecordSpec, compile_record_spec
from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich


def enrich(record, ips, lookup_keys=("ip",), **spec_kw):
    spec = RecordSpec(lookup_keys=list(lookup_keys), record=record, **spec_kw)
    stage = GeoEnrich(compile_record_spec(spec))
    batch = (
        pa.table({"ip": list(ips)})
        if isinstance(ips[0], (str, type(None)))
        else pa.table(ips[0])
    )
    return stage(batch).to_pylist()


CITY = "${city.names.en['ip']}"
LAT = "${location.latitude['ip']}"
LON = "${location.longitude['ip']}"


def test_full_record_directive_matrix():
    """test_filter_geoip.rb:258-323 golden records."""
    record = {
        "from_city": CITY,
        "from_country": "${country.names.en['ip']}",
        "latitude": LAT,
        "longitude": LON,
        "float_concat": f"{LAT},{LON}",
        "float_array": f"[{LON}, {LAT}]",
        "float_nest": f'{{ "lat" : {LAT}, "lon" : {LON}}}',
        "string_concat": "${city.names.en['ip']},${country.names.en['ip']}",
        "string_array": "[${city.names.en['ip']}, ${country.names.en['ip']}]",
        "string_nest": '{ "city" : ${city.names.en[\'ip\']}, "country_name" : ${country.names.en[\'ip\']}}',
        "unknown_city": "${city.names.en['unknown_key']}",
        "undefined": "${city.names.en['undefined']}",
        "broken_array1": f"[{LON}, ${{location.latitude['undefined']}}]",
        "broken_array2": "[${location.longitude['undefined']}, ${location.latitude['undefined']}]",
    }
    rows = enrich(record, ["66.102.3.80", None])
    hit, miss = rows[0], rows[1]
    assert hit["from_city"] == "Mountain View"
    assert hit["from_country"] == "United States"
    assert hit["latitude"] == 37.419200000000004
    assert hit["longitude"] == -122.0574
    assert hit["float_concat"] == "37.419200000000004,-122.0574"
    assert hit["float_array"] == [-122.0574, 37.419200000000004]
    assert hit["float_nest"] == {"lat": 37.419200000000004, "lon": -122.0574}
    assert hit["string_concat"] == "Mountain View,United States"
    assert hit["string_array"] == ["Mountain View", "United States"]
    assert hit["string_nest"] == {"city": "Mountain View", "country_name": "United States"}
    assert hit["unknown_city"] is None
    assert hit["undefined"] is None
    assert hit["broken_array1"] == [-122.0574, None]
    assert hit["broken_array2"] == [None, None]

    assert miss["from_city"] is None
    assert miss["latitude"] is None
    assert miss["float_concat"] == ","
    assert miss["float_array"] == [None, None]
    assert miss["float_nest"] == {"lat": None, "lon": None}
    assert miss["string_concat"] == ","
    assert miss["string_array"] == [None, None]
    assert miss["string_nest"] == {"city": None, "country_name": None}


def test_unknown_and_invalid_ip_yield_nils():
    """test_filter_geoip.rb:189-210: RFC5737 / garbage IPs miss quietly."""
    rows = enrich({"city": CITY}, ["203.0.113.1", "not-an-ip", "999.999.999.999"])
    assert all(r["city"] is None for r in rows)
    assert all(r["geoip_enriched"] is False for r in rows)


def test_empty_string_ip_yields_nil():
    """test_filter_geoip.rb:212-230 (warn + nil, distinct from missing)."""
    rows = enrich({"city": CITY}, [""])
    assert rows[0]["city"] is None


def test_missing_lookup_column_yields_nil():
    """'message' => 'missing field' scenario (test_filter_geoip.rb:301-317)."""
    spec = RecordSpec(lookup_keys=["ip"], record={"city": CITY})
    stage = GeoEnrich(compile_record_spec(spec))
    out = stage(pa.table({"other": ["x"]})).to_pylist()
    assert out[0]["city"] is None


def test_nil_latlon_coalesces_to_zero():
    """filter_geoip.rb:194-198 via the doc-without-location fixture IP
    (mock-DB scenario test_filter_geoip.rb:456-480)."""
    rows = enrich(
        {"latitude": LAT, "longitude": LON, "country": "${country.names.en['ip']}"},
        ["180.94.85.84"],
    )
    assert rows[0]["latitude"] == 0.0
    assert rows[0]["longitude"] == 0.0
    assert rows[0]["country"] == "Afghanistan"


def test_skip_adding_null_record_first_placeholder_order():
    """README.md:114-192 + filter_geoip.rb:122-123: the gate keys off the
    FIRST record entry's placeholder. 8.8.8.8 has country but no city."""
    # city first -> 8.8.8.8 skipped
    rows = enrich(
        {"city": CITY, "country": "${country.names.en['ip']}"},
        ["8.8.8.8"],
        skip_adding_null_record=True,
    )
    assert rows[0]["geoip_enriched"] is False
    assert rows[0]["city"] is None and rows[0]["country"] is None
    # country first -> kept, city stays nil
    rows = enrich(
        {"country": "${country.names.en['ip']}", "city": CITY},
        ["8.8.8.8"],
        skip_adding_null_record=True,
    )
    assert rows[0]["geoip_enriched"] is True
    assert rows[0]["country"] == "United States"
    assert rows[0]["city"] is None


def test_skip_gate_all_enrich_values_suppressed():
    """test_filter_geoip.rb:232-256: when the gate fires, no enrich values."""
    rows = enrich(
        {"city": CITY, "lat": LAT},
        ["203.0.113.1"],
        skip_adding_null_record=True,
    )
    assert rows[0]["city"] is None and rows[0]["lat"] is None
    assert rows[0]["geoip_enriched"] is False


def test_multiple_lookup_keys_resolve_independently():
    """test_filter_geoip.rb:325-362: from/to keys bind per-placeholder."""
    batch = pa.table(
        {"from_ip": ["66.102.3.80"], "to_ip": ["125.54.15.42"]}
    )
    spec = RecordSpec(
        lookup_keys=["from_ip", "to_ip"],
        record={
            "from_country": "${country.names.en['from_ip']}",
            "to_country": "${country.names.en['to_ip']}",
            "string_array": "[${country.names.en['from_ip']}, ${country.names.en['to_ip']}]",
        },
    )
    out = GeoEnrich(compile_record_spec(spec))(batch).to_pylist()[0]
    assert out["from_country"] == "United States"
    assert out["to_country"] == "Japan"
    assert out["string_array"] == ["United States", "Japan"]


def test_quoted_json_template_and_quoted_placeholder_drop():
    """test_filter_geoip.rb:364-400: quoted '[...]' is JSON; a quoted
    placeholder inside a plain string template interpolates ''."""
    rows = enrich(
        {
            "geopoint": f"'[{LON}, {LAT}]'",
            "quoted_in_string": f"x '{CITY}' y",
        },
        ["66.102.3.80"],
    )
    assert rows[0]["geopoint"] == [-122.0574, 37.419200000000004]
    assert rows[0]["quoted_in_string"] == "x  y"


def test_host_token_lookup():
    rows = enrich({"city": "${city.names.en['host']}"}, [None],
                  lookup_keys=("host",))
    # column 'host' missing in the one-column table -> nil; now with a table:
    batch = pa.table({"host": ["host_google", "host_unknown"]})
    spec = RecordSpec(lookup_keys=["host"], record={"city": "${city.names.en['host']}"})
    out = GeoEnrich(compile_record_spec(spec))(batch).to_pylist()
    assert out[0]["city"] == "Mountain View"
    assert out[1]["city"] is None


def test_ip_dedup_cache_across_batches():
    spec = RecordSpec(lookup_keys=["ip"], record={"city": CITY})
    stage = GeoEnrich(compile_record_spec(spec))
    stage(pa.table({"ip": ["66.102.3.80"] * 10}))
    assert stage._doc_cache["66.102.3.80"] is not None
    out = stage(pa.table({"ip": ["66.102.3.80", "8.8.8.8"]})).to_pylist()
    assert out[0]["city"] == "Mountain View"


def test_typed_passthrough_vs_string_coercion():
    """SURVEY §2.4.3: latitude float, float_concat string."""
    rows = enrich({"latitude": LAT, "concat": f"{LAT},{LON}"}, ["66.102.3.80"])
    assert isinstance(rows[0]["latitude"], float)
    assert isinstance(rows[0]["concat"], str)


def test_actor_mode_with_backend_ref():
    """Actor-pool enrich with a ray.put broadcast docs dict (the mmdb-analog
    path: big side state shipped once, hydrated in actor __init__)."""
    import ray
    import ray.data as rd

    from fluent_plugin_geoip_ray.state.fixture import fixture_geo_docs
    from fluent_plugin_geoip_ray.stages.enrich import enrich_dataset

    docs_ref = ray.put(fixture_geo_docs())
    spec = RecordSpec(lookup_keys=["ip"], record={"city": CITY})
    ds = rd.from_items([{"ip": "66.102.3.80"}, {"ip": "203.0.113.1"}])
    out = (
        enrich_dataset(ds, spec, backend_ref=docs_ref, concurrency=(1, 2))
        .to_pandas().sort_values("ip").reset_index(drop=True)
    )
    import pandas as pd

    # sorted by ip: 203.0.113.1 > 66.102.3.80 lexicographically
    assert out.loc[1, "city"] == "Mountain View"
    assert pd.isna(out.loc[0, "city"])


def test_actor_mode_explicit():
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.enrich import enrich_dataset

    spec = RecordSpec(lookup_keys=["ip"], record={"city": CITY})
    ds = rd.from_items([{"ip": "125.54.15.42"}])
    out = enrich_dataset(ds, spec, mode="actors", concurrency=(1, 1)).to_pandas()
    assert out.loc[0, "city"] == "Tokorozawa"


def test_ipv6_lookup_end_to_end():
    """IPv6 token extraction + lookup (geoip2 backends accept v6)."""
    from fluent_plugin_geoip_ray.stages.parse import parse_transcripts

    t = pa.table({"text": ["query from 2001:4860:4860::8888 ok", "none"],
                  "role": ["user", "user"]})
    parsed = parse_transcripts(t, fields=("ip", "ip6"))
    assert parsed.column("ip6").to_pylist() == ["2001:4860:4860::8888", None]
    spec = RecordSpec(lookup_keys=["ip6"],
                      record={"cc": "${country.iso_code['ip6']}"})
    out = GeoEnrich(compile_record_spec(spec))(parsed).to_pylist()
    assert out[0]["cc"] == "US" and out[1]["cc"] is None


def test_empty_record_directive_passthrough():
    """Reference accepts an empty config / empty <record> and passes records
    through unchanged (test_filter_geoip.rb:42-47; add_geoip_field over an
    empty @map).  Here: no enrich columns added, data columns byte-equal,
    only the gate column (no placeholder found -> not enriched) appears."""
    from fluent_plugin_geoip_ray.config import RecordSpec

    spec = RecordSpec(lookup_keys=["ip"], record={})
    stage = GeoEnrich(compile_record_spec(spec))
    batch = pa.table({"ip": ["66.102.3.80", None], "message": ["a", "b"]})
    out = stage(batch)
    assert out.column_names == ["ip", "message", "geoip_enriched"]
    assert out.select(["ip", "message"]).equals(batch)
    assert out["geoip_enriched"].to_pylist() == [False, False]
