"""Config front-end + backend-matrix tests: fluentd-conf intake rules and the
geoip2_compat / legacy-geoip flat-key scenario matrices
(test_filter_geoip.rb:523-816 compat, :818-1217 legacy)."""

import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.conf import parse_fluentd_conf, record_spec_from_conf
from fluent_plugin_geoip_ray.config import ConfigError, compile_record_spec
from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich
from fluent_plugin_geoip_ray.state.fixture import fixture_flat_docs


def test_enable_key_rejected():
    with pytest.raises(ConfigError, match="obsoleted"):
        record_spec_from_conf({"enable_key_city": "geoip_city"})


def test_deprecated_lookup_key_comma_split():
    spec = record_spec_from_conf({"geoip_lookup_key": "from_ip, to_ip"})
    assert spec.lookup_keys == ["from_ip", "to_ip"]


def test_parse_fluentd_conf_snippet():
    conf = parse_fluentd_conf(
        """
        backend_library geoip2_c
        geoip_lookup_keys host
        skip_adding_null_record true
        <record>
          city ${city.names.en['host']}
          lat  ${location.latitude['host']}
        </record>
        """
    )
    spec = record_spec_from_conf(conf)
    assert spec.backend_library == "geoip2_c"
    assert spec.skip_adding_null_record is True
    assert spec.lookup_keys == ["host"]
    assert list(spec.record) == ["city", "lat"]
    compiled = compile_record_spec(spec)
    assert len(compiled.placeholders) == 2


def enrich_with(style, record, ips):
    spec = record_spec_from_conf(
        {"geoip_lookup_keys": ["ip"], "record": record, "backend_library": style}
    )
    stage = GeoEnrich(
        compile_record_spec(spec),
        backend_spec={"library": "dict", "docs": fixture_flat_docs(style)},
    )
    return stage(pa.table({"ip": ips})).to_pylist()


def test_geoip2_compat_matrix():
    """Mirrors test_filter_geoip.rb:596-656 with flat compat keys."""
    record = {
        "from_city": "${city['ip']}",
        "from_country": "${country_name['ip']}",
        "latitude": "${latitude['ip']}",
        "longitude": "${longitude['ip']}",
        "float_concat": "${latitude['ip']},${longitude['ip']}",
        "float_array": "[${longitude['ip']}, ${latitude['ip']}]",
        "string_array": "[${city['ip']}, ${country_name['ip']}]",
        "unknown_city": "${city['unknown_key']}",
    }
    hit, miss = enrich_with("geoip2_compat", record, ["66.102.3.80", "203.0.113.1"])
    assert hit["from_city"] == "Mountain View"
    assert hit["latitude"] == 37.419200000000004
    assert hit["float_concat"] == "37.419200000000004,-122.0574"
    assert hit["float_array"] == [-122.0574, 37.419200000000004]
    assert hit["string_array"] == ["Mountain View", "United States"]
    assert hit["unknown_city"] is None
    assert miss["from_city"] is None and miss["float_concat"] == ","


def test_geoip_legacy_matrix():
    """Mirrors test_filter_geoip.rb:891-951 with the 9 legacy keys."""
    record = {
        "from_city": "${city['ip']}",
        "code3": "${country_code3['ip']}",
        "dma": "${dma_code['ip']}",
        "region": "${region['ip']}",
    }
    # dma_code is an int -> needs an explicit type override
    spec = record_spec_from_conf(
        {"geoip_lookup_keys": ["ip"], "record": record, "backend_library": "geoip"}
    )
    spec.placeholder_types = {"${dma_code['ip']}": "int64"}
    stage = GeoEnrich(
        compile_record_spec(spec),
        backend_spec={"library": "dict", "docs": fixture_flat_docs("geoip")},
    )
    hit = stage(pa.table({"ip": ["66.102.3.80"]})).to_pylist()[0]
    assert hit["from_city"] == "Mountain View"
    assert hit["code3"] == "USA"
    assert hit["dma"] == 807
    assert hit["region"] == "CA"


def test_compat_rejects_nested_keys():
    with pytest.raises(ConfigError, match="unsupported key"):
        enrich_with("geoip2_compat", {"x": "${city.names.en['ip']}"}, ["8.8.8.8"])


def test_dump_cli(capsys):
    from fluent_plugin_geoip_ray.dump import main

    assert main(["66.102.3.80"]) == 0
    out = capsys.readouterr().out
    assert "Mountain View" in out
    assert main(["203.0.113.1"]) == 1
    assert main(["66.102.3.80", "geoip2_compat"]) == 0


def test_backend_spec_from_conf():
    """ADVICE r2: dispatch on backend_library like the reference
    (filter_geoip.rb:204-217), not on which path param is present."""
    from fluent_plugin_geoip_ray.conf import backend_spec_from_conf
    from fluent_plugin_geoip_ray.config import ConfigError

    assert backend_spec_from_conf({}) is None
    assert backend_spec_from_conf({"geoip2_database": "/x/a.mmdb"}) == {
        "library": "maxmind", "path": "/x/a.mmdb"
    }
    assert backend_spec_from_conf({
        "backend_library": "geoip2_compat", "geoip2_database": "/x/a.mmdb"
    }) == {"library": "maxmind", "path": "/x/a.mmdb"}
    # geoip2_* backends ignore the legacy path param (reference dispatch)
    assert backend_spec_from_conf({"geoip_database": "/x/b.dat"}) is None
    # the legacy .dat backend dispatches to the bundled reader; an
    # unreadable path is an explicit config-time error, not a confusing
    # parse failure at task time
    with pytest.raises(ConfigError, match="cannot open legacy GeoIP"):
        backend_spec_from_conf({
            "backend_library": "geoip", "geoip_database": "/x/b.dat"
        })
    import tempfile

    from fluent_plugin_geoip_ray.state.dat import ensure_fixture_dat

    dat = ensure_fixture_dat(
        tempfile.gettempdir() + "/graft_data/geo_fixture_legacy.dat")
    assert backend_spec_from_conf({
        "backend_library": "geoip", "geoip_database": dat
    }) == {"library": "geoip_dat", "path": dat}
    assert backend_spec_from_conf({"backend_library": "geoip"}) is None
    with pytest.raises(ConfigError, match="unsupported backend_library"):
        backend_spec_from_conf({"backend_library": "mystery"})


def test_run_cli_with_mmdb_conf(tmp_path):
    """fluentd-style conf with geoip2_database -> the whole CLI pipeline runs
    through the binary mmdb backend end-to-end."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from fluent_plugin_geoip_ray.sources.transcripts import (
        ensure_for_sf_dir,
        ensure_mmdb_fixture,
    )

    inp = ensure_for_sf_dir("/root/testdata/sf0.001")
    mmdb = ensure_mmdb_fixture()
    conf = {
        "filter": {
            "geoip_lookup_keys": ["ip"],
            "geoip2_database": mmdb,
            "record": {"city": "${city.names.en['ip']}"},
        },
    }
    conf_path = tmp_path / "pipe.json"
    conf_path.write_text(json.dumps(conf))
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "fluent_plugin_geoip_ray.run",
         "--input", inp, "--out", str(out), "--conf", str(conf_path),
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    files = list((out / "enriched").rglob("*.parquet"))
    assert files
    t = pq.read_table(files[0])
    assert "city" in t.column_names
    cities = set(t.column("city").to_pylist())
    assert "Mountain View" in cities or "Tokorozawa" in cities


def test_example_conf_loads():
    """examples/pipeline.json stays loadable (user-facing template)."""
    import os

    from fluent_plugin_geoip_ray.run import load_conf

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "pipeline.json")
    spec, routes, backend, stages = load_conf(path)
    assert spec.lookup_keys == ["ip"]
    assert [r.name for r in routes] == ["enriched", "raw"]
    assert backend is None  # no geoip2_database -> dict fixture backend
    assert [s["use"] for s in stages] == ["redact", "hash_sample"]
