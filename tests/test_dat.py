"""Legacy GeoIP .dat backend: binary round-trips through the bundled
pure-Python City-edition writer/reader (state/dat.py) and the enrich
matrix through the real binary path (mirrors test_filter_geoip.rb's
legacy scenarios, test/plugin/test_filter_geoip.rb:818-1217)."""

import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.config import compile_record_spec
from fluent_plugin_geoip_ray.conf import record_spec_from_conf
from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich
from fluent_plugin_geoip_ray.state.dat import (
    DatReader,
    dat_fixture_networks,
    write_city_dat,
)
from fluent_plugin_geoip_ray.state.fixture import fixture_flat_docs


def dat_precision(v):
    """Lat/lon at the format's intrinsic 4-decimal precision."""
    return int(round((v + 180.0) * 10000)) / 10000.0 - 180.0


@pytest.fixture(scope="module")
def fixture_dat(tmp_path_factory):
    p = tmp_path_factory.mktemp("dat") / "fixture.dat"
    return write_city_dat(str(p), dat_fixture_networks())


def test_fixture_roundtrip_all_ips(fixture_dat):
    from fluent_plugin_geoip_ray.state.dat import _ip4_to_int

    r = DatReader(fixture_dat)
    for ip, doc in fixture_flat_docs("geoip").items():
        if _ip4_to_int(ip) is None:
            continue  # host tokens / IPv6: not representable in a v4 .dat
        got = r.record_by_addr(ip)
        assert got is not None, ip
        for k, v in doc.items():
            if k in ("latitude", "longitude"):
                if v is None:
                    # .dat cannot store "no coordinate": nil encodes as 0.0,
                    # which matches the reference's legacy nil->0.0 coalesce
                    assert got[k] == dat_precision(0.0)
                else:
                    assert got[k] == pytest.approx(dat_precision(v), abs=0), (ip, k)
            else:
                assert got[k] == v, (ip, k)


def test_miss_invalid_and_v6_inputs(fixture_dat):
    r = DatReader(fixture_dat)
    assert r.record_by_addr("203.0.113.99") is None      # unknown IP
    assert r.record_by_addr("not an ip") is None
    assert r.record_by_addr("2607:f0d0::4") is None      # v4-only reader
    assert r.record_by_addr("999.1.1.1") is None


def test_cidr_networks_and_most_specific(tmp_path):
    path = str(tmp_path / "cidr.dat")
    inner = {"country_code": "JP", "city": "Tokyo",
             "latitude": 35.61, "longitude": 139.68, "region": "13"}
    outer = {"country_code": "US", "city": None,
             "latitude": 37.751, "longitude": -97.822, "region": None}
    write_city_dat(path, [
        ("10.1.0.0/16", outer.copy()),
        ("10.2.3.0/24", inner.copy()),
    ])
    r = DatReader(path)
    assert r.record_by_addr("10.1.200.9")["country_code"] == "US"
    assert r.record_by_addr("10.2.3.77")["city"] == "Tokyo"
    assert r.record_by_addr("10.2.4.1") is None
    assert r.record_by_addr("10.2.3.77")["country_code3"] == "JPN"
    assert r.record_by_addr("10.2.3.77")["country_name"] == "Japan"


def test_us_only_dma_area_encoding(tmp_path):
    path = str(tmp_path / "dma.dat")
    write_city_dat(path, [
        ("1.1.1.1", {"country_code": "US", "dma_code": 807, "area_code": 650,
                     "latitude": 1.0, "longitude": 2.0}),
        ("1.1.1.2", {"country_code": "US", "latitude": 1.0, "longitude": 2.0}),
        ("1.1.1.3", {"country_code": "JP", "latitude": 1.0, "longitude": 2.0}),
    ])
    r = DatReader(path)
    assert (r.record_by_addr("1.1.1.1")["dma_code"],
            r.record_by_addr("1.1.1.1")["area_code"]) == (807, 650)
    assert r.record_by_addr("1.1.1.2")["dma_code"] is None
    assert r.record_by_addr("1.1.1.3")["dma_code"] is None


def test_overlap_rejection(tmp_path):
    doc = {"country_code": "US", "latitude": 0.0, "longitude": 0.0}
    with pytest.raises(ValueError, match="overlap|nested"):
        write_city_dat(str(tmp_path / "x.dat"),
                       [("10.0.0.0/8", doc), ("10.1.0.0/16", doc)])
    with pytest.raises(ValueError, match="overlap|nested"):
        write_city_dat(str(tmp_path / "y.dat"),
                       [("10.1.0.0/16", doc), ("10.0.0.0/8", doc)])


def test_not_a_dat_file(tmp_path):
    p = tmp_path / "junk.dat"
    p.write_bytes(b"parquet? nope" * 10)
    with pytest.raises(ValueError, match="structure block"):
        DatReader(str(p))


def test_enrich_matrix_through_binary_dat(fixture_dat):
    """The legacy enrich scenario (test_filter_geoip.rb:891-951) through
    the REAL binary trie: same assertions as the flat-dict matrix."""
    record = {
        "from_city": "${city['ip']}",
        "code3": "${country_code3['ip']}",
        "dma": "${dma_code['ip']}",
        "region": "${region['ip']}",
        "lat": "${latitude['ip']}",
    }
    spec = record_spec_from_conf(
        {"geoip_lookup_keys": ["ip"], "record": record,
         "backend_library": "geoip"}
    )
    spec.placeholder_types = {"${dma_code['ip']}": "int64"}
    stage = GeoEnrich(
        compile_record_spec(spec),
        backend_spec={"library": "geoip_dat", "path": fixture_dat},
    )
    out = stage(pa.table({"ip": ["66.102.3.80", "125.54.15.42",
                                 "203.0.113.1"]})).to_pylist()
    hit, jp, miss = out
    assert hit["from_city"] == "Mountain View"
    assert hit["code3"] == "USA"
    assert hit["dma"] == 807
    assert hit["region"] == "CA"
    assert hit["lat"] == pytest.approx(37.4192, abs=1e-9)
    assert jp["from_city"] == "Tokorozawa"
    assert jp["code3"] == "JPN"
    assert jp["dma"] is None
    assert miss["from_city"] is None
