"""MaxMind .mmdb execution path: build a deterministic fixture database with
the spec-based writer, read it back with the pure-Python reader, and run the
enrich golden matrix through MaxmindBackend (filter_geoip.rb:204-217 backend
dispatch; lookup contract of GeoIP2::Database#lookup)."""

import ipaddress

import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.config import RecordSpec, compile_record_spec
from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich
from fluent_plugin_geoip_ray.state.backends import MaxmindBackend, make_backend
from fluent_plugin_geoip_ray.state.fixture import GEO_FIXTURE_ROWS, fixture_geo_docs
from fluent_plugin_geoip_ray.state.mmdb import MMDBReader, write_mmdb


@pytest.fixture(scope="module")
def mmdb_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mmdb") / "fixture.mmdb")
    return write_mmdb(fixture_geo_docs(), path)


def test_writer_is_deterministic(tmp_path):
    p1 = write_mmdb(fixture_geo_docs(), str(tmp_path / "a.mmdb"))
    p2 = write_mmdb(fixture_geo_docs(), str(tmp_path / "b.mmdb"))
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_reader_roundtrips_every_fixture_ip(mmdb_path):
    reader = MMDBReader(mmdb_path)
    docs = fixture_geo_docs()
    for row in GEO_FIXTURE_ROWS:
        ip = row["ip"]
        assert reader.get(ip) == docs[ip], ip


def test_reader_metadata(mmdb_path):
    reader = MMDBReader(mmdb_path)
    md = reader.metadata
    assert md["binary_format_major_version"] == 2
    assert md["ip_version"] == 6
    assert md["record_size"] == 32
    assert md["languages"] == ["en"]
    assert isinstance(md["node_count"], int) and md["node_count"] > 0


def test_reader_misses(mmdb_path):
    reader = MMDBReader(mmdb_path)
    assert reader.get("203.0.113.1") is None          # RFC5737, absent
    assert reader.get("1.2.3.4") is None
    assert reader.get("2001:db8::1") is None           # absent v6
    with pytest.raises(ValueError):
        reader.get("not-an-ip")


def test_ipv6_lookup(mmdb_path):
    reader = MMDBReader(mmdb_path)
    doc = reader.get("2001:4860:4860::8888")
    assert doc["country"]["iso_code"] == "US"


def test_size31_field_roundtrip(tmp_path):
    """ADVICE r2: the size-31 length base is 65_821 (285 + 65536) per the
    MaxMind DB spec.  A field >= 65_821 bytes must round-trip — the old
    821_245 constant made the writer crash with OverflowError in the
    65_821..821_244 range and mis-decode conformant files."""
    big = "x" * 70_000                      # inside the formerly-broken range
    docs = {"10.9.9.9": {"country": {"iso_code": "US"}, "blob": big}}
    path = write_mmdb(docs, str(tmp_path / "big.mmdb"))
    doc = MMDBReader(path).get("10.9.9.9")
    assert doc["blob"] == big
    assert doc["country"]["iso_code"] == "US"


def test_maxmind_backend_lookup_contract(mmdb_path):
    be = MaxmindBackend(mmdb_path)
    assert be.lookup("66.102.3.80")["city"]["names"]["en"] == "Mountain View"
    assert be.lookup("not-an-ip") is None              # invalid input -> miss
    assert be.lookup("203.0.113.1") is None
    assert make_backend({"library": "maxmind", "path": mmdb_path}).lookup(
        "8.8.8.8"
    )["country"]["iso_code"] == "US"


def _enrich_rows(record, ips, mmdb_path, **spec_kw):
    spec = RecordSpec(lookup_keys=["ip"], record=record, **spec_kw)
    stage = GeoEnrich(
        compile_record_spec(spec),
        backend_spec={"library": "maxmind", "path": mmdb_path},
    )
    return stage(pa.table({"ip": list(ips)})).to_pylist()


def test_enrich_matrix_through_mmdb(mmdb_path):
    """The reference record-directive matrix (test_filter_geoip.rb:258-323)
    through the REAL binary-trie path -- values must equal the DictBackend
    goldens (same fixture truth, different storage engine)."""
    record = {
        "city": "${city.names.en['ip']}",
        "country": "${country.names.en['ip']}",
        "latitude": "${location.latitude['ip']}",
        "longitude": "${location.longitude['ip']}",
        "geopoint": "[${location.longitude['ip']}, ${location.latitude['ip']}]",
        "nest": '{ "city" : ${city.names.en[\'ip\']}, "cc" : ${country.iso_code[\'ip\']}}',
    }
    ips = ["66.102.3.80", "8.8.8.8", "180.94.85.84", "203.0.113.1", None]
    rows = _enrich_rows(record, ips, mmdb_path)

    hit = rows[0]
    assert hit["city"] == "Mountain View"
    assert hit["country"] == "United States"
    assert hit["latitude"] == 37.419200000000004
    assert hit["longitude"] == -122.0574
    assert hit["geopoint"] == [-122.0574, 37.419200000000004]
    assert hit["nest"] == {"city": "Mountain View", "cc": "US"}

    no_city = rows[1]
    assert no_city["city"] is None and no_city["country"] == "United States"

    nil_latlon = rows[2]   # doc exists, lat/lon nil -> 0.0 (filter_geoip.rb:194-198)
    assert nil_latlon["latitude"] == 0.0 and nil_latlon["longitude"] == 0.0

    miss = rows[3]
    assert miss["city"] is None and miss["latitude"] is None

    null_in = rows[4]
    assert null_in["city"] is None


def test_mmdb_backend_matches_dict_backend(mmdb_path):
    """Same spec, same inputs: binary path == dict path, field for field."""
    record = {
        "city": "${city.names.en['ip']}",
        "cc": "${country.iso_code['ip']}",
        "latitude": "${location.latitude['ip']}",
    }
    ips = [r["ip"] for r in GEO_FIXTURE_ROWS] + ["203.0.113.9", None]
    spec = compile_record_spec(RecordSpec(lookup_keys=["ip"], record=record))
    via_mmdb = GeoEnrich(
        spec, backend_spec={"library": "maxmind", "path": mmdb_path}
    )(pa.table({"ip": ips})).to_pylist()
    via_dict = GeoEnrich(spec)(pa.table({"ip": ips})).to_pylist()
    assert via_mmdb == via_dict


def test_mmdb_property_roundtrip():
    """Property: any {ip -> doc} table of JSON-ish docs survives the
    write->read round trip exactly (spec encoder/decoder inverse pair)."""
    from hypothesis import given, settings, strategies as st

    scalars = st.one_of(
        st.text(max_size=12),
        st.booleans(),
        st.integers(min_value=0, max_value=2**63 - 1),
        st.integers(min_value=-2**31, max_value=-1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    )
    docs_strategy = st.dictionaries(
        st.from_regex(r"\A\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\Z").filter(
            lambda ip: all(int(o) < 256 for o in ip.split("."))
        ),
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.one_of(scalars, st.lists(scalars, max_size=3),
                      st.dictionaries(st.text(min_size=1, max_size=6),
                                      scalars, max_size=3)),
            max_size=4,
        ),
        min_size=1, max_size=8,
    )

    @settings(max_examples=25, deadline=None)
    @given(docs=docs_strategy)
    def check(docs, tmp_dir):
        import os

        # writer skips unparseable keys (e.g. leading-zero octets, rejected
        # by ipaddress); normalize to the parseable subset the writer stores
        valid = {}
        for ip, doc in docs.items():
            try:
                ipaddress.ip_address(ip)
            except ValueError:
                continue
            valid[ip] = doc
        if not valid:
            return
        path = os.path.join(tmp_dir, "prop.mmdb")
        write_mmdb(valid, path)
        reader = MMDBReader(path)
        for ip, doc in valid.items():
            got = reader.get(ip)
            assert got == doc, (ip, got, doc)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        check(tmp_dir=d)
