"""Nested record-accessor lookup paths (filter_geoip.rb:60; test matrix
test_filter_geoip.rb:88-117,482-520): $.a.b and $["a"]["b"] / $['a']['b']
resolve struct columns; plain dotted keys stay literal column names."""

import pyarrow as pa

from fluent_plugin_geoip_ray.config import RecordSpec, compile_record_spec
from fluent_plugin_geoip_ray.functions.accessor import (
    accessor_root,
    parse_accessor,
    resolve_accessor,
)
from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich


def test_parse_accessor_styles():
    assert parse_accessor("$.from.ip") == ("from", "ip")
    assert parse_accessor('$["host"]["ip"]') == ("host", "ip")
    assert parse_accessor("$['host']['ip']") == ("host", "ip")
    assert parse_accessor("$['a'][0]['b']") == ("a", 0, "b")
    assert parse_accessor("$.a.b[2]") == ("a", "b", 2)
    # plain keys -- even dotted ones -- are literal (filter_geoip.rb:55-59)
    assert parse_accessor("host.ip") is None
    assert parse_accessor("host") is None
    assert accessor_root("$.from.ip") == "from"
    assert accessor_root("host.ip") == "host.ip"


def test_resolve_accessor_struct_and_list():
    batch = pa.table({
        "from": pa.array([{"ip": "1.2.3.4"}, {"ip": None}, None]),
        "tags": pa.array([["a", "b"], ["c"], []]),
        "host.ip": ["x", "y", "z"],
    })
    assert resolve_accessor(batch, "$.from.ip").to_pylist() == ["1.2.3.4", None, None]
    assert resolve_accessor(batch, '$["from"]["ip"]').to_pylist() == ["1.2.3.4", None, None]
    assert resolve_accessor(batch, "$.tags[0]").to_pylist() == ["a", "c", None]
    # literal dotted column name
    assert resolve_accessor(batch, "host.ip").to_pylist() == ["x", "y", "z"]
    # missing root / missing struct field
    assert resolve_accessor(batch, "$.nope.ip") is None
    assert resolve_accessor(batch, "$.from.nope").to_pylist() == [None, None, None]


def _enrich_nested(lookup_key, batch):
    # quote style must not collide with quotes inside the key (the reference's
    # bracket tests alternate styles, test_filter_geoip.rb:498-520)
    q = '"' if "'" in lookup_key else "'"
    record = {"geoip_city": "${city.names.en[%s%s%s]}" % (q, lookup_key, q)}
    spec = RecordSpec(lookup_keys=[lookup_key], record=record)
    stage = GeoEnrich(compile_record_spec(spec))
    return stage(batch).to_pylist()


def test_filter_nested_attr_dot_style():
    """test_filter_geoip.rb:482-497 ($.host.ip) against the dict fixture."""
    batch = pa.table({
        "host": pa.array([{"ip": "66.102.3.80"}, None],
                         type=pa.struct([("ip", pa.string())])),
        "message": ["valid ip", "missing field"],
    })
    rows = _enrich_nested("$.host.ip", batch)
    assert rows[0]["geoip_city"] == "Mountain View"
    assert rows[1]["geoip_city"] is None


def test_filter_nested_attr_bracket_styles():
    """test_filter_geoip.rb:498-520: both quote styles address the same path."""
    batch = pa.table({
        "host": pa.array([{"ip": "66.102.3.80"}, None],
                         type=pa.struct([("ip", pa.string())])),
    })
    for key in ('$["host"]["ip"]', "$['host']['ip']"):
        rows = _enrich_nested(key, batch)
        assert rows[0]["geoip_city"] == "Mountain View", key
        assert rows[1]["geoip_city"] is None, key


def test_filter_with_dot_key_literal():
    """test_filter_geoip.rb:88-99: dotted key without $ is a literal column."""
    batch = pa.table({"host.ip": ["66.102.3.80", None]})
    rows = _enrich_nested("host.ip", batch)
    assert rows[0]["geoip_city"] == "Mountain View"
    assert rows[1]["geoip_city"] is None
