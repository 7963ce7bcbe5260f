"""Config-time validation tests, mirroring the reference's config matrix
(test/plugin/test_filter_geoip.rb:42-166)."""

import pytest

from fluent_plugin_geoip_ray.config import (
    ConfigError,
    JsonTemplatePlan,
    PassthroughPlan,
    RecordSpec,
    StringTemplatePlan,
    compile_record_spec,
)


def compile_one(template, **kw):
    spec = RecordSpec(lookup_keys=["ip"], record={"out": template}, **kw)
    return compile_record_spec(spec)


def test_empty_config_ok():
    c = compile_record_spec(RecordSpec())
    assert c.plans == {} and c.placeholders == []


def test_single_placeholder_is_passthrough():
    c = compile_one("${city.names.en['ip']}")
    assert isinstance(c.plans["out"], PassthroughPlan)
    ph = c.placeholders[0]
    assert ph.geoip_path == ("city", "names", "en")
    assert ph.record_key == "ip"


def test_double_quoted_record_key():
    c = compile_one('${city.names.en["ip"]}')
    assert c.placeholders[0].record_key == "ip"


def test_quoted_template_is_stripped_then_classified():
    # test_filter_geoip.rb:364-400: '[${lon},${lat}]' is a JSON array template
    c = compile_one("'[${location.longitude['ip']}, ${location.latitude['ip']}]'")
    assert isinstance(c.plans["out"], JsonTemplatePlan)


def test_non_json_text_with_placeholders_is_string_template():
    c = compile_one('[GEOIP] message => {"lat":${location.latitude[\'ip\']}}')
    assert isinstance(c.plans["out"], StringTemplatePlan)


def test_invalid_json_template_raises():
    # test_filter_geoip.rb:66-96: ruby-hash-like / unquoted literals rejected
    with pytest.raises(ConfigError):
        compile_one('{"foo" => 123}')
    with pytest.raises(ConfigError):
        compile_one('{"foo" : string}')


def test_valid_json_with_placeholder_ok():
    c = compile_one('{"lat" : ${location.latitude[\'ip\']}}')
    assert isinstance(c.plans["out"], JsonTemplatePlan)


def test_malformed_placeholder_raises():
    # test_filter_geoip.rb:118-129: ${city.names.en["host]} is invalid
    with pytest.raises(ConfigError, match="Invalid placeholder"):
        compile_one('${city.names.en["ip]}')


def test_unsupported_backend_raises():
    with pytest.raises(ConfigError):
        compile_one("${city.names.en['ip']}", backend_library="nope")


def test_legacy_backend_key_restriction():
    # filter_geoip.rb:91-100 + GEOIP_KEYS (9 keys)
    with pytest.raises(ConfigError, match="unsupported key"):
        compile_one("${city.names.en['ip']}", backend_library="geoip")
    c = compile_one("${city['ip']}", backend_library="geoip")
    assert c.placeholders[0].geoip_path == ("city",)


def test_compat_backend_key_restriction():
    with pytest.raises(ConfigError, match="unsupported key"):
        compile_one("${dma_code['ip']}", backend_library="geoip2_compat")
    compile_one("${postal_code['ip']}", backend_library="geoip2_compat")


def test_geoip2_c_unrestricted():
    compile_one("${anything.at.all['ip']}", backend_library="geoip2_c")


def test_placeholder_order_and_uniqueness():
    spec = RecordSpec(
        lookup_keys=["ip"],
        record={
            "a": "${city.names.en['ip']}",
            "b": "${city.names.en['ip']},${country.iso_code['ip']}",
        },
    )
    c = compile_record_spec(spec)
    assert [p.key for p in c.placeholders] == [
        "${city.names.en['ip']}",
        "${country.iso_code['ip']}",
    ]


def test_numeric_path_segment():
    c = compile_one("${subdivisions.0.iso_code['ip']}")
    assert c.placeholders[0].geoip_path == ("subdivisions", 0, "iso_code")


def test_latlon_dtype_default():
    c = compile_one("${location.latitude['ip']}")
    assert c.placeholders[0].dtype == "float64"
    assert c.placeholders[0].is_latlon


def test_multiline_json_template():
    # test_filter_geoip.rb:426-454: a JSON template spanning multiple lines
    template = """{
      "lat": ${location.latitude['ip']},
      "lon": ${location.longitude['ip']}
    }"""
    c = compile_one(template)
    assert isinstance(c.plans["out"], JsonTemplatePlan)


def test_multiline_json_roundtrip_values():
    import pyarrow as pa

    from fluent_plugin_geoip_ray.stages.enrich import GeoEnrich

    template = '{\n  "lat": ${location.latitude[\'ip\']},\n  "lon": ${location.longitude[\'ip\']}\n}'
    spec = RecordSpec(lookup_keys=["ip"], record={"geo": template})
    out = GeoEnrich(compile_record_spec(spec))(pa.table({"ip": ["66.102.3.80"]}))
    assert out.to_pylist()[0]["geo"] == {"lat": 37.419200000000004, "lon": -122.0574}
