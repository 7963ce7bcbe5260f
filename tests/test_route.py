"""Tag-pattern matching + remap tests (Fluentd public tag grammar,
README.md:248-266; routing mandated by BASELINE.json north_star)."""

import re

import pyarrow as pa

from fluent_plugin_geoip_ray.stages.route import RouteSpec, tag_pattern_to_regex


def matches(pattern, tag):
    return re.match(tag_pattern_to_regex(pattern), tag) is not None


def test_double_star_matches_zero_or_more_parts():
    assert matches("a.**", "a")
    assert matches("a.**", "a.b")
    assert matches("a.**", "a.b.c")
    assert not matches("a.**", "ab")
    assert not matches("a.**", "b.a")


def test_single_star_matches_one_part():
    assert matches("a.*", "a.b")
    assert not matches("a.*", "a.b.c")
    assert not matches("a.*", "a")


def test_exact_match():
    assert matches("a.b", "a.b")
    assert not matches("a.b", "a.bc")


def test_bare_double_star():
    assert matches("**", "anything.at.all")


def _batch(tags, enriched=None):
    cols = {"tag": tags, "conv_id": ["c"] * len(tags),
            "turn_idx": list(range(len(tags))),
            "ts": [0] * len(tags)}
    if enriched is not None:
        cols["geoip_enriched"] = enriched
    return pa.table(cols)


def test_route_filter_and_remap():
    r = RouteSpec(name="r", match="transcripts.**",
                  remove_tag_prefix="transcripts.", add_tag_prefix="enriched.")
    out = r.apply(_batch(["transcripts.user", "other.user", "transcripts.tool"]))
    assert out.column("tag").to_pylist() == ["enriched.user", "enriched.tool"]


def test_route_suffix_ops():
    r = RouteSpec(name="r", match="**", add_tag_suffix=".raw")
    out = r.apply(_batch(["a.b"]))
    assert out.column("tag").to_pylist() == ["a.b.raw"]
    r2 = RouteSpec(name="r", match="**", remove_tag_suffix=".raw")
    out2 = r2.apply(_batch(["a.b.raw"]))
    assert out2.column("tag").to_pylist() == ["a.b"]


def test_route_skip_gate_filters_unenriched():
    r = RouteSpec(name="r", match="**", skip_adding_null_record=True)
    out = r.apply(_batch(["a", "a", "a"], enriched=[True, False, None]))
    assert out.num_rows == 1
