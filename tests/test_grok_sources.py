"""Grok mini-engine + JSON-lines/CSV source tests."""

import json

import pyarrow as pa
import pytest
import ray.data as rd

from fluent_plugin_geoip_ray.functions.grok import (
    GrokError,
    GrokParse,
    compile_grok,
    grok_dataset,
    register_pattern,
)
from fluent_plugin_geoip_ray.sources.logs import (
    read_csv_transcripts,
    read_jsonl_transcripts,
)


def test_compile_grok_fields_and_types():
    pattern, fields = compile_grok(
        "%{IPV4:client} %{WORD:method} %{PATH:path} %{INT:status} %{NUMBER:dur}"
    )
    assert [f for f, _ in fields] == ["client", "method", "path", "status", "dur"]
    assert str(fields[3][1]) == "int64"
    assert str(fields[4][1]) == "double"


def test_unknown_pattern_raises():
    with pytest.raises(GrokError, match="unknown grok pattern"):
        compile_grok("%{NOPE:x}")


def test_duplicate_field_raises():
    with pytest.raises(GrokError, match="duplicate"):
        compile_grok("%{WORD:x} %{WORD:x}")


def test_grok_parse_batch():
    batch = pa.table({
        "text": [
            "10.0.0.1 GET /index.html 200 0.123",
            "192.168.1.9 POST /api/v1 500 1.5",
            "not a log line",
        ]
    })
    out = GrokParse("%{IPV4:client} %{WORD:method} %{PATH:path} %{INT:status} %{NUMBER:dur}")(batch)
    rows = out.to_pylist()
    assert rows[0]["client"] == "10.0.0.1" and rows[0]["status"] == 200
    assert rows[1]["method"] == "POST" and rows[1]["dur"] == 1.5
    assert rows[2]["client"] is None and rows[2]["status"] is None


def test_grok_unnamed_and_custom_pattern():
    register_pattern("CONVID", r"conv\d{8}")
    batch = pa.table({"text": ["turn conv00000042 by user", "x"]})
    out = GrokParse("turn %{CONVID:conv} by %{WORD}")(batch).to_pylist()
    assert out[0]["conv"] == "conv00000042"
    assert out[1]["conv"] is None


def test_grok_dataset_over_transcripts():
    from fluent_plugin_geoip_ray.sources.transcripts import ensure_transcripts

    ds = rd.read_parquet(ensure_transcripts(0.001))
    out = grok_dataset(ds, "%{DATA} src=%{IPV4:src_ip} %{GREEDYDATA}").to_pandas()
    assert out["src_ip"].notna().sum() > 0
    # grok extraction agrees with the parse stage's first-IP... for rows
    # where the text actually has the src= marker
    assert set(out["src_ip"].dropna()) <= {
        "66.102.3.80", "66.102.9.80", "8.8.8.8", "125.54.15.42",
        "180.94.85.84", "203.0.113.1", "10.0.0.1", "192.168.1.1",
        "999.999.999.999",
    }


def test_jsonl_source_roundtrip(tmp_path):
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hello from 66.102.3.80", "tool": "", "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "ack", "tool": "", "ts": "2026-01-01T00:00:01"},
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl_transcripts(str(p))
    # Ray Data does not guarantee block order without preserve_order --
    # consumers sort explicitly (the engine's ordering contract)
    out = ds.to_pandas().sort_values("turn_idx").reset_index(drop=True)
    assert list(out.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert out["turn_idx"].dtype == "int32"
    assert str(out["ts"].iloc[0]) == "2026-01-01 00:00:00"

    # and it flows through the full enrich pipeline
    from fluent_plugin_geoip_ray.pipelines.flagship import build_enriched

    enriched = (
        build_enriched(read_jsonl_transcripts(str(p)))
        .to_pandas().sort_values("turn_idx").reset_index(drop=True)
    )
    assert enriched.loc[0, "city"] == "Mountain View"


def test_csv_source(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        'c9,0,user,ping 8.8.8.8,,2026-02-01T10:00:00\n'
    )
    out = read_csv_transcripts(str(p)).to_pandas()
    assert out.loc[0, "conv_id"] == "c9"
    assert out["turn_idx"].dtype == "int32"


def test_jsonl_gzip_source_reads_transparently(tmp_path):
    """Arrow auto-detects .gz compression -- pin the capability (log
    shippers emit gzipped JSONL)."""
    import gzip
    import json

    from fluent_plugin_geoip_ray.sources.logs import read_jsonl_transcripts

    p = tmp_path / "t.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(7):
            f.write(json.dumps({
                "conv_id": str(i), "turn_idx": i, "role": "user",
                "text": f"msg {i}", "tool": None,
                "ts": "2026-01-01T00:00:00"}) + "\n")
    ds = read_jsonl_transcripts([str(p)])
    out = ds.to_pandas()
    assert len(out) == 7
    assert str(out["turn_idx"].dtype) == "int32"
