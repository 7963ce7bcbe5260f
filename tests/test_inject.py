"""Inject-helper tests (Fluentd inject analog, filter_geoip.rb:34,47,111)."""

import pyarrow as pa

from fluent_plugin_geoip_ray.stages.parse import inject_columns


def test_inject_time_host_worker():
    batch = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("us")),
                      "x": ["a", "b"]})
    out = inject_columns(batch, time_key="event_time", hostname="node-1",
                         worker_id=3)
    assert out.column("event_time").equals(batch.column("ts"))
    assert out.column("hostname").to_pylist() == ["node-1", "node-1"]
    assert out.column("worker_id").to_pylist() == [3, 3]


def test_inject_noop():
    batch = pa.table({"x": ["a"]})
    out = inject_columns(batch)
    assert out.equals(batch)
