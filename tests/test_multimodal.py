"""Multimodal plumbing tests: binary columns + typed metadata through
actor-pool decode/feature/frame-sample stages (decode itself is a documented
deterministic stub -- no imaging libs in this container)."""

import pyarrow as pa
import pytest
import ray.data as rd

from fluent_plugin_geoip_ray.stages.multimodal import (
    DecodeImage,
    ExtractImageFeatures,
    SampleFrames,
    decode_pipeline,
    synthesize_binary_table,
)


def test_strict_decode_raises():
    t = synthesize_binary_table(4)
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(t)


def test_decode_deterministic_fake():
    t = synthesize_binary_table(8)
    a = DecodeImage()(t)
    b = DecodeImage()(t)
    assert a.column("pixels").equals(b.column("pixels"))
    assert a.column("pix_h").to_pylist() == [8] * 8


def test_feature_extraction_shapes():
    t = DecodeImage()(synthesize_binary_table(6))
    out = ExtractImageFeatures()(t)
    feats = out.column("features").to_pylist()
    assert len(feats) == 6
    assert len(feats[0]) == 3 + 3 + 16  # means + stds + histogram
    assert all(0.0 <= v <= 1.0 for v in feats[0])


def test_frame_sampling_explodes_rows():
    t = synthesize_binary_table(3, payload_bytes=2048)
    out = SampleFrames(frame_size=256, stride=4)(t)
    # 2048/256 = 8 frames, stride 4 -> 2 per media
    assert out.num_rows == 6
    assert out.column_names == ["media_id", "frame_idx", "frame"]
    assert out.column("frame_idx").to_pylist() == [0, 4] * 3


def test_decode_pipeline_on_dataset():
    ds = rd.from_arrow(synthesize_binary_table(16))
    out = decode_pipeline(ds, batch_size=8).to_pandas()
    assert len(out) == 16
    assert "features" in out.columns
