"""MJPEG-in-AVI frame sampling tests: real container walk + real JPEG frames
end-to-end through SampleFrames -> DecodeImage."""

import numpy as np
import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.stages import avic
from fluent_plugin_geoip_ray.stages.jpegc import decode_jpeg, encode_jpeg
from fluent_plugin_geoip_ray.stages.multimodal import (
    DecodeImage,
    SampleFrames,
)


def _mjpeg_avi(n_frames=8, h=24, w=32, seed=0):
    frames = []
    for f in range(n_frames):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(yy * 3 + f * 17) % 256, (xx * 5 + f) % 256,
                        ((yy + xx) * 2) % 256], -1).astype(np.uint8)
        frames.append(encode_jpeg(img, quality=92))
    return avic.encode_avi(frames, w, h), frames


def test_avi_roundtrip_frames():
    data, frames = _mjpeg_avi(8)
    assert avic.is_avi(data)
    out = avic.extract_frames(data)
    assert out == frames  # container walk is byte-exact
    assert avic.avi_dimensions(data) == (32, 24)


def test_avi_odd_sized_frame_padding():
    # a JPEG of odd byte length forces the RIFF word-alignment pad path
    data, frames = _mjpeg_avi(3, h=9, w=13)
    sizes = [len(f) for f in frames]
    assert any(s & 1 for s in sizes), "fixture should contain an odd chunk"
    assert avic.extract_frames(data) == frames


def test_sample_frames_real_avi():
    data, frames = _mjpeg_avi(10)
    t = pa.table({"media_id": pa.array([7], pa.int64()),
                  "payload": pa.array([data], pa.binary())})
    out = SampleFrames(stride=3, strict=True)(t)
    assert out.column("frame_idx").to_pylist() == [0, 3, 6, 9]
    assert out.column("media_id").to_pylist() == [7] * 4
    got = out.column("frame").to_pylist()
    assert got == [frames[0], frames[3], frames[6], frames[9]]
    # sampled frames are REAL baseline JPEGs: decode one and check shape
    assert decode_jpeg(got[1]).shape == (24, 32, 3)


def test_sample_frames_then_decode_stage():
    """Full multimodal chain: AVI -> frame rows -> pixel tensors."""
    data, _ = _mjpeg_avi(6)
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([data], pa.binary())})
    frames = SampleFrames(stride=2, strict=True)(t)
    frames = frames.rename_columns(["media_id", "frame_idx", "payload"])
    decoded = DecodeImage(out_hw=(8, 8), strict=True)(frames)
    assert decoded.num_rows == 3
    assert decoded.column("pixels").type == pa.list_(pa.uint8(), 192)


def test_sample_frames_strict_rejects_non_avi():
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([b"\x00" * 1024], pa.binary())})
    with pytest.raises(NotImplementedError):
        SampleFrames(strict=True)(t)
    # non-strict keeps the documented chunking stand-in
    out = SampleFrames(frame_size=256, stride=2)(t)
    assert out.num_rows == 2


def test_extract_frames_rejects_garbage():
    with pytest.raises(ValueError):
        avic.extract_frames(b"not an avi at all")
