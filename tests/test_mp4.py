"""MP4 (ISO BMFF) container walk tests: round-trip via the fixture writer,
sample-table demux correctness, SampleFrames integration with real JPEG
payload decode."""

import numpy as np
import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.stages import jpegc, mp4c


def _jpeg_frames(n=5, w=16, h=12, seed=3):
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        frames.append(jpegc.encode_jpeg(img))
    return frames


def test_mp4_roundtrip_exact_payloads():
    frames = _jpeg_frames()
    data = mp4c.encode_mp4(frames, 16, 12)
    assert mp4c.is_mp4(data)
    assert mp4c.video_codec(data) == "jpeg"
    out = mp4c.extract_frames(data)
    assert out == frames          # byte-exact demux


def test_mp4_sample_ranges_offsets_consistent():
    frames = [b"a" * 10, b"bb" * 7, b"c" * 3]
    data = mp4c.encode_mp4(frames, 4, 4)
    ranges = mp4c.sample_ranges(data)
    assert [s for _, s in ranges] == [10, 14, 3]
    # offsets are contiguous within the single chunk
    for (o1, s1), (o2, _) in zip(ranges, ranges[1:]):
        assert o2 == o1 + s1


def test_mp4_rejects_non_mp4():
    with pytest.raises(ValueError):
        mp4c.extract_frames(b"RIFF....AVI ....")
    assert not mp4c.is_mp4(b"\x89PNG\r\n\x1a\n")


def test_sample_frames_mp4_and_decode():
    from fluent_plugin_geoip_ray.stages.multimodal import (
        DecodeImage,
        SampleFrames,
    )

    frames = _jpeg_frames(n=6)
    data = mp4c.encode_mp4(frames, 16, 12)
    batch = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([data], pa.binary()),
    })
    out = SampleFrames(stride=2, strict=True)(batch)
    assert out.num_rows == 3
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]
    assert out.column("frame").to_pylist() == frames[0::2]
    # every sampled frame decodes as a real baseline JPEG (strict=True
    # would raise on anything that is not a decodable payload)
    dec = DecodeImage(out_hw=(12, 16), strict=True)(pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": out.column("frame"),
    }))
    assert dec.num_rows == 3
    pix = np.asarray(dec.column("pixels").to_pylist(), dtype=np.uint8)
    want = np.stack([jpegc.decode_jpeg(f).ravel() for f in frames[0::2]])
    assert np.array_equal(pix, want)
