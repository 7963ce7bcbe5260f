"""Multimodal plumbing tests: binary columns + typed metadata through
actor-pool decode/feature/frame-sample stages (decode itself is a documented
deterministic stub -- no imaging libs in this container)."""

import numpy as np
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


def test_bmp_roundtrip():
    from fluent_plugin_geoip_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in ((8, 8), (5, 7), (33, 13)):  # odd widths exercise row padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all(), (h, w)


def test_ppm_roundtrip_and_comments():
    from fluent_plugin_geoip_ray.stages.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    commented = b"P6\n# a comment\n9 6\n255\n" + img.tobytes()
    assert (decode_ppm(commented) == img).all()


def test_wav_roundtrip_features():
    from fluent_plugin_geoip_ray.stages.multimodal import decode_wav, encode_wav

    t = np.arange(16000)
    samples = (np.sin(2 * np.pi * 440 * t / 16000) * 16000).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, rate=16000))
    assert rate == 16000 and len(out) == 16000
    assert abs(np.sqrt((out**2).mean()) - 0.3535) < 0.01  # sine RMS = A/sqrt(2)


def test_decode_real_formats():
    """BMP/PPM payloads decode for REAL (pixels match the source image after
    nearest resize), not via the hash-fake fallback."""
    from fluent_plugin_geoip_ray.stages.multimodal import (
        DecodeImage,
        encode_bmp,
        resize_nearest,
        synthesize_binary_table,
    )

    t = synthesize_binary_table(n=6, real=True)
    out = DecodeImage(out_hw=(8, 8), strict=False)(t)
    # row 0 is bmp: decode+resize must equal resize of the original image
    rng = np.random.default_rng(42)
    img0 = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert t.column("payload")[0].as_py() == encode_bmp(img0)
    got = np.asarray(out.column("pixels")[0].as_py(), dtype=np.uint8)
    assert (got == resize_nearest(img0, (8, 8)).ravel()).all()


def test_strict_decodes_real_but_raises_on_compressed():
    from fluent_plugin_geoip_ray.stages.multimodal import (
        DecodeImage,
        synthesize_binary_table,
    )

    real = synthesize_binary_table(n=3, real=True)
    imgs = real.filter(pa.compute.is_in(
        pa.compute.struct_field(real.column("media_meta"), "format"),
        value_set=pa.array(["bmp", "ppm"]),
    ))
    DecodeImage(strict=True)(imgs)  # real formats decode fine under strict
    fake = synthesize_binary_table(n=3, real=False)
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(fake)


def test_decode_audio_features():
    from fluent_plugin_geoip_ray.stages.multimodal import (
        DecodeAudio,
        synthesize_binary_table,
    )

    t = synthesize_binary_table(n=6, real=True)
    out = DecodeAudio()(t)
    fmts = [m["format"] for m in t.column("media_meta").to_pylist()]
    for i, fmt in enumerate(fmts):
        if fmt == "wav":
            assert out.column("audio_sec")[i].as_py() == pytest.approx(0.25)
            assert out.column("audio_rms")[i].as_py() > 0
        else:
            assert out.column("audio_sec")[i].as_py() is None
