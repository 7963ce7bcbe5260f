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


def test_png_roundtrip():
    """Real PNG decode (round-2 VERDICT item): encoder output (filter 0,
    zlib) decodes back bit-exact."""
    from fluent_plugin_geoip_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(37, 23, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def _png_with_filters(img, filters):
    """Assemble a PNG whose scanlines use the given filter types, applying
    the spec's FORWARD filters here (the test-side reference) so decode must
    invert them exactly."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    stride = w * bpp
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        if f == 0:
            enc = line
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            enc = (line - ((left + prev) >> 1)) % 256
        else:  # Paeth
            enc = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
                enc[x] = (line[x] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_all_filter_types():
    from fluent_plugin_geoip_ray.stages.multimodal import decode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(20, 9, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _png_with_filters(img, filters)
        assert (decode_png(data) == img).all(), f"filters {filters}"


def test_png_color_types():
    """Grayscale / RGBA / palette PNGs decode to (h, w, 3) RGB."""
    import struct
    import zlib

    from fluent_plugin_geoip_ray.stages.multimodal import decode_png

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    def build(w, h, ctype, pixel_bytes, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        raw = b"".join(
            b"\x00" + pixel_bytes[y * w * nch:(y + 1) * w * nch]
            for y in range(h)
        )
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    rng = np.random.default_rng(3)
    # grayscale -> replicated channels
    g = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    out = decode_png(build(5, 4, 0, g.tobytes()))
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
    # RGBA -> alpha dropped
    rgba = rng.integers(0, 256, size=(4, 5, 4), dtype=np.uint8)
    out = decode_png(build(5, 4, 6, rgba.tobytes()))
    assert (out == rgba[:, :, :3]).all()
    # palette
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(4, 5), dtype=np.uint8)
    import struct as _s
    import zlib as _z
    plte_chunk = (_s.pack(">I", plte.size) + b"PLTE" + plte.tobytes()
                  + _s.pack(">I", _z.crc32(b"PLTE" + plte.tobytes()) & 0xFFFFFFFF))
    out = decode_png(build(5, 4, 3, idx.tobytes(), extra=plte_chunk))
    assert (out == plte[idx]).all()


def test_png_decodes_under_strict_in_stage():
    """PNG is now a REAL codec: the strict actor stage decodes it instead of
    raising, and pixels match the source after resize."""
    from fluent_plugin_geoip_ray.stages.multimodal import (
        DecodeImage,
        resize_nearest,
        synthesize_binary_table,
    )

    t = synthesize_binary_table(n=8, real=True,
                                formats=("png", "bmp", "ppm", "wav"))
    imgs = t.filter(pa.compute.equal(
        pa.compute.struct_field(t.column("media_meta"), "format"), "png"
    ))
    out = DecodeImage(out_hw=(8, 8), strict=True)(imgs)
    # row 0 of the cycle is png with (h, w) = (32, 32) and the first rng draw
    rng = np.random.default_rng(42)
    img0 = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    got = np.asarray(out.column("pixels")[0].as_py(), dtype=np.uint8)
    assert (got == resize_nearest(img0, (8, 8)).ravel()).all()


def test_decode_image_stage_strict_progressive_jpeg():
    """Progressive (SOF2) payloads decode for REAL through the actor-pool
    stage under strict=True, pixel-identical to baseline payloads of the
    same source image."""
    import numpy as np

    from fluent_plugin_geoip_ray.stages import jpegc
    from fluent_plugin_geoip_ray.stages.multimodal import (
        DecodeImage,
        synthesize_binary_table,
    )

    t = synthesize_binary_table(n=6, real=True, formats=("jpeg_progressive",))
    out = DecodeImage(out_hw=(8, 8), strict=True)(t)
    assert out.num_rows == 6
    # cross-check one payload against direct baseline re-encode of the same
    # generator image: stage output == direct decode path
    payloads = t.column("payload").to_pylist()
    assert all(b"\xff\xc2" in p for p in payloads)  # really SOF2
    pix = np.asarray(out.column("pixels").to_pylist()[0])
    direct = jpegc.decode_jpeg(payloads[0])
    from fluent_plugin_geoip_ray.stages.multimodal import resize_nearest

    assert np.array_equal(pix.reshape(8, 8, 3), resize_nearest(direct, (8, 8)))


def test_image_phash_stability_and_separation():
    """pHash margins on photo-like content: re-encodes (different quality,
    subsampling, progressive) stay within a few bits; distinct images sit
    far apart; identical bytes hash identically."""
    import numpy as np

    from fluent_plugin_geoip_ray.stages import jpegc
    from fluent_plugin_geoip_ray.stages.multimodal import (
        image_phash,
        smooth_test_image,
    )

    def ham(a, b):
        return bin(a ^ b).count("1")

    hashes = []
    for i in range(12):
        img = smooth_test_image(i)
        h0 = image_phash(jpegc.decode_jpeg(jpegc.encode_jpeg(img, quality=90)))
        h1 = image_phash(jpegc.decode_jpeg(
            jpegc.encode_jpeg(img, quality=50, subsample=True)))
        h2 = image_phash(jpegc.decode_jpeg(
            jpegc.encode_jpeg_progressive(img, quality=75)))
        assert ham(h0, h1) <= 8
        assert ham(h0, h2) <= 4
        hashes.append(h0)
        # identical bytes -> identical hash
        assert image_phash(
            jpegc.decode_jpeg(jpegc.encode_jpeg(img, quality=90))) == h0
    for i in range(12):
        for j in range(i + 1, 12):
            assert ham(hashes[i], hashes[j]) >= 12, (i, j)


def test_dedup_images_known_answer_and_band_guarantee():
    """The driver corpus's provability conditions, asserted directly:
    every duplicate pair shares a 16-bit band (pigeonhole at hamming <= 3)
    and verifies at the threshold; survivors are exactly the originals."""
    import numpy as np
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages import jpegc
    from fluent_plugin_geoip_ray.stages.multimodal import (
        dedup_images,
        image_phash,
        synthesize_image_corpus,
    )

    t = synthesize_image_corpus(n_base=12)
    payload_by_id = dict(zip(t.column("media_id").to_pylist(),
                             t.column("payload").to_pylist()))
    for i in range(12):
        h0 = image_phash(jpegc.decode_jpeg(payload_by_id[i]))
        h1 = image_phash(jpegc.decode_jpeg(payload_by_id[10000 + i]))
        assert bin(h0 ^ h1).count("1") <= 3
        assert any(((h0 >> (16 * b)) & 0xFFFF) == ((h1 >> (16 * b)) & 0xFFFF)
                   for b in range(4))
    out = dedup_images(rd.from_arrow(t).repartition(3)).to_pandas()
    assert sorted(out["media_id"]) == list(range(12))


def test_audio_fingerprint_gain_invariance_and_separation():
    import numpy as np

    from fluent_plugin_geoip_ray.stages.multimodal import (
        audio_phash,
        decode_wav,
        encode_wav,
        synthesize_audio_clip,
    )

    def ham(a, b):
        return bin(a ^ b).count("1")

    hs = []
    for i in range(10):
        s = synthesize_audio_clip(i)
        h0 = audio_phash(decode_wav(encode_wav(s))[0])
        # exact float gain scaling: identical fingerprint
        assert audio_phash(decode_wav(encode_wav(s))[0] * 0.25) == h0
        # int16 -6 dB / -20 dB requantization: <= 2 bits of jitter
        for div in (2, 10):
            sq = (s.astype(np.int32) // div).astype(np.int16)
            assert ham(audio_phash(decode_wav(encode_wav(sq))[0]), h0) <= 2
        hs.append(h0)
    for i in range(10):
        for j in range(i + 1, 10):
            assert ham(hs[i], hs[j]) >= 12, (i, j)


def test_dedup_audio_known_answer():
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.multimodal import (
        dedup_audio,
        synthesize_audio_corpus,
    )

    t = synthesize_audio_corpus(n_base=10)
    out = dedup_audio(rd.from_arrow(t).repartition(3)).to_pandas()
    assert sorted(out["media_id"]) == list(range(10))


def test_dedup_videos_known_answer_and_margins():
    import numpy as np
    import ray.data as rd

    from fluent_plugin_geoip_ray.stages.multimodal import (
        dedup_videos,
        synthesize_video_corpus,
        video_phash_words,
    )

    t = synthesize_video_corpus(n_base=6)
    p = dict(zip(t.column("media_id").to_pylist(),
                 t.column("payload").to_pylist()))

    def tot(a, b):
        return sum(bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b))

    sigs = {i: video_phash_words(p[i]) for i in range(6)}
    for i in range(6):
        dup = video_phash_words(p[10000 + i])
        assert tot(sigs[i], dup) <= 8
        # frame0 within pigeonhole band guarantee
        assert bin(int(sigs[i][0]) ^ int(dup[0])).count("1") <= 3
    for i in range(6):
        for j in range(i + 1, 6):
            assert tot(sigs[i], sigs[j]) >= 48

    out = dedup_videos(rd.from_arrow(t).repartition(3)).to_pandas()
    assert sorted(out["media_id"]) == list(range(6))
