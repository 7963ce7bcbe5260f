"""Baseline JPEG codec tests (stages/jpegc.py): spec math pinned, encoder
round trips across sampling/restart variants, real-libjpeg cross-validation
when CPython's test images are present, and strict-mode decode through the
actor-pool stage."""

import os

import numpy as np
import pyarrow as pa
import pytest

from fluent_plugin_geoip_ray.stages import jpegc
from fluent_plugin_geoip_ray.stages.jpegc import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    ZIGZAG,
    _canonical_codes,
    _dct_matrix,
    decode_jpeg,
    encode_jpeg,
)
from fluent_plugin_geoip_ray.stages.multimodal import (
    DecodeImage,
    decode_png,
    synthesize_binary_table,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], -1
    ).astype(np.uint8)


def test_dct_matrix_orthonormal():
    a = _dct_matrix()
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)
    # forward then inverse is identity on an arbitrary block
    rng = np.random.default_rng(7)
    f = rng.standard_normal((8, 8))
    assert np.allclose(a.T @ (a @ f @ a.T) @ a, f, atol=1e-10)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first few entries of the T.81 scan
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_canonical_codes_prefix_free():
    codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    assert len(codes) == 162
    as_bits = {format(c, f"0{l}b") for c, l in codes.values()}
    assert len(as_bits) == 162
    for b1 in as_bits:
        for b2 in as_bits:
            if b1 is not b2 and len(b1) < len(b2):
                assert not b2.startswith(b1)


@pytest.mark.parametrize("subsample,restart", [(False, 0), (True, 0),
                                               (False, 3), (True, 2)])
def test_roundtrip_gradient(subsample, restart):
    img = _gradient(40, 56)
    data = encode_jpeg(img, quality=95, subsample=subsample,
                       restart_interval=restart)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = decode_jpeg(data)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth gradients survive q95 almost exactly; 4:2:0 averages chroma
    assert err.max() <= (8 if subsample else 3)


def test_roundtrip_odd_dimensions():
    # sizes not multiples of 8 (nor of 16 for 4:2:0) exercise MCU padding+crop
    for h, w, sub in [(9, 13, False), (17, 23, True), (8, 8, True)]:
        img = _gradient(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert dec.shape == (h, w, 3)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 12


def test_roundtrip_grayscale():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((yy * 5 + xx * 2) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (24, 40, 3)
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 6
    # grayscale replicates into all three channels
    assert np.array_equal(dec[..., 0], dec[..., 1])


def test_roundtrip_noise_rmse():
    # worst case for a DCT codec; bound RMSE rather than max error
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    rmse = np.sqrt(((dec.astype(float) - img.astype(float)) ** 2).mean())
    assert rmse < 12.0


def test_quality_monotone():
    img = _gradient(48, 48)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]
    err_lo = np.abs(decode_jpeg(encode_jpeg(img, quality=30)).astype(int)
                    - img.astype(int)).mean()
    err_hi = np.abs(decode_jpeg(encode_jpeg(img, quality=95)).astype(int)
                    - img.astype(int)).mean()
    assert err_hi < err_lo


@pytest.mark.parametrize("shape,sub,kw", [
    ((32, 32, 3), False, {}),                              # default script
    ((33, 21, 3), False, {}),                              # odd dims
    ((40, 24, 3), True, {}),                               # 4:2:0
    ((16, 16), False, {}),                                 # grayscale
    ((24, 24, 3), False, dict(dc_al=2, ac_al=2)),          # 3-level approx
    ((24, 24, 3), False, dict(bands=((1, 63),))),          # single AC band
    ((24, 24, 3), False, dict(bands=((1, 2), (3, 9), (10, 63)))),
    ((37, 19, 3), True, dict(dc_al=0, ac_al=0)),           # spectral-only
])
def test_progressive_equals_baseline_bit_for_bit(shape, sub, kw):
    """The progressive encoder reuses the baseline encoder's EXACT
    quantized coefficients, so SOF2 decode (DC/AC first + refinement
    scans, EOB runs, successive approximation) must reproduce the
    baseline decode bit-for-bit -- any coefficient mis-reconstruction
    shows up as a pixel diff."""
    from fluent_plugin_geoip_ray.stages.jpegc import encode_jpeg_progressive

    rng = np.random.default_rng(int(np.prod(shape)) % 97)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_jpeg_progressive(img, quality=80, subsample=sub, **kw)
    # really progressive: SOF2 marker present, several SOS scans
    assert b"\xff\xc2" in data and data.count(b"\xff\xda") >= 3
    base = decode_jpeg(encode_jpeg(img, quality=80, subsample=sub))
    assert np.array_equal(decode_jpeg(data), base)


def test_progressive_smooth_image_eob_runs():
    """A smooth gradient maximizes EOB-run and zero-run paths in the AC
    first/refinement scans."""
    from fluent_plugin_geoip_ray.stages.jpegc import encode_jpeg_progressive

    img = _gradient(48, 40)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert np.array_equal(base, prog)


def test_hierarchical_sof_still_raises():
    data = bytearray(encode_jpeg(_gradient(16, 16)))
    i = bytes(data).find(b"\xff\xc0")
    # SOF5 (differential sequential, hierarchical) and SOF11
    # (arithmetic lossless): the remaining honest gaps.
    for marker in (0xC5, 0xCB):
        data[i + 1] = marker
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))


GOLDEN_JPEG = os.path.join(os.path.dirname(__file__), "golden", "jpeg")


@pytest.mark.parametrize("variant, twin", [
    ("libjpeg_q85_arith.jpg", "libjpeg_q85_baseline.jpg"),
    ("libjpeg_q85_prog.jpg", "libjpeg_q85_baseline.jpg"),
    ("libjpeg_q85_progarith.jpg", "libjpeg_q85_baseline.jpg"),
    ("libjpeg_q85_420_progarith.jpg", "libjpeg_q85_420_baseline.jpg"),
])
def test_committed_libjpeg_fixtures_decode_identically(variant, twin):
    """Pinned REAL-libjpeg fixtures (committed, so no gcc needed): each
    entropy-coding variant of the same image must decode bit-identically
    to its baseline twin -- the coefficients are identical, so any
    difference is an entropy-decode bug."""
    with open(os.path.join(GOLDEN_JPEG, variant), "rb") as f:
        a = decode_jpeg(f.read())
    with open(os.path.join(GOLDEN_JPEG, twin), "rb") as f:
        b = decode_jpeg(f.read())
    assert np.array_equal(a, b)
    assert a.shape == (40, 52, 3)


# --------------------------------------------------------------------------
# arithmetic entropy coding (SOF9) and 12-bit precision
# --------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    {}, {"subsample": True}, {"restart_interval": 3},
    {"subsample": True, "restart_interval": 2},
])
def test_arith_roundtrip_matches_baseline(kw):
    """Arithmetic and Huffman encodes share quantized coefficients
    (`_prep_encode`), so the decodes must be BIT-identical -- isolates
    the entropy layer from every other stage."""
    from fluent_plugin_geoip_ray.stages.jpegc import encode_jpeg_arith

    img = _gradient(40, 52)
    base = decode_jpeg(encode_jpeg(img, quality=85, **kw))
    ar = decode_jpeg(encode_jpeg_arith(img, quality=85, **kw))
    assert np.array_equal(base, ar)


def test_arith_grayscale_and_compresses_better():
    from fluent_plugin_geoip_ray.stages.jpegc import encode_jpeg_arith

    g = _gradient(48, 48)[..., 0]
    jh, ja = encode_jpeg(g, quality=90), encode_jpeg_arith(g, quality=90)
    assert np.array_equal(decode_jpeg(jh), decode_jpeg(ja))
    # the adaptive coder must actually adapt: smaller than Huffman
    assert len(ja) < len(jh)


def test_arith_tab_is_canonical():
    """Pin Table D.3 against the packed `jpeg_aritab` inside this host's
    real libjpeg binary (skip when absent)."""
    import glob
    import struct as _s

    from fluent_plugin_geoip_ray.stages.jpegc import ARITH_TAB

    libs = glob.glob("/usr/lib/*/libjpeg.so.62*") + \
        glob.glob("/usr/lib/libjpeg.so.62*")
    if not libs:
        pytest.skip("no system libjpeg to cross-check against")
    blob = open(libs[0], "rb").read()
    first = _s.pack("<q", (0x5A1D << 16) | (1 << 8) | (1 << 7) | 1)
    i = blob.find(first)
    assert i >= 0, "jpeg_aritab not found in libjpeg binary"
    vals = _s.unpack_from("<114q", blob, i)
    ref = [((v >> 16) & 0xFFFF, v & 0x7F, (v >> 8) & 0x7F, (v >> 7) & 1)
           for v in vals]
    assert [tuple(t) for t in ARITH_TAB] == ref


def test_12bit_roundtrip():
    img8 = _gradient(32, 40)
    img12 = img8.astype(np.uint16) * 16
    data = encode_jpeg(img12, quality=97, precision=12)
    # 12-bit markers on the wire: SOF1, 16-bit DQT
    assert b"\xff\xc1" in data and data[data.find(b"\xff\xc1") + 4] == 12
    out = decode_jpeg(data)
    assert out.dtype == np.uint8 and out.shape == img8.shape
    rmse = np.sqrt(((out.astype(float) - img8.astype(float)) ** 2).mean())
    assert rmse < 1.5


def test_12bit_dc_only_exact():
    """A uniform 12-bit image survives the full path exactly (DC only)."""
    img12 = np.full((16, 16, 3), 2000, np.uint16)
    out = decode_jpeg(encode_jpeg(img12, quality=95, precision=12))
    expect = int(round(2000 * 255 / 4095))
    assert np.all(np.abs(out.astype(int) - expect) <= 1)


def test_12bit_progressive_rejected():
    img12 = np.full((16, 16, 3), 100, np.uint16)
    data = bytearray(encode_jpeg(img12, quality=90, precision=12))
    i = bytes(data).find(b"\xff\xc1")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="12-bit progressive"):
        decode_jpeg(bytes(data))


# --------------------------------------------------------------------------
# cross-validation against the REAL system libjpeg (compiled shim);
# skips when gcc / jpeglib.h are unavailable
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def libjpeg():
    import ctypes
    import shutil
    import subprocess

    src = os.path.join(os.path.dirname(__file__), "shim", "jshim.c")
    so = "/tmp/graft_jshim.so"
    if not (shutil.which("gcc") and os.path.isfile("/usr/include/jpeglib.h")
            and os.path.isfile(src)):
        pytest.skip("gcc/jpeglib.h not available for the libjpeg shim")
    if not os.path.isfile(so):
        r = subprocess.run(["gcc", "-O2", "-shared", "-fPIC", src,
                            "-o", so, "-ljpeg"], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"shim compile failed: {r.stderr[:200]}")
    lib = ctypes.CDLL(so)
    lib.jshim_encode.restype = ctypes.c_long
    lib.jshim_decode.restype = ctypes.c_long

    def enc(img, quality=85, mode=0, subsample=0):
        h, w = img.shape[:2]
        out = ctypes.create_string_buffer(w * h * 10 + 65536)
        n = lib.jshim_encode(img.tobytes(), w, h, quality, mode,
                             subsample, out, len(out))
        assert n > 0
        return out.raw[:n]

    def dec(data):
        cap = 1024 * 1024 * 3
        out = ctypes.create_string_buffer(cap)
        r = lib.jshim_decode(data, len(data), out, cap)
        assert r > 0
        w, h = r >> 20, r & 0xFFFFF
        return np.frombuffer(out.raw[:w * h * 3], np.uint8).reshape(h, w, 3)

    return enc, dec


@pytest.mark.parametrize("subsample", [0, 1])
def test_libjpeg_arith_decodes_identically(libjpeg, subsample):
    """libjpeg encodes the SAME image as Huffman and as arithmetic
    (identical quantized coefficients); our decoder's outputs must be
    BIT-identical -- a real-implementation referee for the whole
    arithmetic decode path, independent of IDCT rounding."""
    enc, _ = libjpeg
    img = _gradient(40, 52)
    ours_h = decode_jpeg(enc(img, mode=0, subsample=subsample))
    ours_a = decode_jpeg(enc(img, mode=1, subsample=subsample))
    assert np.array_equal(ours_h, ours_a)


def test_libjpeg_accepts_our_arith_encoding(libjpeg):
    """The converse: real libjpeg decodes OUR arithmetic encode exactly
    as it decodes our Huffman encode of the same image."""
    from fluent_plugin_geoip_ray.stages.jpegc import encode_jpeg_arith

    _, dec = libjpeg
    img = _gradient(40, 52)
    lj_h = dec(encode_jpeg(img, quality=85))
    lj_a = dec(encode_jpeg_arith(img, quality=85))
    assert np.array_equal(lj_h, lj_a)


def test_libjpeg_progressive_decodes_identically(libjpeg):
    """Same referee for the progressive-Huffman decoder: a real libjpeg
    progressive file (10-scan script, EOBn runs, successive
    approximation) must decode bit-identically to its baseline twin."""
    enc, _ = libjpeg
    img = _gradient(40, 52)
    assert np.array_equal(decode_jpeg(enc(img, mode=0)),
                          decode_jpeg(enc(img, mode=2)))


@pytest.mark.parametrize("subsample", [0, 1])
def test_libjpeg_progressive_arith_decodes_identically(libjpeg, subsample):
    """SOF10 (progressive + arithmetic, the rarest DCT mode): fresh
    libjpeg files across quality/subsampling decode bit-identically to
    their baseline twins."""
    enc, _ = libjpeg
    img = _gradient(37, 45)  # odd dims: partial MCUs on both axes
    for q in (30, 85):
        a = decode_jpeg(enc(img, quality=q, mode=0, subsample=subsample))
        b = decode_jpeg(enc(img, quality=q, mode=3, subsample=subsample))
        assert np.array_equal(a, b)


def test_libjpeg_idct_tolerance(libjpeg):
    """Our float64 IDCT vs libjpeg's integer islow: bounded pixel drift
    (sanity that files really decode the same image)."""
    enc, dec = libjpeg
    img = _gradient(40, 52)
    data = enc(img, mode=1)
    diff = np.abs(decode_jpeg(data).astype(int) - dec(data).astype(int))
    assert diff.max() <= 3


def test_decode_image_stage_strict_arith_jpeg():
    """The strict multimodal path decodes an arithmetic-coded payload for
    real (the round-4 honest gap, now closed)."""
    from fluent_plugin_geoip_ray.stages.jpegc import encode_jpeg_arith
    from fluent_plugin_geoip_ray.stages.multimodal import resize_nearest

    img = _gradient(24, 24)
    payload = encode_jpeg_arith(img, quality=90)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "media_meta": pa.array([{"format": "jpeg", "width": 24,
                                 "height": 24}]),
    })
    out = DecodeImage(out_hw=(8, 8), strict=True)(t)
    ref = resize_nearest(decode_jpeg(payload), (8, 8)).ravel()
    got = np.asarray(out.column("pixels")[0].as_py(), dtype=np.uint8)
    assert np.array_equal(got, ref)


def test_truncated_raises_value_error():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x11garbage")


CPY_IMG = ("/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
           "python3.11/test/imghdrdata")


@pytest.mark.skipif(not os.path.isdir(CPY_IMG),
                    reason="CPython test images not on this host")
def test_decodes_real_libjpeg_output():
    """Cross-validate against a REAL libjpeg-produced file: CPython ships the
    same image as python.png and python.jpg; our independent PNG and JPEG
    decoders must agree up to JPEG compression artifacts."""
    with open(os.path.join(CPY_IMG, "python.jpg"), "rb") as f:
        jpg = decode_jpeg(f.read())
    with open(os.path.join(CPY_IMG, "python.png"), "rb") as f:
        png = decode_png(f.read())[..., :3]
    assert jpg.shape == png.shape == (16, 16, 3)
    rmse = np.sqrt(((jpg.astype(float) - png.astype(float)) ** 2).mean())
    assert rmse < 25.0  # sharp-edged logo; JPEG artifacts live at the edges


NODE_DOC = "/usr/share/doc/nodejs"
_PROG_FIXTURES = [
    # (file, shape, pinned sha256[:16] of the decoded RGB tensor)
    ("thin-white-stripe.jpg", (58, 493, 3), "73ce8c019a427028"),
    ("full-white-stripe.jpg", (312, 493, 3), "330fe1cd3ed781f8"),
]


@pytest.mark.skipif(
    not all(os.path.isfile(os.path.join(NODE_DOC, f))
            for f, _, _ in _PROG_FIXTURES),
    reason="nodejs doc progressive JPEGs not on this host")
def test_decodes_real_libjpeg_progressive():
    """Cross-validate the SOF2 decoder against REAL libjpeg-produced
    progressive files (not our own encoder's output): node's doc images use
    a 7-scan script with per-scan optimized (non-Annex-K) Huffman tables and
    EOBn>1 runs -- none of which our bundled progressive encoder emits.

    Ground truth without an independent decoder on this host: the images'
    content is known from their names/provenance (a dark header stripe over
    a near-pure-white page body), every pure-white 8x8 block must come out
    exactly (255,255,255) (any AC-refinement misdecode perturbs them), and
    the full tensors are hash-pinned against regression."""
    import hashlib

    for fname, shape, pin in _PROG_FIXTURES:
        with open(os.path.join(NODE_DOC, fname), "rb") as f:
            data = f.read()
        # the fixture really is progressive with custom tables: SOF2 frame,
        # >1 scan, DHT segments interleaved between scans (libjpeg's
        # per-scan optimized tables), not the 2-segment Annex-K layout
        markers = []
        i = 2
        while i < len(data) - 1:
            if data[i] == 0xFF and data[i + 1] not in (0x00, 0xFF):
                markers.append(data[i + 1])
            i += 1
        assert 0xC2 in markers                 # SOF2: progressive DCT
        assert markers.count(0xDA) >= 5        # multi-scan script
        assert markers.count(0xC4) >= 5        # per-scan optimized DHTs

        # EOBn>1 branches must actually run on this file
        seen = {"max_eob": 0}
        real_ac_first, real_ac_refine = jpegc._ac_first, jpegc._ac_refine

        def spy_first(br, row, ss, se, al, eobrun, act):
            out = real_ac_first(br, row, ss, se, al, eobrun, act)
            seen["max_eob"] = max(seen["max_eob"], out)
            return out

        def spy_refine(br, row, ss, se, al, eobrun, act):
            out = real_ac_refine(br, row, ss, se, al, eobrun, act)
            seen["max_eob"] = max(seen["max_eob"], out)
            return out

        jpegc._ac_first, jpegc._ac_refine = spy_first, spy_refine
        try:
            img = decode_jpeg(data)
        finally:
            jpegc._ac_first, jpegc._ac_refine = real_ac_first, real_ac_refine
        assert seen["max_eob"] > 1  # real EOBn runs, unlike our encoder

        assert img.shape == shape and img.dtype == np.uint8
        # known content: dark header band up top ...
        assert 80 < img[:4].mean() < 100
        # ... over a mostly pure-white page (>70% exact 255,255,255 --
        # a refinement-pass bug would shift these off-white)
        assert (img == 255).all(axis=2).mean() > 0.7
        assert (img[-4:] == 255).mean() > 0.95
        assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == pin


def test_decode_image_stage_strict_jpeg():
    t = synthesize_binary_table(n=6, real=True, formats=("jpeg",))
    out = DecodeImage(out_hw=(8, 8), strict=True)(t)
    assert out.column("pixels").type == pa.list_(pa.uint8(), 192)
    # decode is deterministic
    out2 = DecodeImage(out_hw=(8, 8), strict=True)(t)
    assert out.column("pixels").equals(out2.column("pixels"))
    # and actually tracks the encoded gradient (not a hash-seeded fake):
    # re-decode payload 0 directly and compare the resized tensor
    from fluent_plugin_geoip_ray.stages.multimodal import resize_nearest
    raw = t.column("payload")[0].as_py()
    ref = resize_nearest(decode_jpeg(raw), (8, 8)).ravel()
    got = np.asarray(out.column("pixels")[0].as_py(), dtype=np.uint8)
    assert np.array_equal(got, ref)


def test_restart_interval_markers_present():
    data = encode_jpeg(_gradient(40, 40), restart_interval=2)
    assert b"\xff\xdd" in data  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


# ---------------------------------------------------------------------------
# Lossless (SOF3, Annex H)
# ---------------------------------------------------------------------------

from fluent_plugin_geoip_ray.stages.jpegc import (  # noqa: E402
    decode_jpeg_lossless_samples,
    encode_jpeg_lossless,
)


def test_lossless_hand_constructed_bitstream():
    """Decoder pin independent of the bundled encoder: a 2x3 grayscale
    lossless file whose entropy bytes were derived by hand from the
    T.81 Annex H rules (predictor 1, P=8, Pt=0, default prediction
    128; diffs -28,+1,-2,+3,0,+4 coded as SSSS categories with a
    seven-symbol 3-bit DHT built in this test)."""
    data = bytes(
        [0xFF, 0xD8,                                     # SOI
         0xFF, 0xC3, 0x00, 0x0B, 0x08,                   # SOF3, P=8
         0x00, 0x02, 0x00, 0x03, 0x01,                   # 2x3, 1 comp
         0x01, 0x11, 0x00,                               # id=1, 1x1
         0xFF, 0xC4, 0x00, 0x1A, 0x00,                   # DHT class0/id0
         0, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,  # seven 3-bit
         0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06,       # SSSS 0..6
         0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00,       # SOS, comp 1
         0x01, 0x00, 0x00,                               # Ss=1,Se=0,AhAl=0
         0xA3, 0x34, 0xAC, 0x39,                         # hand-coded ECS
         0xFF, 0xD9])                                    # EOI
    out = decode_jpeg_lossless_samples(data)
    assert np.array_equal(
        out[:, :, 0], np.array([[100, 101, 99], [103, 103, 107]]))


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("restart", [0, 37])
def test_lossless_roundtrip_exact(predictor, restart):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 31), dtype=np.uint8)
    enc = encode_jpeg_lossless(img, predictor=predictor,
                               restart_interval=restart)
    out = decode_jpeg_lossless_samples(enc)
    assert out.shape == (33, 31, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_lossless_16bit_and_ssss16():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 65536, (17, 13), dtype=np.uint16)
    # force the SSSS=16 (diff exactly 32768, no appended bits) path:
    # alternating 0/32768 makes every modulo-2**16 difference 32768
    img[0, :4] = [0, 32768, 0, 32768]
    for predictor in (1, 4, 7):
        enc = encode_jpeg_lossless(img, predictor=predictor, precision=16)
        out = decode_jpeg_lossless_samples(enc)
        assert np.array_equal(out[:, :, 0], img.astype(np.int32))


def test_lossless_point_transform():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (12, 9), dtype=np.uint8)
    enc = encode_jpeg_lossless(img, predictor=2, pt=2)
    out = decode_jpeg_lossless_samples(enc)
    assert np.array_equal(out[:, :, 0], (img.astype(np.int32) >> 2) << 2)


def test_lossless_color_and_scan_layouts():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (20, 22, 3), dtype=np.uint8)
    inter = encode_jpeg_lossless(rgb, predictor=4)
    non = encode_jpeg_lossless(rgb, predictor=4, interleave=False)
    # interleaved and one-scan-per-component files reconstruct the
    # same YCbCr samples exactly
    assert np.array_equal(decode_jpeg_lossless_samples(inter),
                          decode_jpeg_lossless_samples(non))
    # the public decode inverts the rounded RGB->YCbCr transform to
    # within 1 count
    out = decode_jpeg(inter)
    assert out.shape == (20, 22, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


def test_lossless_gray_public_decode_exact():
    img = _gradient(16, 16)[:, :, 0]
    out = decode_jpeg(encode_jpeg_lossless(img))
    assert all(np.array_equal(out[:, :, c], img) for c in range(3))


def test_lossless_raw_samples_rejects_dct_files():
    with pytest.raises(ValueError):
        decode_jpeg_lossless_samples(encode_jpeg(_gradient(16, 16)))


def test_decode_image_stage_strict_lossless_jpeg():
    """SOF3 payloads flow through the actor-pool decode stage like any
    other JPEG (same JFIF sniff), in strict mode -- the Ray-side
    plumbing needs no special-casing for the lossless process."""
    from fluent_plugin_geoip_ray.stages.multimodal import (
        resize_nearest,
        synthesize_binary_table,
    )

    t = synthesize_binary_table(n=7, real=True, formats=("jpeg_lossless",))
    out = DecodeImage(out_hw=(8, 8), strict=True)(t)
    assert out.column("pixels").type == pa.list_(pa.uint8(), 192)
    raw = t.column("payload")[0].as_py()
    ref = resize_nearest(decode_jpeg(raw), (8, 8)).ravel()
    got = np.asarray(out.column("pixels")[0].as_py(), dtype=np.uint8)
    assert np.array_equal(got, ref)


def test_lossless_per_scan_point_transform():
    """Pt is a per-SCAN parameter: a two-component file whose scans
    carry different Pt values must undo each component's own shift."""
    from fluent_plugin_geoip_ray.stages.jpegc import (
        _find_scan_end,  # noqa: F401 (import guards the private API)
    )
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (10, 8), dtype=np.uint8)
    b = rng.integers(0, 256, (10, 8), dtype=np.uint8)
    # build the two single-scan files, then splice scan 2 (Pt=2, comp
    # id rewritten to 2) into file 1 (Pt=0) before its EOI
    f1 = bytearray(encode_jpeg_lossless(a, predictor=1, pt=0))
    f2 = bytearray(encode_jpeg_lossless(b, predictor=1, pt=2))
    # extend f1's SOF to two components
    i = bytes(f1).find(b"\xff\xc3")
    f1[i + 2:i + 4] = (11 + 3).to_bytes(2, "big")
    f1[i + 9] = 2  # ncomp = 2
    f1[i + 13:i + 13] = bytes([2, 0x11, 0])  # comp id 2, 1x1
    # take scan 2 (SOS..before EOI) from f2, rewrite its comp id to 2
    j = bytes(f2).find(b"\xff\xda")
    scan2 = bytearray(f2[j:-2])
    scan2[5] = 2  # the single scan component id
    out = bytes(f1[:-2]) + bytes(scan2) + b"\xff\xd9"
    dec = decode_jpeg_lossless_samples(out)
    assert np.array_equal(dec[:, :, 0], a.astype(np.int32))          # Pt=0
    assert np.array_equal(dec[:, :, 1], (b.astype(np.int32) >> 2) << 2)


def test_lossless_truncated_raises():
    img = _gradient(16, 16)[:, :, 0]
    data = encode_jpeg_lossless(img)
    # chop entropy bytes before the EOI -- must raise, never silently
    # decode fabricated zero diffs
    truncated = data[:-22] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_lossless_samples(truncated)


def test_lossless_subset_interleaved_dims():
    """An interleaved scan of 1x1 components inside a frame whose max
    sampling factor is 2 covers ceil(d/2) samples per axis (T.81
    A.1.1), not the full frame -- build such a file by hand around the
    encoder's single-component entropy coder."""
    from fluent_plugin_geoip_ray.stages.jpegc import (
        LL_BITS,
        LL_VALS,
        _canonical_codes,
        _ll_encode_scan,
    )
    import struct as _s
    h, w = 8, 8
    rng = np.random.default_rng(4)
    luma = rng.integers(0, 256, (h, w), dtype=np.int64)
    cb = rng.integers(0, 256, (4, 4), dtype=np.int64)
    cr = rng.integers(0, 256, (4, 4), dtype=np.int64)
    codes = _canonical_codes(LL_BITS, LL_VALS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + _s.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])  # luma 2x2
    out += b"\xff\xc4" + _s.pack(">H", 19 + len(LL_VALS)) \
        + bytes([0x00]) + bytes(LL_BITS) + bytes(LL_VALS)
    out += b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes([1, 0, 1, 0, 0])
    out += _ll_encode_scan([luma], 1, 8, 0, 0, codes)
    out += b"\xff\xda" + _s.pack(">HB", 10, 2) \
        + bytes([2, 0, 3, 0, 1, 0, 0])
    out += _ll_encode_scan([cb, cr], 1, 8, 0, 0, codes)
    out += b"\xff\xd9"
    dec = decode_jpeg_lossless_samples(bytes(out))
    assert dec.shape == (h, w, 3)
    assert np.array_equal(dec[:, :, 0], luma.astype(np.int32))
    # chroma planes upsample 2x2 from the 4x4 grids
    assert np.array_equal(dec[:, :, 1], np.repeat(np.repeat(
        cb, 2, 0), 2, 1).astype(np.int32))
    assert np.array_equal(dec[:, :, 2], np.repeat(np.repeat(
        cr, 2, 0), 2, 1).astype(np.int32))
