"""Baseline JPEG (JFIF) codec in pure numpy + stdlib, written from the
public ITU-T T.81 spec -- no libjpeg/PIL, which are absent from this
container.

Why this exists: the reference plugin's job is enrichment over opaque event
payloads (filter_geoip.rb:1-219 treats records as dicts and never decodes
media), but this engine's multimodal stages (stages/multimodal.py) decode
image payloads inside actor-pool ``map_batches`` stages, and a training-data
pipeline hits JPEG constantly.  BMP/PPM/PNG are already real; this module
makes JPEG real too.

Scope (honest): every DCT-based T.81 process decodes -- sequential
(SOF0/SOF1, 8- and 12-bit samples), progressive (SOF2: spectral
selection + successive approximation, DC/AC first and refinement scans,
EOB runs, per Annex G), arithmetic-coded sequential (SOF9: Annex D
QM-coder + the F.1.4 statistical models, DAC conditioning, restart
resets) and arithmetic-coded progressive (SOF10, per F.2.4/G.2);
grayscale + YCbCr with arbitrary sampling factors whose ratios divide
Hmax/Vmax (covers 4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn);
plus Huffman LOSSLESS (SOF3, Annex H: all 7 predictors, point
transform, 2..16-bit samples, modulo-2**16 reconstruction, exact
integer output via :func:`decode_jpeg_lossless_samples`).
Hierarchical and arithmetic-lossless modes raise
``NotImplementedError`` -- a real gap is reported, never silently
mis-decoded.  Entropy-layer correctness
is pinned two ways: the bundled progressive/arithmetic ENCODERS reuse
the exact quantized coefficients of the baseline encoder, so their
decodes must equal baseline decode bit-for-bit; and the REAL system
libjpeg (via a compiled test shim) cross-validates both directions --
our decoder on libjpeg-produced arithmetic/progressive files and
libjpeg's decoder on our arithmetic files (test_jpeg.py).

Design notes for the hot path: Huffman symbol decoding is inherently
sequential (bit-serial), so it runs as a tight Python loop per entropy
segment; everything after -- dequantize, dezigzag, IDCT, upsample, color
convert -- is one batched numpy pass over ALL blocks at once (``einsum`` with
the 8x8 orthonormal DCT-II matrix).  Decode cost is therefore linear in
compressed symbols, not in pixels.

The encoder exists to build deterministic test fixtures (and MJPEG-AVI
fixtures for frame sampling): 4:4:4 or 4:2:0, IJG-style quality scaling of
the Annex-K quantization tables, optional restart intervals.  The Huffman
tables it emits are written into DHT segments, so any spec-conformant
decoder (including this one) reads them from the file -- the decoder has no
built-in tables.
"""
from __future__ import annotations

import struct

import numpy as np

# Zigzag scan: position k in the scan -> raster index in the 8x8 block
# (T.81 Figure A.6 -- public spec constant).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 example quantization tables (raster order).
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman specs: (bits[1..16], values).  Only the encoder
# uses these; the decoder always builds tables from the file's DHT segments.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: DCT = A @ f @ A.T, IDCT = A.T @ F @ A."""
    x = np.arange(8)
    u = x[:, None]
    a = np.sqrt(2.0 / 8.0) * np.cos((2 * x[None, :] + 1) * u * np.pi / 16.0)
    a[0, :] = np.sqrt(1.0 / 8.0)
    return a


_DCT_A = _dct_matrix()


def _canonical_codes(bits, values):
    """(bits[16], values) -> {symbol: (code, length)} per T.81 Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _canonical_decode_table(bits, values):
    """(bits, values) -> {(length, code): symbol} for bit-serial decoding."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("d", "p", "b", "n")

    def __init__(self, d: bytes):
        self.d, self.p, self.b, self.n = d, 0, 0, 0

    def read(self, k: int) -> int:
        while self.n < k:
            byte = self.d[self.p] if self.p < len(self.d) else 0
            self.p += 1
            self.b = (self.b << 8) | byte
            self.n += 8
        self.n -= k
        v = (self.b >> self.n) & ((1 << k) - 1)
        self.b &= (1 << self.n) - 1
        return v


def _decode_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitWriter:
    __slots__ = ("out", "b", "n")

    def __init__(self):
        self.out, self.b, self.n = bytearray(), 0, 0

    def write(self, value: int, length: int):
        self.b = (self.b << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.b >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)
        self.b &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes, _raw_samples: bool = False) -> np.ndarray:
    """JFIF bytes (sequential SOF0/1, progressive SOF2,
    arithmetic-coded SOF9/SOF10, or lossless SOF3; 8- or 12-bit DCT
    samples, 2..16-bit lossless samples) -> (h, w, 3) uint8 RGB
    (grayscale replicated; >8-bit samples are rendered by
    v*255/maxval rounding).  ``_raw_samples`` is the private hook for
    :func:`decode_jpeg_lossless_samples` (exact integer plane output)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}  # (class, id) -> decode table
    dac_dc: dict[int, tuple] = {}    # tbl -> (L, U) DC conditioning
    dac_ac: dict[int, int] = {}      # tbl -> Kx AC conditioning
    frame = None
    ll_planes = None  # lossless: per-comp reconstructed sample planes
    ll_pts = None     # lossless: per-comp point transform (Pt is per SCAN)
    prog_grids = None  # progressive: per-comp (bh, bw, 64) coefficient grids
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:
                    q = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    q = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                qtables[tid] = q  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                htables[(tc, th)] = _canonical_decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 sequential Huffman, SOF2 progressive Huffman,
            # SOF3 lossless Huffman (Annex H), SOF9 sequential
            # arithmetic, SOF10 progressive arithmetic
            precision = seg[0]
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= precision <= 16:
                    raise ValueError(
                        f"{precision}-bit lossless precision "
                        "(T.81 allows 2..16)")
            elif precision not in (8, 12):
                raise NotImplementedError(
                    f"{precision}-bit precision (T.81 allows 8/12 only)")
            if precision == 12 and marker in (0xC2, 0xCA):
                raise NotImplementedError(
                    "12-bit progressive JPEG not supported "
                    "(12-bit sequential and 8-bit progressive are)")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker in (0xC2, 0xCA),
                     "arith": marker in (0xC9, 0xCA),
                     "lossless": lossless,
                     "precision": precision}
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (hierarchical or "
                "arithmetic-lossless) not supported; sequential + "
                "progressive DCT (Huffman and arithmetic) and Huffman "
                "lossless (SOF3) are"
            )
        elif marker == 0xCC:  # DAC -- arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 15
                if tc == 0:
                    dac_dc[tb] = (seg[i + 1] & 15, seg[i + 1] >> 4)  # (L, U)
                else:
                    dac_ac[tb] = seg[i + 1]                          # Kx
                i += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -- entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            if _raw_samples and not frame.get("lossless"):
                raise ValueError("not a lossless JPEG (raw-sample decode "
                                 "is lossless-only)")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(cc for cc in frame["comps"] if cc["id"] == cid)
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 15})
            if frame.get("lossless"):
                predictor = seg[1 + 2 * ns]  # Ss = predictor selector
                pt = seg[3 + 2 * ns] & 15  # Al = point transform (per scan)
                if not 1 <= predictor <= 7:
                    raise NotImplementedError(
                        f"lossless predictor {predictor} (0 is "
                        "hierarchical-only; 1..7 are supported)")
                end = _find_scan_end(data, pos, n)
                if ll_planes is None:
                    ll_planes = [None] * len(frame["comps"])
                    ll_pts = [0] * len(frame["comps"])
                _decode_lossless_scan(frame, scan, data[pos:end], htables,
                                      restart_interval, predictor, pt,
                                      ll_planes, ll_pts)
                pos = end
            elif not frame["progressive"]:
                end = data.find(b"\xff\xd9", pos)
                ecs = data[pos:end if end >= 0 else n]
                if frame["arith"]:
                    return _decode_scan_arith(frame, scan, ecs, qtables,
                                              dac_dc, dac_ac,
                                              restart_interval)
                return _decode_scan(frame, scan, ecs, qtables, htables,
                                    restart_interval)
            else:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 15
                end = _find_scan_end(data, pos, n)
                if prog_grids is None:
                    hmax = max(c["h"] for c in frame["comps"])
                    vmax = max(c["v"] for c in frame["comps"])
                    mcux = -(-frame["w"] // (8 * hmax))
                    mcuy = -(-frame["h"] // (8 * vmax))
                    prog_grids = [
                        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                        for c in frame["comps"]
                    ]
                if frame["arith"]:
                    _decode_progressive_scan_arith(frame, scan, ss, se, ah,
                                                   al, data[pos:end], dac_dc,
                                                   dac_ac, restart_interval,
                                                   prog_grids)
                else:
                    _decode_progressive_scan(frame, scan, ss, se, ah, al,
                                             data[pos:end], htables,
                                             restart_interval, prog_grids)
                pos = end
    if frame is not None and frame.get("lossless") and ll_planes is not None:
        return _assemble_lossless(frame, ll_planes, ll_pts, _raw_samples)
    if _raw_samples:
        raise ValueError("not a lossless JPEG (raw-sample decode is "
                         "lossless-only)")
    if frame is not None and frame["progressive"] and prog_grids is not None:
        return _assemble_progressive(frame, prog_grids, qtables)
    raise ValueError("no SOS segment found")


def _find_scan_end(data: bytes, pos: int, n: int) -> int:
    """Entropy-coded data runs from ``pos`` to the next marker that is
    neither a stuffed 0x00 nor a restart (RST0..7)."""
    end = pos
    while True:
        j = data.find(b"\xff", end)
        if j < 0 or j + 1 >= n:
            return n
        nx = data[j + 1]
        if nx == 0x00 or 0xD0 <= nx <= 0xD7:
            end = j + 2
            continue
        return j


def _decode_scan(frame, scan, ecs, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total_mcus = mcux * mcuy
    # Split on restart markers, destuff each segment once up front.
    segments = []
    i, start = 0, 0
    while True:
        j = ecs.find(b"\xff", i)
        if j < 0 or j + 1 >= len(ecs):
            segments.append(ecs[start:].replace(b"\xff\x00", b"\xff"))
            break
        nxt = ecs[j + 1]
        if 0xD0 <= nxt <= 0xD7:
            segments.append(ecs[start:j].replace(b"\xff\x00", b"\xff"))
            start = i = j + 2
        else:
            i = j + 2 if nxt == 0x00 else j + 1
    if restart_interval and len(segments) != -(-total_mcus // restart_interval):
        raise ValueError("restart marker count does not match DRI interval")

    per_mcu = [c["comp"]["h"] * c["comp"]["v"] for c in scan]
    coefs = [np.zeros((total_mcus * k, 64), dtype=np.int64) for k in per_mcu]
    mcu = 0
    for seg in segments:
        br = _BitReader(seg)
        preds = [0] * len(scan)
        seg_mcus = (min(restart_interval, total_mcus - mcu)
                    if restart_interval else total_mcus)
        for _ in range(seg_mcus):
            for ci, sc in enumerate(scan):
                dct = htables[(0, sc["dc"])]
                act = htables[(1, sc["ac"])]
                base = mcu * per_mcu[ci]
                for b in range(per_mcu[ci]):
                    row = coefs[ci][base + b]
                    t = _decode_symbol(br, dct)
                    preds[ci] += _extend(br.read(t), t)
                    row[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(br, act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        row[k] = _extend(br.read(s), s)
                        k += 1
            mcu += 1

    # Batched numpy tail: dequantize (tables are zigzag order), dezigzag,
    # IDCT all blocks per component at once, assemble + upsample planes.
    return _coefs_to_image(frame, scan, coefs, qtables, mcux, mcuy,
                           hmax, vmax)


def _coefs_to_image(frame, scan, coefs, qtables, mcux, mcuy, hmax, vmax):
    h, w = frame["h"], frame["w"]
    precision = frame.get("precision", 8)
    shift = float(1 << (precision - 1))
    planes = []
    for ci, sc in enumerate(scan):
        comp = sc["comp"]
        q = qtables[comp["tq"]]
        deq = coefs[ci] * q[None, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", _DCT_A.T, blocks, _DCT_A) + shift
        cv, ch = comp["v"], comp["h"]
        plane = (pix.reshape(mcuy, mcux, cv, ch, 8, 8)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(mcuy * cv * 8, mcux * ch * 8))
        if vmax % cv or hmax % ch:
            raise NotImplementedError(
                f"non-integer sampling ratio {cv}x{ch} vs {vmax}x{hmax}")
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:h, :w])
    return _planes_to_rgb(np.stack(planes, axis=-1), precision)


def _planes_to_rgb(out: np.ndarray, precision: int = 8) -> np.ndarray:
    half = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    if out.shape[-1] == 1:
        rgb = np.repeat(out, 3, axis=-1)
    elif out.shape[-1] == 3:
        y, cb, cr = out[..., 0], out[..., 1] - half, out[..., 2] - half
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
    else:
        raise NotImplementedError(f"{out.shape[-1]}-component JPEG")
    rgb = np.clip(np.rint(rgb), 0, maxval)
    if precision != 8:  # render 2..7- and 9..16-bit samples into uint8
        rgb = np.rint(rgb * (255.0 / maxval))
    return rgb.astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoding (SOF2): coefficients accumulate across scans --
# DC first/refinement via the point transform (arithmetic shift), AC
# first scans with EOB runs, AC refinement with correction bits
# (T.81 Annex G; control flow mirrors the spec's G.1.2.2/G.1.2.3).
# ---------------------------------------------------------------------------

def _split_restart_segments(ecs: bytes) -> list[bytes]:
    segments = []
    i, start = 0, 0
    while True:
        j = ecs.find(b"\xff", i)
        if j < 0 or j + 1 >= len(ecs):
            segments.append(ecs[start:].replace(b"\xff\x00", b"\xff"))
            break
        nxt = ecs[j + 1]
        if 0xD0 <= nxt <= 0xD7:
            segments.append(ecs[start:j].replace(b"\xff\x00", b"\xff"))
            start = i = j + 2
        else:
            i = j + 2 if nxt == 0x00 else j + 1
    return segments


def _ac_first(br, row, ss, se, al, eobrun, act) -> int:
    """AC first scan for one block's band; returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return eobrun
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("progressive AC run past band end")
        row[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _ac_refine(br, row, ss, se, al, eobrun, act) -> int:
    """AC successive-approximation refinement for one block's band."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # r == 15 (ZRL): pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan symbol with s != 1")
                val = p1 if br.read(1) else m1
            while k <= se:
                if row[k] != 0:
                    if br.read(1) and (row[k] & p1) == 0:
                        row[k] += p1 if row[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if row[k] != 0:
                if br.read(1) and (row[k] & p1) == 0:
                    row[k] += p1 if row[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(frame, scan, ss, se, ah, al, ecs, htables,
                             restart_interval, grids):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    interleaved = len(scan) > 1
    if interleaved:
        if ss != 0:
            raise ValueError("progressive AC scan must be single-component")
        total_units = mcux * mcuy
    else:
        comp = scan[0]["comp"]
        ci0 = comps.index(comp)
        bw_i = -(-(-(-frame["w"] * comp["h"] // hmax)) // 8)
        bh_i = -(-(-(-frame["h"] * comp["v"] // vmax)) // 8)
        total_units = bw_i * bh_i
    segments = iter(_split_restart_segments(ecs))
    done = 0
    while done < total_units:
        try:
            seg = next(segments)
        except StopIteration:
            raise ValueError("entropy data ended before scan completed")
        br = _BitReader(seg)
        preds = [0] * len(scan)
        eobrun = 0
        count = (min(restart_interval, total_units - done)
                 if restart_interval else total_units - done)
        for u in range(done, done + count):
            if interleaved:
                my, mx = divmod(u, mcux)
                for si, sc in enumerate(scan):
                    comp = sc["comp"]
                    ci = comps.index(comp)
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = grids[ci][my * comp["v"] + by,
                                            mx * comp["h"] + bx]
                            if ah == 0:
                                t = _decode_symbol(br, htables[(0, sc["dc"])])
                                preds[si] += _extend(br.read(t), t)
                                row[0] = preds[si] << al
                            elif br.read(1):
                                row[0] |= 1 << al
            else:
                by, bx = divmod(u, bw_i)
                row = grids[ci0][by, bx]
                if ss == 0:
                    if ah == 0:
                        t = _decode_symbol(br, htables[(0, scan[0]["dc"])])
                        preds[0] += _extend(br.read(t), t)
                        row[0] = preds[0] << al
                    elif br.read(1):
                        row[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first(br, row, ss, se, al, eobrun,
                                       htables[(1, scan[0]["ac"])])
                else:
                    eobrun = _ac_refine(br, row, ss, se, al, eobrun,
                                        htables[(1, scan[0]["ac"])])
        done += count


def _assemble_progressive(frame, grids, qtables):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, comp in enumerate(comps):
        q = qtables[comp["tq"]]
        g = grids[ci]
        bh, bw = g.shape[:2]
        deq = g.reshape(-1, 64) * q[None, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", _DCT_A.T, blocks, _DCT_A) + 128.0
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        if vmax % comp["v"] or hmax % comp["h"]:
            raise NotImplementedError(
                f"non-integer sampling ratio {comp['v']}x{comp['h']}"
                f" vs {vmax}x{hmax}")
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], 0),
                          hmax // comp["h"], 1)
        planes.append(plane[:h, :w])
    return _planes_to_rgb(np.stack(planes, axis=-1))


# ---------------------------------------------------------------------------
# Encoder (fixture builder)
# ---------------------------------------------------------------------------

def _quality_tables(quality: int):
    """IJG-style quality scaling of the Annex-K example tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255)
    return ql, qc


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H,W) float plane (level-shifted) -> (nblocks, 64) quantized zigzag
    coefficients, blocks in row-major block order."""
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    f = np.einsum("ij,njk,kl->nil", _DCT_A, blocks, _DCT_A.T).reshape(-1, 64)
    qz = np.rint(f[:, ZIGZAG] / qtab[ZIGZAG][None, :]).astype(np.int64)
    return qz


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    t = int(diff != 0 and int(abs(diff)).bit_length())
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return int(zz[0])


def _prep_encode(img: np.ndarray, quality: int, subsample: bool,
                 precision: int = 8):
    """Shared front half of every encoder: color transform, optional
    4:2:0 downsample, MCU padding, FDCT + quantization.  Returns
    (gray, h, w, ql, qc, comps, hmax, vmax, mcux, mcuy, coef, nb_w)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    half = float(1 << (precision - 1))
    ql, qc = _quality_tables(quality)
    if gray:
        y = img.astype(np.float64)
        comps = [("y", y, ql, 1, 1)]
    else:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
        if subsample:
            def down2(p):
                hh, ww = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                p2 = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return p2.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            comps = [("y", y, ql, 2, 2), ("cb", down2(cb), qc, 1, 1),
                     ("cr", down2(cr), qc, 1, 1)]
        else:
            comps = [("y", y, ql, 1, 1), ("cb", cb, qc, 1, 1),
                     ("cr", cr, qc, 1, 1)]
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # Pad each plane to its MCU grid (edge replication) and FDCT+quantize.
    coef, nb_w = [], []
    for _, plane, qtab, ch, cv in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge") - half
        coef.append(_fdct_quant(p, qtab))
        nb_w.append(pw // 8)
    return gray, h, w, ql, qc, comps, hmax, vmax, mcux, mcuy, coef, nb_w


def _extended_tables():
    """Huffman tables covering the 12-bit alphabet: the Annex-K example
    tables stop at DC SSSS 11 / AC SSSS 10, so 12-bit fixtures use flat
    canonical tables (valid: Kraft-feasible, all-ones code unused) --
    DC categories 0..15 at 5 bits, the full AC (run, size<=14) alphabet
    plus EOB/ZRL at 8 bits.  Inefficient, but fixtures only care that a
    spec-conformant decoder reads them from the DHT like any other."""
    dc_bits = [0] * 16
    dc_bits[4] = 16                      # 16 codes of length 5 (bits[5]=16)
    dc_vals = list(range(16))
    ac_vals = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 15)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)            # codes of length 8
    return dc_bits, dc_vals, ac_bits, ac_vals


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0, precision: int = 8) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (2x2 luminance sampling factors);
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs.
    ``precision=12`` takes uint16 samples in 0..4095 and writes an
    extended sequential frame (SOF1) with 16-bit quantization tables
    and 12-bit-capable Huffman tables.
    """
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    (gray, h, w, ql, qc, comps, hmax, vmax, mcux, mcuy, coef,
     nb_w) = _prep_encode(img, quality, subsample, precision)

    if precision == 8:
        dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
        ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
        dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
        ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)
        dht = ((0, 0, DC_LUM_BITS, DC_LUM_VALS),
               (1, 0, AC_LUM_BITS, AC_LUM_VALS),
               (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
               (1, 1, AC_CHROM_BITS, AC_CHROM_VALS))
    else:
        xdc_bits, xdc_vals, xac_bits, xac_vals = _extended_tables()
        dc_l = dc_c = _canonical_codes(xdc_bits, xdc_vals)
        ac_l = ac_c = _canonical_codes(xac_bits, xac_vals)
        dht = ((0, 0, xdc_bits, xdc_vals), (1, 0, xac_bits, xac_vals),
               (0, 1, xdc_bits, xdc_vals), (1, 1, xac_bits, xac_vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, ql),) + ((() if gray else ((1, qc),))):
        if precision == 8:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
                + bytes(int(q[z]) for z in ZIGZAG)
        else:  # Pq=1: 16-bit table entries (B.2.4.1, 12-bit frames)
            out += b"\xff\xdb" + struct.pack(">H", 131) \
                + bytes([0x10 | tid]) \
                + b"".join(struct.pack(">H", int(q[z])) for z in ZIGZAG)
    ncomp = 1 if gray else 3
    sof = 0xC0 if precision == 8 else 0xC1
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 8 + 3 * ncomp,
                                            precision, h, w, ncomp)
    for i, (_, _, _, ch, cv) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    for tc, th, bits, vals in dht[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.align()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (_, _, _, ch, cv) in enumerate(comps):
            codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for by in range(cv):
                for bx in range(ch):
                    bi = (my * cv + by) * nb_w[ci] + (mx * ch + bx)
                    preds[ci] = _encode_block(bw, coef[ci][bi], preds[ci],
                                              *codes)
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (fixture builder for the SOF2 decode path).
#
# Emits a spectral-selection + successive-approximation scan script using
# the standard Annex-K Huffman tables; EOB runs are limited to length 1
# (EOB0), which every decoder accepts and which keeps the standard tables
# sufficient (EOBn symbols for n > 1 are absent from Annex K -- libjpeg
# ships custom tables for them).  Quantized coefficients are IDENTICAL to
# encode_jpeg's at the same quality, so progressive decode must reproduce
# baseline decode bit-for-bit -- the round-trip correctness pin.
# ---------------------------------------------------------------------------

def _enc_ac_first_block(bw, band, al, ac_codes):
    """AC first-scan encoding of one block's band (values >> al by
    magnitude, sign preserved); EOB0 only."""
    vals = [(-((-int(v)) >> al)) if v < 0 else (int(v) >> al) for v in band]
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < len(band) - 1:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)


def _enc_ac_refine_block(bw, band, al, ac_codes):
    """AC refinement-scan encoding of one block's band at Al=al
    (history = values visible at al+1); EOB0 only, correction bits
    buffered and flushed after each symbol exactly as the decoder
    consumes them."""
    absv = [(-int(v) if v < 0 else int(v)) >> al for v in band]
    eobpos = -1
    for i, t in enumerate(absv):
        if t == 1:
            eobpos = i
    run = 0
    pending = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # flush ZRLs BEFORE handling any nonzero coefficient (history or
        # new) so every pending correction bit's coefficient lies within
        # the decoder's 16-zero ZRL window (T.81 G.1.2.3 ordering)
        while run > 15 and i <= eobpos:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:  # history coefficient: one correction bit, run unbroken
            pending.append(t & 1)
            continue
        # t == 1: newly visible coefficient
        c, ln = ac_codes[(run << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if band[i] > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
        for b in pending:
            bw.write(b, 1)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = False, dc_al: int = 1,
                            ac_al: int = 1,
                            bands: tuple = ((1, 5), (6, 63))) -> bytes:
    """(h, w[, 3]) uint8 -> progressive (SOF2) JFIF bytes.

    Scan script: interleaved DC first at Al=``dc_al`` -> per-component AC
    first scans per spectral ``bands`` at Al=``ac_al`` -> DC refinements
    down to Al=0 -> per-component AC refinements down to Al=0."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        comps = [("y", img.astype(np.float64), ql, 1, 1)]
    else:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down2(p):
                hh, ww = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                p2 = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return p2.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            comps = [("y", y, ql, 2, 2), ("cb", down2(cb), qc, 1, 1),
                     ("cr", down2(cr), qc, 1, 1)]
        else:
            comps = [("y", y, ql, 1, 1), ("cb", cb, qc, 1, 1),
                     ("cr", cr, qc, 1, 1)]
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    grids = []   # (bh_pad, bw_pad, 64) quantized zigzag coefficients
    nominal = []  # (bh_i, bw_i) per comp for non-interleaved AC scans
    for _, plane, qtab, ch, cv in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge") - 128.0
        grids.append(_fdct_quant(p, qtab).reshape(ph // 8, pw // 8, 64))
        cw = -(-w * ch // hmax)
        chp = -(-h * cv // vmax)
        nominal.append((-(-chp // 8), -(-cw // 8)))

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, ql),) + ((() if gray else ((1, qc),))):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(q[z]) for z in ZIGZAG)
    ncomp = 1 if gray else 3
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, (_, _, _, ch, cv) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    for tc, th, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS), (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytearray()
        seg += bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            seg += bytes([cid, (td << 4) | td])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + bytes(seg)

    all_ids = list(range(1, ncomp + 1))

    # 1) interleaved DC first scan at Al=dc_al
    out += sos_header(all_ids, 0, 0, 0, dc_al)
    bw = _BitWriter()
    preds = [0] * ncomp
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (_, _, _, ch, cv) in enumerate(comps):
            codes = dc_l if ci == 0 else dc_c
            for by in range(cv):
                for bx in range(ch):
                    v = int(grids[ci][my * cv + by, mx * ch + bx, 0]) >> dc_al
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = int(diff != 0 and int(abs(diff)).bit_length())
                    c, ln = codes[t]
                    bw.write(c, ln)
                    if t:
                        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    bw.align()
    out += bw.out

    # 2) per-component AC first scans per spectral band at Al=ac_al
    for ci in range(ncomp):
        codes = ac_l if ci == 0 else ac_c
        bh_i, bw_n = nominal[ci]
        for ss, se in bands:
            out += sos_header([ci + 1], ss, se, 0, ac_al)
            bw = _BitWriter()
            for u in range(bh_i * bw_n):
                by, bx = divmod(u, bw_n)
                _enc_ac_first_block(bw, grids[ci][by, bx, ss:se + 1],
                                    ac_al, codes)
            bw.align()
            out += bw.out

    # 3) DC refinement scans down to Al=0 (raw bits, interleaved)
    for a in range(dc_al, 0, -1):
        out += sos_header(all_ids, 0, 0, a, a - 1)
        bw = _BitWriter()
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for ci, (_, _, _, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        v = int(grids[ci][my * cv + by, mx * ch + bx, 0])
                        bw.write((v >> (a - 1)) & 1, 1)
        bw.align()
        out += bw.out

    # 4) per-component AC refinement scans down to Al=0
    for a in range(ac_al, 0, -1):
        for ci in range(ncomp):
            codes = ac_l if ci == 0 else ac_c
            bh_i, bw_n = nominal[ci]
            for ss, se in bands:
                out += sos_header([ci + 1], ss, se, a, a - 1)
                bw = _BitWriter()
                for u in range(bh_i * bw_n):
                    by, bx = divmod(u, bw_n)
                    _enc_ac_refine_block(bw, grids[ci][by, bx, ss:se + 1],
                                         a - 1, codes)
                bw.align()
                out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Arithmetic entropy coding (T.81 Annex D QM-coder + Annex F.1.4/F.2
# statistical models for sequential DCT, SOF9).  The probability
# estimation state machine is the public-spec constant Table D.3,
# cross-checked bit-for-bit against the packed `jpeg_aritab` inside this
# host's real libjpeg binary (libjpeg.so.62).  Byte-feed convention past
# a marker/end-of-data is ZERO bits -- the de-facto interop behaviour
# (T.81 encoders may drop trailing zero bytes at flush, so conforming
# decoders must regenerate zeros, not ones).
# ---------------------------------------------------------------------------

# (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS) -- T.81 Table D.3.
# Entry 113 is the non-adapting "fixed" state (self-loop) used for AC
# sign decisions (F.1.4.4.2).
ARITH_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)


class _ArithDecoder:
    """T.81 Annex D QM arithmetic decoder (INITDEC / DECODE / BYTEIN /
    RENORMD register discipline).  Takes ONE already-destuffed entropy
    segment (0xFF00 -> 0xFF, RSTn split upstream -- same pre-pass as the
    Huffman path), so BYTEIN is a plain byte fetch; past the end it
    feeds zero bits (encoders may drop trailing zero bytes at flush)."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.c = 0
        self.a = 0
        self.ct = -16         # two initialization bytes still to load

    def decode(self, stats, i: int) -> int:
        """Decode one binary decision in stats bin ``i`` (low 7 bits:
        Table D.3 index; high bit: current MPS sense).

        Register discipline: C accumulates input bytes UN-shifted; the
        interval bound is compared as ``(A - Qe) << CT`` (D.2 with the
        byte-aligned C convention; initialization folds INITDEC into the
        first renormalization via the negative-CT counter)."""
        # renormalize + byte input (D.2.6)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                b = self.data[self.bp] if self.bp < len(self.data) else 0
                self.bp += 1
                self.c = (self.c << 8) | b
                self.ct += 8
                if self.ct < 0:       # still inside INITDEC
                    self.ct += 1
                    if self.ct == 0:  # both init bytes in -> A=0x10000
                        self.a = 0x8000   # (doubled by the shift below)
            self.a <<= 1
        sv = stats[i]
        qe, nlps, nmps, switch = ARITH_TAB[sv & 0x7F]
        self.a -= qe
        bound = self.a << self.ct
        if self.c >= bound:
            self.c -= bound
            # code point in the TOP subinterval (D.2.4 with exchange)
            if self.a < qe:
                d = sv >> 7                      # exchanged: MPS decoded
                stats[i] = (sv & 0x80) | nmps
            else:
                d = 1 - (sv >> 7)                # LPS decoded
                stats[i] = (((sv ^ 0x80) if switch else sv) & 0x80) | nlps
            self.a = qe
        else:
            if self.a < 0x8000:
                # bottom subinterval with renorm pending (D.2.5)
                if self.a < qe:
                    d = 1 - (sv >> 7)            # exchanged: LPS decoded
                    stats[i] = (((sv ^ 0x80) if switch else sv)
                                & 0x80) | nlps
                else:
                    d = sv >> 7
                    stats[i] = (sv & 0x80) | nmps
            else:
                d = sv >> 7                      # fast path: MPS, no renorm
        return d


class _ArithEncoder:
    """T.81 Annex D QM arithmetic encoder (CODELPS / CODEMPS / BYTEOUT /
    RENORME / FLUSH with stacked-0xFF carry resolution, D.1.4-D.1.9)."""

    __slots__ = ("out", "c", "a", "ct", "buffer", "sc", "zc")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1     # pending output byte (carry may still hit it)
        self.sc = 0          # count of pending 0xFF bytes
        self.zc = 0          # count of pending 0x00 bytes

    def encode(self, stats, i: int, d: int):
        sv = stats[i]
        qe, nlps, nmps, switch = ARITH_TAB[sv & 0x7F]
        self.a -= qe
        if d != (sv >> 7):
            # LPS with conditional exchange (D.1.4)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            stats[i] = ((sv ^ 0x80) & 0x80) | nlps if switch \
                else (sv & 0x80) | nlps
        else:
            # MPS (D.1.5)
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[i] = (sv & 0x80) | nmps
        while True:          # RENORME (D.1.6)
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def _emit(self, b: int):
        self.out.append(b)
        if b == 0xFF:          # byte stuffing (same framing rule the
            self.out.append(0x00)  # Huffman coder uses, B.1.1.5)

    def _drain_zc(self):
        while self.zc:
            self._emit(0x00)
            self.zc -= 1

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry resolves into the pending byte; stacked 0xFFs flip
            # to 0x00s (D.1.7.3)
            if self.buffer >= 0:
                self._drain_zc()
                self._emit(self.buffer + 1)
            self.zc += self.sc
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1       # held back: a later carry may flip it
        else:
            # no carry can reach the held bytes any more: release them
            if self.buffer == 0:
                self.zc += 1   # defer 0x00s (droppable at flush)
            elif self.buffer >= 0:
                self._drain_zc()
                self._emit(self.buffer)
            if self.sc:
                self._drain_zc()
                while self.sc:
                    self._emit(0xFF)
                    self.sc -= 1
            self.buffer = t
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        """D.1.8/D.1.9: pick the in-interval code point with the most
        trailing zero bits, emit what remains, drop trailing zero
        bytes (the decoder regenerates them)."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # one final carry into the pending byte
            if self.buffer >= 0:
                self._drain_zc()
                self._emit(self.buffer + 1)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._drain_zc()
                self._emit(self.buffer)
            if self.sc:
                self._drain_zc()
                while self.sc:
                    self._emit(0xFF)
                    self.sc -= 1
        # final C-register bytes, only while a nonzero byte remains
        if self.c & 0x7FFF800:
            self._drain_zc()
            self._emit((self.c >> 19) & 0xFF)
            if self.c & 0x7F800:
                self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


# Statistical models for sequential DCT with arithmetic coding
# (T.81 F.1.4.1/F.1.4.4 decision trees and Table F.4 bin layout):
# DC per table: 64 bins -- 5 conditioning categories x {S0, SS, SP, SN}
# at 0/4/8/12/16, magnitude-category bins X1.. at 20, magnitude-bit bins
# at a fixed +14 from the stopping X bin.  AC per table: 256 bins --
# {SE, S0, S+} triplets at 3*(k-1), shared XM runs at 189 (k <= Kx) and
# 217 (k > Kx), magnitude bits at +14; the AC sign uses the non-adapting
# fixed bin (state 113).

def _decode_scan_arith(frame, scan, ecs, qtables, dac_dc, dac_ac,
                       restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total_mcus = mcux * mcuy
    segments = _split_restart_segments(ecs)
    if restart_interval and len(segments) != -(-total_mcus //
                                               restart_interval):
        raise ValueError("restart marker count does not match DRI interval")

    per_mcu = [c["comp"]["h"] * c["comp"]["v"] for c in scan]
    coefs = [np.zeros((total_mcus * k, 64), dtype=np.int64) for k in per_mcu]
    mcu = 0
    for seg in segments:
        dec = _ArithDecoder(seg)
        # statistics reset at every restart (F.1.4.1.3)
        dc_stats = {sc["dc"]: bytearray(64) for sc in scan}
        ac_stats = {sc["ac"]: bytearray(256) for sc in scan}
        fixed = bytearray([113])
        dc_ctx = [0] * len(scan)
        last_dc = [0] * len(scan)
        seg_mcus = (min(restart_interval, total_mcus - mcu)
                    if restart_interval else total_mcus)
        for _ in range(seg_mcus):
            for ci, sc in enumerate(scan):
                dst = dc_stats[sc["dc"]]
                ast = ac_stats[sc["ac"]]
                low, up = dac_dc.get(sc["dc"], (0, 1))
                kx = dac_ac.get(sc["ac"], 5)
                base = mcu * per_mcu[ci]
                for b in range(per_mcu[ci]):
                    row = coefs[ci][base + b]
                    diff, dc_ctx[ci] = _arith_dc_diff(dec, dst, dc_ctx[ci],
                                                      low, up)
                    last_dc[ci] += diff
                    row[0] = last_dc[ci]
                    _arith_ac_band(dec, ast, fixed, row, 1, 63, kx, 0)
            mcu += 1
    return _coefs_to_image(frame, scan, coefs, qtables, mcux, mcuy,
                           hmax, vmax)


def encode_jpeg_arith(img: np.ndarray, quality: int = 90,
                      subsample: bool = False,
                      restart_interval: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> arithmetic-coded sequential JFIF
    bytes (SOF9).  Same quantized coefficients as :func:`encode_jpeg`
    (shared `_prep_encode`), so `decode_jpeg(encode_jpeg_arith(x))`
    must equal `decode_jpeg(encode_jpeg(x))` bit-for-bit -- the
    round-trip referee in tests.  Default conditioning (DC L=0 U=1,
    AC Kx=5) is written explicitly as a DAC segment."""
    (gray, h, w, ql, qc, comps, hmax, vmax, mcux, mcuy, coef,
     nb_w) = _prep_encode(img, quality, subsample)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, ql),) + ((() if gray else ((1, qc),))):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(q[z]) for z in ZIGZAG)
    ncomp = 1 if gray else 3
    out += b"\xff\xc9" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, (_, _, _, ch, cv) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    # DAC: default conditioning, one DC + one AC entry per table id
    ntab = 1 if gray else 2
    out += b"\xff\xcc" + struct.pack(">H", 2 + 4 * ntab)
    for t in range(ntab):
        out += bytes([t, (1 << 4) | 0])        # DC: U=1, L=0
        out += bytes([0x10 | t, 5])            # AC: Kx=5
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    per_mcu = [ch * cv for _, _, _, ch, cv in comps]

    def fresh_state():
        tids = [0] if gray else [0, 1]
        return ({t: bytearray(64) for t in tids},
                {t: bytearray(256) for t in tids},
                bytearray([113]), [0] * len(comps), [0] * len(comps))

    enc = _ArithEncoder()
    dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh_state()
    rst = 0
    total_mcus = mcux * mcuy
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            enc = _ArithEncoder()
            dc_stats, ac_stats, fixed, dc_ctx, last_dc = fresh_state()
        my, mx = divmod(mcu, mcux)
        for ci, (_, _, _, ch, cv) in enumerate(comps):
            tid = 0 if ci == 0 else 1
            dst, ast = dc_stats[tid], ac_stats[tid]
            low, up, kx = 0, 1, 5
            for by in range(cv):
                for bx in range(ch):
                    bi = (my * cv + by) * nb_w[ci] + (mx * ch + bx)
                    zz = coef[ci][bi]
                    # ---- DC (F.1.4.1, encoder side) ----
                    diff = int(zz[0]) - last_dc[ci]
                    last_dc[ci] = int(zz[0])
                    s0 = dc_ctx[ci]
                    if diff == 0:
                        enc.encode(dst, s0, 0)
                        dc_ctx[ci] = 0
                    else:
                        enc.encode(dst, s0, 1)
                        sign = 1 if diff < 0 else 0
                        enc.encode(dst, s0 + 1, sign)
                        v = -diff if sign else diff
                        st = s0 + 2 + sign
                        szv = v - 1            # magnitude class of v
                        if szv == 0:
                            enc.encode(dst, st, 0)
                            m = 0
                        else:
                            enc.encode(dst, st, 1)
                            m = 1
                            st = 20
                            while szv >= (m << 1):
                                enc.encode(dst, st, 1)
                                m <<= 1
                                st += 1
                            enc.encode(dst, st, 0)
                        if m < ((1 << low) >> 1):
                            dc_ctx[ci] = 0
                        elif m > ((1 << up) >> 1):
                            dc_ctx[ci] = 12 + sign * 4
                        else:
                            dc_ctx[ci] = 4 + sign * 4
                        st += 14
                        mm = m
                        while mm := mm >> 1:
                            enc.encode(dst, st, 1 if szv & mm else 0)
                    # ---- AC (F.1.4.2, encoder side) ----
                    nz = np.flatnonzero(zz[1:]) + 1
                    last_k = int(nz[-1]) if len(nz) else 0
                    k = 1
                    for k_nz in nz:
                        st = 3 * (k - 1)
                        enc.encode(ast, st, 0)     # not EOB yet
                        while k < k_nz:
                            enc.encode(ast, st + 1, 0)   # zero coef
                            st += 3
                            k += 1
                        enc.encode(ast, st + 1, 1)       # nonzero
                        v = int(zz[k])
                        sign = 1 if v < 0 else 0
                        enc.encode(fixed, 0, sign)
                        v = -v if sign else v
                        st += 2
                        szv = v - 1
                        if szv == 0:
                            enc.encode(ast, st, 0)
                            m = 0
                        else:
                            enc.encode(ast, st, 1)
                            if szv == 1:
                                enc.encode(ast, st, 0)
                                m = 1
                            else:
                                enc.encode(ast, st, 1)
                                m = 2
                                st = 189 if k <= kx else 217
                                while szv >= (m << 1):
                                    enc.encode(ast, st, 1)
                                    m <<= 1
                                    st += 1
                                enc.encode(ast, st, 0)
                        st += 14
                        mm = m
                        while mm := mm >> 1:
                            enc.encode(ast, st, 1 if szv & mm else 0)
                        k += 1
                    if last_k < 63:
                        enc.encode(ast, 3 * (k - 1), 1)   # EOB
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _arith_dc_diff(dec, dst, ctx, low, up):
    """Shared DC-difference decode (F.1.4.1, Figures F.19-F.24): returns
    (diff, next_context) given the conditioning context base ``ctx``."""
    if dec.decode(dst, ctx) == 0:
        return 0, 0
    sign = dec.decode(dst, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(dst, st)
    if m:
        st = 20                   # X1 (Table F.4)
        while dec.decode(dst, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    if m < ((1 << low) >> 1):
        nxt = 0
    elif m > ((1 << up) >> 1):
        nxt = 12 + sign * 4
    else:
        nxt = 4 + sign * 4
    v = m
    st += 14                      # magnitude bits
    while m := m >> 1:
        if dec.decode(dst, st):
            v |= m
    v += 1
    return (-v if sign else v), nxt


def _arith_ac_band(dec, ast, fixed, row, ss, se, kx, al):
    """Shared AC band decode (F.1.4.2 / F.2.4.2, Figure F.20): fills
    ``row[ss..se]`` (values shifted by the point transform ``al``)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ast, st):
            break                 # EOB
        while dec.decode(ast, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(ast, st)
        if m and dec.decode(ast, st):
            m = 2
            st = 189 if k <= kx else 217
            while dec.decode(ast, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arithmetic AC magnitude overflow")
                st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(ast, st):
                v |= m
        v += 1
        row[k] = (-v if sign else v) << al
        k += 1


def _decode_progressive_scan_arith(frame, scan, ss, se, ah, al, ecs,
                                   dac_dc, dac_ac, restart_interval, grids):
    """SOF10 progressive arithmetic scan (T.81 F.2.4 / G.2): DC-first
    reuses the sequential DC model with the point transform applied to
    the accumulated value; DC-refinement is one fixed-bin correction bit
    per block; AC-first is the sequential AC model band-limited;
    AC-refinement corrects history coefficients at st+2, codes newly
    nonzero ones at st+1 with fixed-bin signs, and consults the EOB bin
    only beyond the previous stage's last nonzero index.  Statistics
    reset per scan and at every restart."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    interleaved = len(scan) > 1
    if interleaved:
        if ss != 0:
            raise ValueError("progressive AC scan must be single-component")
        total_units = mcux * mcuy
    else:
        comp = scan[0]["comp"]
        ci0 = comps.index(comp)
        bw_i = -(-(-(-frame["w"] * comp["h"] // hmax)) // 8)
        bh_i = -(-(-(-frame["h"] * comp["v"] // vmax)) // 8)
        total_units = bw_i * bh_i
    segments = iter(_split_restart_segments(ecs))
    done = 0
    while done < total_units:
        try:
            seg = next(segments)
        except StopIteration:
            raise ValueError("entropy data ended before scan completed")
        dec = _ArithDecoder(seg)
        dc_stats = {sc["dc"]: bytearray(64) for sc in scan}
        ac_stats = {sc["ac"]: bytearray(256) for sc in scan}
        fixed = bytearray([113])
        dc_ctx = [0] * len(scan)
        last_dc = [0] * len(scan)
        count = (min(restart_interval, total_units - done)
                 if restart_interval else total_units - done)
        for u in range(done, done + count):
            if interleaved:
                my, mx = divmod(u, mcux)
                for si, sc in enumerate(scan):
                    comp = sc["comp"]
                    ci = comps.index(comp)
                    dst = dc_stats[sc["dc"]]
                    low, up = dac_dc.get(sc["dc"], (0, 1))
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = grids[ci][my * comp["v"] + by,
                                            mx * comp["h"] + bx]
                            if ah == 0:
                                diff, dc_ctx[si] = _arith_dc_diff(
                                    dec, dst, dc_ctx[si], low, up)
                                last_dc[si] += diff
                                row[0] = last_dc[si] << al
                            elif dec.decode(fixed, 0):
                                row[0] |= 1 << al
            else:
                by, bx = divmod(u, bw_i)
                row = grids[ci0][by, bx]
                sc = scan[0]
                if ss == 0:
                    dst = dc_stats[sc["dc"]]
                    low, up = dac_dc.get(sc["dc"], (0, 1))
                    if ah == 0:
                        diff, dc_ctx[0] = _arith_dc_diff(
                            dec, dst, dc_ctx[0], low, up)
                        last_dc[0] += diff
                        row[0] = last_dc[0] << al
                    elif dec.decode(fixed, 0):
                        row[0] |= 1 << al
                elif ah == 0:
                    _arith_ac_band(dec, ac_stats[sc["ac"]], fixed, row,
                                   ss, se, dac_ac.get(sc["ac"], 5), al)
                else:
                    _arith_ac_refine(dec, ac_stats[sc["ac"]], fixed, row,
                                     ss, se, al)
        done += count


def _arith_ac_refine(dec, ast, fixed, row, ss, se, al):
    """AC successive-approximation refinement (G.2.3 / jdarith
    decode_mcu_AC_refine semantics)."""
    p1 = 1 << al
    m1 = -1 << al
    # previous stage's end-of-block index
    kex = se
    while kex > 0 and row[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(ast, st):
            break                 # EOB
        while True:
            if row[k] != 0:       # history coefficient: correction bit
                if dec.decode(ast, st + 2):
                    row[k] += m1 if row[k] < 0 else p1
                break
            if dec.decode(ast, st + 1):   # newly nonzero
                row[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refinement past band end")
        k += 1


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H, process 14: Huffman DPCM).
#
# Each sample is coded as a Huffman DC-style difference (SSSS category +
# EXTEND bits -- the exact machinery the sequential DC path uses, which is
# cross-validated against the real system libjpeg in test_jpeg.py) against
# one of the seven Annex H.1.2.1 predictors.  Reconstruction is modulo
# 2**16 (H.1.2.2); SSSS=16 denotes a difference of exactly 32768 with no
# appended bits.  Positional rules (H.1.2.2/H.2.1):
#   * the very first sample of a scan is predicted with 2**(P-1-Pt);
#   * the rest of the first line uses predictor 1 (Ra);
#   * the first sample of every later line uses predictor 2 (Rb);
#   * everything else uses the scan's selected predictor.
# After a restart marker the next sample of each component is predicted
# with the default 2**(P-1-Pt) and positional rules then resume -- the
# Cornell/libjpeg-lossless convention.  The host's libjpeg-turbo (2.1.5)
# predates lossless support (added in 3.0), so unlike the DCT paths there
# is no external binary cross-check; instead the no-restart bitstream
# layout is pinned by a hand-constructed stream in test_jpeg.py that is
# built in the test from the spec rules, independent of this encoder.
#
# The entropy layer is inherently bit-serial (Python loop, like every
# other entropy decoder in this module); reconstruction is vectorized via
# cumulative sums for the common predictors 1 and 2 when no restart
# intervals are present, and falls back to an exact serial loop otherwise.
# Fixture-scale only: the multimodal stages decode small payloads inside
# actor pools; nothing on a hot Dataset path loops per pixel over large
# images.
# ---------------------------------------------------------------------------

# Fixed Huffman spec covering all lossless difference categories 0..16
# (Annex K's DC tables stop at 11).  Canonical, Kraft-valid: six 3-bit
# codes then one code per length 4..14.
LL_BITS = [0, 0, 6, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
LL_VALS = list(range(17))


def _decode_lossless_scan(frame, scan, ecs, htables, restart_interval,
                          predictor, pt, planes, pts):
    """Decode one lossless scan into ``planes`` (per-frame-component
    int64 sample grids), recording the scan's point transform in
    ``pts`` per component (Pt is a per-SCAN parameter -- two
    non-interleaved scans may legally carry different values)."""
    P = frame["precision"]
    default = 1 << (P - 1 - pt)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    comp_pos = {c["id"]: i for i, c in enumerate(frame["comps"])}
    if len(scan) > 1 and any(c["comp"]["h"] != 1 or c["comp"]["v"] != 1
                             for c in scan):
        raise NotImplementedError(
            "interleaved lossless scan with sampling factors != 1x1")
    # component dimensions are ALWAYS the A.1.1 ceil(d * f / fmax)
    # formula -- also for interleaved scans, whose components may be a
    # subset of the frame (e.g. the two 1x1 chroma planes of a frame
    # whose luma is 2x2)
    dims = []
    for sc in scan:
        comp = sc["comp"]
        hc = -(-frame["h"] * comp["v"] // vmax)
        wc = -(-frame["w"] * comp["h"] // hmax)
        dims.append((hc, wc))
    if len({d for d in dims}) != 1:
        raise NotImplementedError("interleaved lossless components with "
                                  "unequal dimensions")
    hc, wc = dims[0]
    total = hc * wc
    tbls = [htables[(0, sc["dc"])] for sc in scan]
    diffs = [np.zeros(total, np.int64) for _ in scan]
    idx = 0
    for seg in _split_restart_segments(ecs):
        br = _BitReader(seg)
        cnt = (min(restart_interval, total - idx)
               if restart_interval else total - idx)
        for _ in range(cnt):
            for ci in range(len(scan)):
                t = _decode_symbol(br, tbls[ci])
                diffs[ci][idx] = (32768 if t == 16
                                  else _extend(br.read(t), t))
            idx += 1
        # _BitReader fabricates zero bytes past end-of-data (code 000
        # would silently decode as SSSS=0 forever), so a truncated
        # stream is only detectable by the read position overshooting
        # the segment -- padding bits never advance past the last byte
        if br.p > len(seg):
            raise ValueError("lossless scan is short of samples "
                             "(truncated entropy segment)")
    if idx != total:
        raise ValueError("lossless scan is short of samples")
    for ci, sc in enumerate(scan):
        recon = _ll_reconstruct(diffs[ci].reshape(hc, wc), predictor,
                                default, restart_interval)
        pos = comp_pos[sc["comp"]["id"]]
        planes[pos] = recon
        pts[pos] = pt


def _ll_reconstruct(d, predictor, default, restart_interval):
    """Difference grid -> sample grid per Annex H positional rules,
    modulo 2**16.  Vectorized cumsum path for predictors 1/2 without
    restarts (mod arithmetic is linear, so one mask at the end is
    exact); serial reference loop otherwise."""
    hc, wc = d.shape
    if not restart_interval and predictor == 1:
        t = d.copy()
        t[:, 0] = np.cumsum(d[:, 0]) + default  # col 0 chains via Rb
        return np.cumsum(t, axis=1) & 0xFFFF
    if not restart_interval and predictor == 2:
        t = d.copy()
        t[0, :] = np.cumsum(d[0, :]) + default  # row 0 chains via Ra
        return np.cumsum(t, axis=0) & 0xFFFF
    flat = d.ravel()
    recon = np.zeros((hc, wc), np.int64)
    reset = True
    for i in range(hc * wc):
        if restart_interval and i and i % restart_interval == 0:
            reset = True
        y, x = divmod(i, wc)
        if reset:
            px = default
            reset = False
        else:
            px = _ll_predict(recon, y, x, predictor)
        recon[y, x] = (px + int(flat[i])) & 0xFFFF
    return recon


def _ll_predict(recon, y, x, predictor) -> int:
    """Annex H.1.2.1 prediction for one non-default sample: first line
    uses Ra, first column uses Rb, everything else the scan's selected
    predictor.  Shared by the decoder's serial reconstruction and the
    fixture encoder so the mirrored halves cannot drift apart."""
    if y == 0:
        return int(recon[0, x - 1])
    if x == 0:
        return int(recon[y - 1, 0])
    ra = int(recon[y, x - 1])
    rb = int(recon[y - 1, x])
    rc = int(recon[y - 1, x - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1


def _assemble_lossless(frame, planes, pts, raw):
    """Reconstructed planes -> RGB uint8 (``raw=False``, JFIF YCbCr
    convention for 3 components) or exact int32 samples with each
    component's own point transform undone (``raw=True``)."""
    if any(p is None for p in planes):
        raise ValueError("lossless frame is missing a component scan")
    P = frame["precision"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    outs = []
    for c, pl, pt in zip(frame["comps"], planes, pts):
        arr = pl << pt
        arr = np.repeat(np.repeat(arr, vmax // c["v"], 0), hmax // c["h"], 1)
        outs.append(arr[:frame["h"], :frame["w"]])
    stacked = np.stack(outs, axis=-1)
    if raw:
        return stacked.astype(np.int32)
    return _planes_to_rgb(stacked.astype(np.float64), P)


def decode_jpeg_lossless_samples(data: bytes) -> np.ndarray:
    """Lossless JFIF bytes -> exact (h, w, ncomp) int32 sample planes
    (no color conversion, point transform re-applied as ``v << Pt``).
    This is the value-exactness surface: for a Pt=0 encode the output
    equals the encoder's input samples bit-for-bit."""
    return decode_jpeg(data, _raw_samples=True)


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 1,
                         precision: int = 8, pt: int = 0,
                         restart_interval: int = 0,
                         interleave: bool = True) -> bytes:
    """(h, w) or (h, w, 3) samples -> lossless (SOF3) JFIF bytes.

    Grayscale input round-trips exactly through
    :func:`decode_jpeg_lossless_samples` (and, for Pt=0 8-bit input,
    through :func:`decode_jpeg` up to gray->RGB replication).  3-channel
    input is transformed RGB->YCbCr with rounding first (the module's
    JFIF convention), so :func:`decode_jpeg` inverts it only to within
    color-transform rounding -- the YCbCr *samples* still round-trip
    exactly.  ``precision`` may be 2..16 (uint16 input for >8);
    ``pt`` point-transforms the samples (``v >> pt`` is what gets
    coded); ``restart_interval`` > 0 emits DRI/RSTn every N samples.
    """
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if not 0 <= pt < precision:
        raise ValueError("point transform must be in [0, precision)")
    img = np.asarray(img)
    h, w = img.shape[:2]
    maxval = (1 << precision) - 1
    if img.ndim == 2:
        comps = [np.clip(img.astype(np.int64), 0, maxval)]
    else:
        if precision != 8:
            raise ValueError("3-channel lossless encode is 8-bit only")
        half = 128.0
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
        comps = [np.clip(np.rint(p), 0, 255).astype(np.int64)
                 for p in (y, cb, cr)]
    comps = [c >> pt for c in comps]
    ncomp = len(comps)
    codes = _canonical_codes(LL_BITS, LL_VALS)

    out = bytearray(b"\xff\xd8")
    if precision == 8:
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
            + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * ncomp, precision,
                                     h, w, ncomp)
    for i in range(ncomp):
        out += bytes([i + 1, 0x11, 0])  # 1x1 sampling, Tq=0 (unused)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(LL_VALS)) \
        + bytes([0x00]) + bytes(LL_BITS) + bytes(LL_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if interleave or ncomp == 1:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for i in range(ncomp):
            out += bytes([i + 1, 0x00])  # Td=0 for every component
        out += bytes([predictor, 0x00, pt])  # Ss=pred, Se=0, Ah=0|Al=Pt
        out += _ll_encode_scan(comps, predictor, precision, pt,
                               restart_interval, codes)
    else:  # one scan per component (the non-interleaved H.2 layout)
        for ci in range(ncomp):
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, 0x00, predictor, 0x00, pt])
            out += _ll_encode_scan([comps[ci]], predictor, precision, pt,
                                   restart_interval, codes)
    out += b"\xff\xd9"
    return bytes(out)


def _ll_encode_scan(comps, predictor, precision, pt, restart_interval,
                    codes) -> bytes:
    """Entropy-encode one lossless scan (RST markers included)."""
    h, w = comps[0].shape
    ncomp = len(comps)
    default = 1 << (precision - 1 - pt)
    out = bytearray()
    bw = _BitWriter()
    rst = 0
    resets = [True] * ncomp
    recons = [np.zeros((h, w), np.int64) for _ in range(ncomp)]
    for i in range(h * w):
        if restart_interval and i and i % restart_interval == 0:
            bw.align()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            resets = [True] * ncomp
        y, x = divmod(i, w)
        for ci in range(ncomp):
            recon = recons[ci]
            if resets[ci]:
                px = default
                resets[ci] = False
            else:
                px = _ll_predict(recon, y, x, predictor)
            val = int(comps[ci][y, x])
            recon[y, x] = val
            diff = (val - px) & 0xFFFF
            if diff == 32768:  # SSSS=16: no appended bits (H.1.2.2)
                code, length = codes[16]
                bw.write(code, length)
                continue
            if diff > 32768:
                diff -= 65536
            t = int(diff != 0 and int(abs(diff)).bit_length())
            code, length = codes[t]
            bw.write(code, length)
            if t:
                bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    bw.align()
    out += bw.out
    return bytes(out)
