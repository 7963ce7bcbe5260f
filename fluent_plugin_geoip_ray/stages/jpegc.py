"""Baseline JPEG (JFIF) codec in pure numpy + stdlib, written from the
public ITU-T T.81 spec -- no libjpeg/PIL, which are absent from this
container.

Why this exists: the reference plugin's job is enrichment over opaque event
payloads (filter_geoip.rb:1-219 treats records as dicts and never decodes
media), but this engine's multimodal stages (stages/multimodal.py) decode
image payloads inside actor-pool ``map_batches`` stages, and a training-data
pipeline hits JPEG constantly.  BMP/PPM/PNG are already real; this module
makes JPEG real too.

Scope (honest): baseline sequential DCT (SOF0/SOF1) AND progressive DCT
(SOF2: spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs, per T.81 Annex G), Huffman entropy coding,
grayscale + YCbCr with arbitrary sampling factors whose ratios divide Hmax/
Vmax (covers 4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn).  Arithmetic
coding and 12-bit precision raise ``NotImplementedError`` -- a real gap is
reported, never silently mis-decoded.  Progressive correctness is pinned by
the bundled progressive ENCODER: it reuses the exact quantized coefficients
of the baseline encoder, so progressive decode must equal baseline decode
bit-for-bit across scan scripts (test_jpeg.py).

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

def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes (baseline SOF0/1 or progressive SOF2) -> (h, w, 3) uint8
    RGB (grayscale replicated)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}  # (class, id) -> decode table
    frame = None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (arithmetic/hierarchical/"
                "lossless) not supported; sequential + progressive DCT only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS -- entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(cc for cc in frame["comps"] if cc["id"] == cid)
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 15})
            if not frame["progressive"]:
                end = data.find(b"\xff\xd9", pos)
                ecs = data[pos:end if end >= 0 else n]
                return _decode_scan(frame, scan, ecs, qtables, htables,
                                    restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            # entropy data runs to the next non-RST/non-stuffed marker
            end = pos
            while True:
                j = data.find(b"\xff", end)
                if j < 0 or j + 1 >= n:
                    end = n
                    break
                nx = data[j + 1]
                if nx == 0x00 or 0xD0 <= nx <= 0xD7:
                    end = j + 2
                    continue
                end = j
                break
            if prog_grids is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcux = -(-frame["w"] // (8 * hmax))
                mcuy = -(-frame["h"] // (8 * vmax))
                prog_grids = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                    for c in frame["comps"]
                ]
            _decode_progressive_scan(frame, scan, ss, se, ah, al,
                                     data[pos:end], htables,
                                     restart_interval, prog_grids)
            pos = end
    if frame is not None and frame["progressive"] and prog_grids is not None:
        return _assemble_progressive(frame, prog_grids, qtables)
    raise ValueError("no SOS segment found")


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
    planes = []
    for ci, sc in enumerate(scan):
        comp = sc["comp"]
        q = qtables[comp["tq"]]
        deq = coefs[ci] * q[None, :]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", _DCT_A.T, blocks, _DCT_A) + 128.0
        cv, ch = comp["v"], comp["h"]
        plane = (pix.reshape(mcuy, mcux, cv, ch, 8, 8)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(mcuy * cv * 8, mcux * ch * 8))
        if vmax % cv or hmax % ch:
            raise NotImplementedError(
                f"non-integer sampling ratio {cv}x{ch} vs {vmax}x{hmax}")
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:h, :w])
    return _planes_to_rgb(np.stack(planes, axis=-1))


def _planes_to_rgb(out: np.ndarray) -> np.ndarray:
    if out.shape[-1] == 1:
        rgb = np.repeat(out, 3, axis=-1)
    elif out.shape[-1] == 3:
        y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
    else:
        raise NotImplementedError(f"{out.shape[-1]}-component JPEG")
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


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


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (2x2 luminance sampling factors);
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs.
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        y = img.astype(np.float64)
        comps = [("y", y, ql, 1, 1)]
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

    # Pad each plane to its MCU grid (edge replication) and FDCT+quantize.
    coef, nb_w = [], []
    for _, plane, qtab, ch, cv in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge") - 128.0
        coef.append(_fdct_quant(p, qtab))
        nb_w.append(pw // 8)

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, ql),) + ((() if gray else ((1, qc),))):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(q[z]) for z in ZIGZAG)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, (_, _, _, ch, cv) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    for tc, th, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS), (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    )[: 2 if gray else 4]:
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
