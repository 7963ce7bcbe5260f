"""Minimal MP4 (ISO BMFF, ISO/IEC 14496-12) container walk for REAL video
frame sampling -- pure stdlib, written from the public box-structure spec.

Companion to ``avic.py`` (RIFF/AVI): parses the sample tables of the first
video track (``stsd`` codec fourcc, ``stsz`` sample sizes, ``stsc``
sample-to-chunk runs, ``stco``/``co64`` chunk offsets) and emits each
sample's exact byte range -- the real demux step of a training pipeline.
Payload DECODE is only real for JPEG sample entries (``jpeg``/``mjpa``
fourcc -> ``jpegc.decode_jpeg`` downstream); H.264/H.265 payloads extract
correctly but stay honestly undecodable without a codec (absent here).

The writer emits a fixture-grade single-track file (ftyp + mdat + moov
with hdlr(vide) and the four sample tables) so the walk round-trips; it is
NOT a general muxer.
"""
from __future__ import annotations

import struct


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) walking sibling boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos:pos + 4])[0]
        btype = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", buf[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:          # box extends to end of file
            size = end - pos
        if size < hdr:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes):
    for t, p, e in _boxes(buf, start, end):
        if t == btype:
            return p, e
    return None


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _video_stbl(data: bytes):
    """(stbl_start, stbl_end) of the first track whose hdlr is 'vide'."""
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("not an mp4 (no moov box)")
    for t, p, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, p, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is not None:
            return stbl
    raise ValueError("mp4 has no video track with sample tables")


def video_codec(data: bytes) -> str:
    """Fourcc of the first video sample entry ('jpeg', 'avc1', ...)."""
    stbl = _video_stbl(data)
    stsd = _find(data, *stbl, b"stsd")
    if stsd is None:
        raise ValueError("stbl missing stsd")
    p = stsd[0] + 8                      # ver/flags + entry_count
    return data[p + 4:p + 8].decode("latin1")


def sample_ranges(data: bytes) -> list[tuple[int, int]]:
    """Exact (offset, size) of every sample of the first video track, in
    decode order -- the demux table built from stsz + stsc + stco/co64."""
    stbl = _video_stbl(data)
    stsz = _find(data, *stbl, b"stsz")
    stsc = _find(data, *stbl, b"stsc")
    stco = _find(data, *stbl, b"stco")
    co64 = _find(data, *stbl, b"co64")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("stbl missing stsz/stsc/stco")

    p = stsz[0]
    uniform, count = struct.unpack(">II", data[p + 4:p + 12])
    sizes = ([uniform] * count if uniform else
             list(struct.unpack(f">{count}I",
                                data[p + 12:p + 12 + 4 * count])))

    p = stsc[0]
    (n_runs,) = struct.unpack(">I", data[p + 4:p + 8])
    runs = [struct.unpack(">III", data[p + 8 + 12 * i:p + 20 + 12 * i])
            for i in range(n_runs)]     # (first_chunk, samples_per_chunk, _)

    if stco is not None:
        p = stco[0]
        (n_chunks,) = struct.unpack(">I", data[p + 4:p + 8])
        offs = list(struct.unpack(f">{n_chunks}I",
                                  data[p + 8:p + 8 + 4 * n_chunks]))
    else:
        p = co64[0]
        (n_chunks,) = struct.unpack(">I", data[p + 4:p + 8])
        offs = list(struct.unpack(f">{n_chunks}Q",
                                  data[p + 8:p + 8 + 8 * n_chunks]))

    out: list[tuple[int, int]] = []
    si = 0
    for ci in range(n_chunks):
        per = next(runs[i][1] for i in range(len(runs) - 1, -1, -1)
                   if runs[i][0] <= ci + 1)
        off = offs[ci]
        for _ in range(per):
            if si >= len(sizes):
                break
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return out


def extract_frames(data: bytes) -> list[bytes]:
    """MP4 bytes -> list of raw sample payloads of the first video track
    (standalone JPEGs when the codec is 'jpeg')."""
    return [data[o:o + s] for o, s in sample_ranges(data)]


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4(frames: list[bytes], width: int, height: int,
               codec: bytes = b"jpeg") -> bytes:
    """Frame payloads -> minimal single-track mp4 (one chunk, explicit
    sample sizes).  Layout ftyp + mdat + moov so chunk offsets are fixed
    before moov is sized."""
    if not frames:
        raise ValueError("need at least one frame")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    chunk_off = len(ftyp) + 8            # first sample starts after mdat hdr

    # VisualSampleEntry (spec 12.1.3): reserved(6) + data_ref_idx +
    # pre_defined/reserved(16) + w/h + 72dpi res + frame_count=1 +
    # compressorname(32) + depth=24 + pre_defined=-1
    sample_entry = _box(codec,
                        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                        + struct.pack(">HH", width, height)
                        + struct.pack(">II", 0x00480000, 0x00480000)
                        + b"\x00" * 4 + struct.pack(">H", 1)
                        + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + sample_entry)
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, len(frames))
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    stsc = _box(b"stsc", struct.pack(">II", 0, 1)
                + struct.pack(">III", 1, len(frames), 1))
    stco = _box(b"stco", struct.pack(">II", 0, 1)
                + struct.pack(">I", chunk_off))
    stbl = _box(b"stbl", stsd + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + b"\x00" * 12 + b"video\x00")
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov
