"""Minimal AVI (RIFF) container codec for REAL video frame sampling --
pure stdlib, written from the public RIFF/AVI container layout.

The reference plugin never touches media (filter_geoip.rb operates on event
dicts), but this engine's multimodal stages need real frame extraction for
a training-data pipeline.  ffmpeg is absent from the container; MJPEG-in-AVI
needs only (a) RIFF chunk walking and (b) the baseline JPEG decoder in
``jpegc.py`` -- both implementable from public specs -- so that path is
REAL end-to-end: parse container -> emit per-frame JPEG bytes -> decode via
``jpegc.decode_jpeg``.  Other containers (mp4/mkv/webm) stay honestly
stubbed in ``multimodal.SampleFrames``.

Scope: single video stream, '00dc'/'00db' frame chunks in stream order
(index chunk ignored -- frames are read from the 'movi' list directly, which
is authoritative).  The writer emits a spec-shaped header (avih + strh/strf
with MJPG fourcc) so the files are recognizable AVI, good enough for any
RIFF-aware tool to walk.
"""
from __future__ import annotations

import struct


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking RIFF chunks."""
    pos = start
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        yield fcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def extract_frames(data: bytes) -> list[bytes]:
    """AVI bytes -> list of raw frame payloads ('00dc'/'00db' chunks of the
    first stream) in stream order.  For MJPEG files each payload is a
    standalone baseline JPEG."""
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    frames: list[bytes] = []

    def walk(start: int, end: int):
        for fcc, p, size in _chunks(data, start, end):
            if fcc == b"LIST":
                list_type = data[p:p + 4]
                if list_type in (b"movi", b"rec "):
                    walk(p + 4, p + size)
            elif fcc[2:4] in (b"dc", b"db") and fcc[:2].isdigit():
                if fcc[:2] == b"00":
                    frames.append(data[p:p + size])

    walk(12, len(data))
    return frames


def avi_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the avih main header, 0,0 if absent."""
    for fcc, p, size in _chunks(data, 12, len(data)):
        if fcc == b"LIST" and data[p:p + 4] == b"hdrl":
            for f2, p2, s2 in _chunks(data, p + 4, p + size):
                if f2 == b"avih" and s2 >= 40:
                    w, h = struct.unpack("<II", data[p2 + 32:p2 + 40])
                    return w, h
    return 0, 0


def encode_avi(frames: list[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """Frame payloads (JPEG bytes for MJPEG) -> minimal single-stream AVI."""
    if not frames:
        raise ValueError("need at least one frame")

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # microseconds per frame
        max_bytes * fps,         # max bytes per second
        0, 0x10,                 # padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1,       # total frames, initial, streams
        max_bytes, width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                  # scale, rate -> fps
        0, len(frames), max_bytes, 0, 0,
        0, 0, struct.unpack("<h", struct.pack("<H", width))[0],
        struct.unpack("<h", struct.pack("<H", height))[0],
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
