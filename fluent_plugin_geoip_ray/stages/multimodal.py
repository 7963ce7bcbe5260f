"""Multimodal column stages (driver-mandated extension).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(a ``struct<format, width, height, ...>`` or plain columns).  The Ray-side
plumbing -- schemas, actor-pool signatures, small-batch sizing for large
binary rows, output layout -- is real and tested; the actual codec work is
STUBBED (the imaging/audio libraries are not in this container): decode
either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake derived from the payload bytes (test mode), clearly
marked.

Usage pattern (the important part at 100 TB): binary rows are large, so these
stages run with SMALL ``batch_size`` (e.g. 64) and an actor pool whose
``concurrency x num_cpus`` is sized to heap, letting the object store spill
instead of worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_TYPE = pa.struct(
    [("format", pa.string()), ("width", pa.int32()), ("height", pa.int32())]
)


def synthesize_binary_table(n: int = 64, seed: int = 42,
                            payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake multimodal table for tests: ``media_id, payload
    (binary), media_meta (struct)``."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    meta = [
        {"format": ["png", "jpeg", "wav"][i % 3], "width": 32 + (i % 4) * 16,
         "height": 32 + (i % 3) * 16}
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_meta": pa.array(meta, type=IMAGE_META_TYPE),
        }
    )


class DecodeImage:
    """Actor-pool decode stage: payload bytes -> fixed-shape pixel tensor.

    STUB: real decode needs PIL/libjpeg (absent here).  ``strict=True``
    raises NotImplementedError at first batch (the honest production
    default until a codec is wired in); ``strict=False`` emits a
    deterministic fake tensor seeded from the payload's sha256 so the
    downstream plumbing (schema ``list<uint8>`` + shape columns, batch
    sizing, feature extraction) is fully exercisable.
    """

    def __init__(self, out_hw: tuple = (8, 8), strict: bool = False):
        self.out_hw = out_hw
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an imaging library not present in this "
                "container; run with strict=False for the deterministic fake"
            )
        h, w = self.out_hw
        n = batch.num_rows
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        pixels = np.empty((n, h * w * 3), dtype=np.uint8)
        for i in range(n):  # per-payload digest; payloads are large, rows few
            digest = hashlib.sha256(payloads[i].as_py() or b"").digest()
            seed = int.from_bytes(digest[:8], "little")
            pixels[i] = np.random.default_rng(seed).integers(
                0, 256, size=h * w * 3, dtype=np.uint8
            )
        out = batch.append_column(
            "pixels",
            pa.FixedSizeListArray.from_arrays(
                pa.array(pixels.ravel(), type=pa.uint8()), h * w * 3
            ),
        )
        out = out.append_column("pix_h", pa.array(np.full(n, h, dtype=np.int32)))
        return out.append_column("pix_w", pa.array(np.full(n, w, dtype=np.int32)))


class ExtractImageFeatures:
    """Pixel tensor -> small float feature vector (channel means/stds +
    16-bin histogram), fully vectorized.  This part is REAL -- it consumes
    whatever the decode stage produced."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix = batch.column("pixels")
        if isinstance(pix, pa.ChunkedArray):
            pix = pix.combine_chunks()
        flat = pix.flatten().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        m = flat.reshape(n, -1).astype(np.float32)
        rgb = m.reshape(n, -1, 3)
        feats = np.concatenate(
            [
                rgb.mean(axis=1) / 255.0,
                rgb.std(axis=1) / 255.0,
                np.stack([np.histogram(m[i], bins=16, range=(0, 255))[0]
                          for i in range(n)]).astype(np.float32)
                / np.maximum(m.shape[1], 1),
            ],
            axis=1,
        )
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), feats.shape[1]
            ),
        )


class SampleFrames:
    """Video frame-sampling stub: payload -> every Nth "frame" offset.

    Real frame extraction needs ffmpeg (absent); the deterministic stand-in
    slices the payload into frame_size chunks and keeps every ``stride``-th --
    which is exactly the plumbing shape (one input row -> K output rows) a
    real sampler has."""

    def __init__(self, frame_size: int = 256, stride: int = 4):
        self.frame_size, self.stride = frame_size, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, indices = [], [], []
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        mids = batch.column("media_id").to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            data = payloads[i].as_py() or b""
            n_frames = max(len(data) // self.frame_size, 1)
            for f in range(0, n_frames, self.stride):
                ids.append(mids[i])
                indices.append(f)
                frames.append(data[f * self.frame_size:(f + 1) * self.frame_size])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(indices, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def decode_pipeline(ds, batch_size: int = 64, concurrency=(1, 4)):
    """decode -> feature-extract as actor pools with binary-safe batch size."""
    return ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    ).map_batches(
        ExtractImageFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
