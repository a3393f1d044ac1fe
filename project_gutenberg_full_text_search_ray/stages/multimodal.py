"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video are carried as Arrow ``binary`` columns with struct
metadata; decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages (model/codec loaded once per actor in ``__init__``).

The decode KERNELS are stubbed (no PIL/ffmpeg in this container): with
``fake=True`` (default) they produce deterministic hash-derived features so
the Ray-side plumbing — schemas, batch sizing, actor signatures, output
layout — is real and tested; with ``fake=False`` they raise
``NotImplementedError`` at the exact point a real codec call would go.

Batch-size guidance (binary payloads): keep ``batch_size`` small enough that
``batch_bytes × concurrency`` fits the worker heap — e.g. 32 rows of 4 MB
images × 8 actors ≈ 1 GiB in flight.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        (
            "meta",
            pa.struct(
                [
                    ("mime", pa.string()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("duration_ms", pa.int32()),
                ]
            ),
        ),
    ]
)


def synth_media_table(n: int, seed: int = 3, payload_bytes: int = 256) -> pa.Table:
    """Deterministic fake media corpus (binary payload from seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    metas = [
        {"mime": "image/png" if i % 2 == 0 else "audio/wav",
         "width": 64 + (i % 8) * 16, "height": 64, "duration_ms": 1000 + i}
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas, type=MEDIA_SCHEMA.field("meta").type),
        }
    )


def _hash_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in 'decode': sha256-seeded feature vector."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


class DecodeImageStage:
    """Actor stage: binary image → fixed-size feature vector (+ dims)."""

    def __init__(self, dim: int = 32, fake: bool = True):
        self.dim = dim
        self.fake = fake
        # real path would load the codec/model HERE, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            if not self.fake:
                raise NotImplementedError("real image decode requires PIL/turbojpeg (not in container)")
            feats.append(_hash_features(payload or b"", self.dim))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
                "meta": batch["meta"],
            }
        )


class ResizeImageStage:
    """Actor stage: 'resize' — real plumbing, stub kernel (passthrough bytes,
    updated metadata)."""

    def __init__(self, width: int, height: int, fake: bool = True):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real resize requires an image library")
        metas = batch["meta"].to_pylist()
        for m in metas:
            m["width"], m["height"] = self.width, self.height
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": batch["payload"],
                "meta": pa.array(metas, type=MEDIA_SCHEMA.field("meta").type),
            }
        )


class FrameSampleStage:
    """Actor stage: video → sampled frame rows (flat_map-shaped output:
    one input row explodes to ``n_frames`` rows)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames, self.fake = n_frames, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        ids, frames, payloads = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            for f in range(self.n_frames):
                ids.append(mid)
                frames.append(f)
                payloads.append(hashlib.sha256((payload or b"") + bytes([f])).digest())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
                "frame_payload": pa.array(payloads, type=pa.binary()),
            }
        )
