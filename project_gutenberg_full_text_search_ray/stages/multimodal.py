"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video are carried as Arrow ``binary`` columns with struct
metadata; decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages (codec/model state loaded once per actor in
``__init__``).

Two kernel paths per stage:

* REAL (``fake=False``) — pure-numpy codecs for genuinely parseable
  formats, no external libraries: binary PPM (P6) images, PCM-16 WAV audio,
  and a length-prefixed PPM-sequence video container (``PPMV``).  Decode,
  nearest-neighbor resize, and frame sampling operate on actual pixels /
  samples.  Unknown formats raise (the exact point a jpeg/ffmpeg codec
  would slot in).
* FAKE (``fake=True``, default for bench determinism) — sha256-seeded
  feature vectors; exercises the identical Ray plumbing (schemas, batch
  sizing, actor signatures, output layout) with zero decode cost.

Batch-size guidance (binary payloads): keep ``batch_size`` small enough that
``batch_bytes × concurrency`` fits the worker heap — e.g. 32 rows of 4 MB
images × 8 actors ≈ 1 GiB in flight.
"""

from __future__ import annotations

import hashlib
import struct

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


# ------------------------------------------------------------ PPM (P6) codec
def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Handles whitespace + '#' comments
    in the header, like the spec requires."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize, pure numpy indexing."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows][:, cols]


# ------------------------------------------------------------ PCM WAV codec
def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → minimal RIFF/WAVE PCM-16 file."""
    raw = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(raw), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(raw),
    )
    return hdr + raw


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 mono → (int16 samples, sample_rate).  Walks chunks
    (fmt before data not guaranteed by the spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, samples = 12, None, None
    while i + 8 <= len(payload):
        cid, size = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            if fmt_code != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


# ------------------------------------------------------------ PPMV container
_PPMV_MAGIC = b"PPMV"


def encode_ppmv(frames: list[np.ndarray]) -> bytes:
    """List of (h, w, 3) uint8 frames → length-prefixed PPM sequence."""
    parts = [_PPMV_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        ppm = encode_ppm(f)
        parts.append(struct.pack("<I", len(ppm)))
        parts.append(ppm)
    return b"".join(parts)


def decode_ppmv_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Random-access decode of ONE frame (skips others by length prefix)."""
    if payload[:4] != _PPMV_MAGIC:
        raise ValueError("not a PPMV payload")
    n = struct.unpack("<I", payload[4:8])[0]
    if not 0 <= frame_idx < n:
        raise IndexError(f"frame {frame_idx} of {n}")
    i = 8
    for k in range(n):
        size = struct.unpack("<I", payload[i : i + 4])[0]
        if k == frame_idx:
            return decode_ppm(payload[i + 4 : i + 4 + size])
        i += 4 + size
    raise AssertionError("unreachable")


def ppmv_frame_count(payload: bytes) -> int:
    if payload[:4] != _PPMV_MAGIC:
        raise ValueError("not a PPMV payload")
    return struct.unpack("<I", payload[4:8])[0]


# ------------------------------------------------------------ synth corpus
def synth_media_table(n: int, seed: int = 3, payload_bytes: int = 256) -> pa.Table:
    """Deterministic media corpus with REAL payloads: even ids are binary
    PPM images, odd ids are PCM-16 WAVs (``payload_bytes`` kept as the
    legacy knob controlling approximate payload size)."""
    rng = np.random.default_rng(seed)
    payloads, metas = [], []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 8) * 2, 8
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_ppm(px))
            metas.append({"mime": "image/x-portable-pixmap",
                          "width": w, "height": h, "duration_ms": 0})
        else:
            n_samp = max(16, payload_bytes // 2)
            samples = rng.integers(-32768, 32767, size=n_samp, dtype=np.int16)
            rate = 8000
            payloads.append(encode_wav_pcm16(samples, rate))
            metas.append({"mime": "audio/wav", "width": 0, "height": 0,
                          "duration_ms": int(n_samp * 1000 / rate)})
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas, type=MEDIA_SCHEMA.field("meta").type),
        }
    )


def synth_video_table(n: int, seed: int = 5, frames: int = 6,
                      w: int = 8, h: int = 6) -> pa.Table:
    """Deterministic PPMV 'videos' (each frame's pixels derived from
    (seed, media_id, frame))."""
    payloads, metas = [], []
    for i in range(n):
        fs = []
        for f in range(frames):
            rng = np.random.default_rng(seed * 1_000_003 + i * 1_009 + f)
            fs.append(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        payloads.append(encode_ppmv(fs))
        metas.append({"mime": "video/x-ppmv", "width": w, "height": h,
                      "duration_ms": frames * 40})
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


def _image_features(px: np.ndarray, dim: int) -> np.ndarray:
    """Real image features: grayscale downsample to a fixed grid (dim cells),
    scaled to [0, 1] — deterministic, pixels-derived."""
    gray = px.astype(np.float32).mean(axis=2)
    side = max(1, int(np.sqrt(dim)))
    small = resize_nearest(gray[..., None].astype(np.uint8), side, side)[..., 0]
    flat = (small.astype(np.float32) / 255.0).ravel()
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, flat.size)] = flat[:dim]
    return out


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Real audio features: per-chunk RMS energy over ``dim`` equal chunks."""
    x = samples.astype(np.float64) / 32768.0
    chunks = np.array_split(x, dim) if len(x) else [np.zeros(1)] * dim
    return np.asarray([float(np.sqrt((c ** 2).mean())) if len(c) else 0.0
                       for c in chunks], dtype=np.float32)


class DecodeImageStage:
    """Actor stage: binary payload → fixed-size feature vector.

    ``fake=False`` REALLY decodes: PPM pixels → grayscale-grid features,
    WAV samples → RMS-energy features; unknown formats raise (where a
    jpeg/mp3 codec would go)."""

    def __init__(self, dim: int = 32, fake: bool = True):
        self.dim = dim
        self.fake = fake
        # a heavier codec/model would be loaded HERE, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            payload = payload or b""
            if self.fake:
                feats.append(_hash_features(payload, self.dim))
            elif payload.startswith(b"P6"):
                feats.append(_image_features(decode_ppm(payload), self.dim))
            elif payload[:4] == b"RIFF":
                feats.append(_audio_features(*decode_wav_pcm16(payload), self.dim))
            else:
                raise NotImplementedError(
                    "real decode supports PPM/WAV; other codecs not in container")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
                "meta": batch["meta"],
            }
        )


class ResizeImageStage:
    """Actor stage: resize.  ``fake=False`` REALLY resizes PPM payloads
    (nearest-neighbor, dispatched on the P6 magic like DecodeImageStage) and
    re-encodes; non-image rows pass through untouched (the synthetic media
    corpus interleaves WAV rows — one of them must not kill the batch).
    Fake mode passes bytes through with updated metadata (plumbing-only)."""

    def __init__(self, width: int, height: int, fake: bool = True):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch["meta"].to_pylist()
        if self.fake:
            payloads = batch["payload"]
            for m in metas:
                m["width"], m["height"] = self.width, self.height
        else:
            out = []
            for i, payload in enumerate(batch["payload"].to_pylist()):
                payload = payload or b""
                if payload.startswith(b"P6"):
                    px = decode_ppm(payload)
                    out.append(encode_ppm(resize_nearest(px, self.width, self.height)))
                    metas[i]["width"], metas[i]["height"] = self.width, self.height
                else:
                    out.append(payload)  # pass-through: meta stays truthful
            payloads = pa.array(out, type=pa.binary())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": payloads,
                "meta": pa.array(metas, type=MEDIA_SCHEMA.field("meta").type),
            }
        )


class FrameSampleStage:
    """Actor stage: video → sampled frame rows (flat_map-shaped output:
    one input row explodes to ``n_frames`` rows).  ``fake=False`` REALLY
    extracts evenly-spaced frames from PPMV payloads (random-access via the
    length prefixes — no full-container decode)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames, self.fake = n_frames, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            payload = payload or b""
            if self.fake:
                for f in range(self.n_frames):
                    ids.append(mid)
                    frames.append(f)
                    payloads.append(hashlib.sha256(payload + bytes([f])).digest())
                continue
            total = ppmv_frame_count(payload)
            take = np.linspace(0, total - 1, num=min(self.n_frames, total),
                               dtype=np.int64)
            for f in np.unique(take):
                ids.append(mid)
                frames.append(int(f))
                payloads.append(encode_ppm(decode_ppmv_frame(payload, int(f))))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
                "frame_payload": pa.array(payloads, type=pa.binary()),
            }
        )
