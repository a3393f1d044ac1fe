"""Delta + variable-byte (VByte) posting-list codec, numpy-vectorized.

The reference delegates posting-list storage to Postgres GIN
(/root/reference/tables/mv_books_dc.sql:461-467); we own the format per the
north rule: sorted doc ordinals are delta-encoded (first value absolute,
then gaps) and packed as classic VByte — 7 data bits per byte, high bit set
on the FINAL byte of each integer (Scholer et al. / IR-textbook layout).

Both encode and decode are vectorized: no per-integer Python loops.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value: ceil(bit_length/7), min 1.

    Branch-free comparisons (≤9 streaming passes for uint64, ≤4 for values
    that fit 32 bits) — the build hot path is bandwidth-bound, so every pass
    counts."""
    v = np.ascontiguousarray(values)
    if v.dtype != np.uint32 and v.dtype != np.uint64:
        v = v.astype(np.uint64, copy=False)
    lengths = np.ones(len(v), dtype=np.int64)
    bits = 32 if v.dtype == np.uint32 else 64
    for shift in range(7, bits, 7):
        thr = v.dtype.type(1) << v.dtype.type(shift)
        more = v >= thr
        if not more.any():
            break
        lengths += more
    return lengths


def vbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode an unsigned array as VByte, returning (bytes, per-value byte
    lengths).  Callers that need the lengths for offset arrays (the build
    path does, for every column) get them from the SAME pass instead of
    re-running ``vbyte_lengths`` over the largest arrays in the pipeline."""
    v = np.ascontiguousarray(values)
    if v.dtype != np.uint32 and v.dtype != np.uint64:
        v = v.astype(np.uint64, copy=False)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    mask7 = v.dtype.type(0x7F)
    lengths = vbyte_lengths(v)
    maxlen = int(lengths.max())
    if maxlen == 1:  # common case: all gaps/tfs < 128 — single streaming pass
        out = v.astype(np.uint8)
        out |= np.uint8(0x80)
        return out.tobytes(), lengths
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(lengths)
    for k in range(maxlen):
        sel = lengths > k  # values having a byte at distance k from the end
        idx = ends[sel] - 1 - k
        chunk = (v[sel] >> v.dtype.type(7 * k)) & mask7
        b = chunk.astype(np.uint8)
        if k == 0:
            b |= np.uint8(0x80)  # terminator bit on final byte
        out[idx] = b
    return out.tobytes(), lengths


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode an unsigned array as VByte. Empty input → b''.
    Accepts uint32 (preferred in the build path — half the bandwidth) or
    anything castable to uint64."""
    return vbyte_encode_with_lengths(values)[0]


def vbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) != 0
    n_vals = int(is_end.sum())
    if n_vals == len(raw):
        # every byte is a terminator (all values < 128 — tf streams and
        # dense gap streams, the encoder's fast-path case): the value IS the
        # low 7 bits, no scatter-accumulate needed
        return (raw & 0x7F).astype(np.uint64)
    # group id for each byte = number of terminators strictly before it
    gid = np.cumsum(is_end) - is_end  # 0-based group index per byte
    data = (raw & 0x7F).astype(np.uint64)
    # position of each byte within its group, from the END of the group:
    ends = np.flatnonzero(is_end)  # last-byte index of each group
    group_end = ends[gid]  # for each byte, index of its group's last byte
    k = (group_end - np.arange(len(raw))).astype(np.uint64)  # distance from end
    contrib = data << (np.uint64(7) * k)
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, gid, contrib)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Sorted uint64 → [first, gap, gap, ...] (strictly increasing input)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if len(v) == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_sorted(sorted_vals: np.ndarray) -> bytes:
    return vbyte_encode(delta_encode(sorted_vals))


def decode_sorted(buf: bytes) -> np.ndarray:
    return delta_decode(vbyte_decode(buf))
