"""Broadcast interval (range) join — the other custom relational operator
from the task brief ("as-of join, range join, windowed aggregate").

``broadcast_interval_join``: for every LEFT row, count the RIGHT intervals
``[start, start + window]`` (inclusive both ends) with the same ``by`` key
that contain the left row's ``on`` value.

Shape: the RIGHT side is assumed SMALL (a filtered event class, a dimension
of maintenance windows, …) — it is collected once, organised into per-key
sorted start arrays, and broadcast via ``ray.put``; every LEFT batch then
answers with two vectorized ``searchsorted`` calls per key-run (containment
``start ≤ on ≤ start+W``  ⇔  ``start ∈ [on−W, on]``).  No shuffle of the big
side at all.  Partitioning assumption (documented per brief): the right side
fits in worker memory; for a large right side, hash-partition BOTH sides by
``by`` first and run this join per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.nputil import key_runs


def _right_index(right: pa.Table, by: str, start: str) -> dict:
    """{key: sorted start values (int64)} from the small side.  Rows with a
    NULL key or NULL start are dropped — SQL equality/comparison semantics:
    they can never contain anything (and None would crash the sort)."""
    right = right.filter(pc.and_(pc.is_valid(right[by]), pc.is_valid(right[start])))
    by_np = np.asarray(right[by].to_pylist())
    st_np = right[start].to_numpy(zero_copy_only=False).astype(np.int64)
    idx: dict = {}
    if len(by_np) == 0:
        return idx
    order = np.lexsort((st_np, by_np))
    by_np, st_np = by_np[order], st_np[order]
    bounds = key_runs(by_np)
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        idx[by_np[lo]] = st_np[lo:hi]
    return idx


def broadcast_interval_join(
    left: rd.Dataset, right: pa.Table, by: str, on: str,
    window: int, left_cols: list[str], out_col: str = "n_intervals",
    right_start: str | None = None,
) -> rd.Dataset:
    """LEFT dataset × small RIGHT interval table → LEFT rows + containment
    count.  ``window`` and the ``on``/``start`` columns must share a unit
    (e.g. microseconds for timestamp[us])."""
    right_start = right_start or on
    ref = ray.put(_right_index(right, by, right_start))

    def probe(batch: pa.Table) -> pa.Table:
        index = ray.get(ref)
        # NULL key or NULL probe value → containment count 0 (SQL comparison
        # semantics; NaT would otherwise alias INT64_MIN and wrap around, and
        # None keys would crash the object-array sort)
        valid = pc.and_(pc.is_valid(batch[by]), pc.is_valid(batch[on])) \
                  .to_numpy(zero_copy_only=False)
        vi = np.flatnonzero(valid)
        out = np.zeros(len(batch), dtype=np.int64)
        if len(vi):
            by_np = np.asarray(batch[by].take(pa.array(vi)).to_pylist())
            on_np = batch[on].take(pa.array(vi)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # vectorize per key-run: sort the (valid) rows by key once,
            # searchsorted all of a key's probes against that key's start
            # array in one call
            order = np.argsort(by_np, kind="stable")
            by_s, on_s = by_np[order], on_np[order]
            res = np.empty(len(vi), dtype=np.int64)
            bounds = key_runs(by_s)
            for i in range(len(bounds) - 1):
                lo, hi = bounds[i], bounds[i + 1]
                starts = index.get(by_s[lo])
                if starts is None:
                    res[lo:hi] = 0
                    continue
                ts = on_s[lo:hi]
                res[lo:hi] = (np.searchsorted(starts, ts, side="right")
                              - np.searchsorted(starts, ts - window, side="left"))
            out[vi[order]] = res
        cols = {c: batch[c] for c in left_cols}
        cols[out_col] = pa.array(out, type=pa.int64())
        return pa.table(cols)

    return left.map_batches(probe, batch_format="pyarrow")
