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

import ray
import ray.data as rd


def _right_index(right: pa.Table, by: str, start: str) -> dict:
    """{key: sorted start values (int64)} from the small side."""
    by_np = np.asarray(right[by].to_pylist())
    st_np = right[start].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((st_np, by_np))
    by_np, st_np = by_np[order], st_np[order]
    idx: dict = {}
    if len(by_np) == 0:
        return idx
    bounds = np.flatnonzero(np.r_[True, by_np[1:] != by_np[:-1], True])
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
        by_np = np.asarray(batch[by].to_pylist())
        on_np = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.zeros(len(batch), dtype=np.int64)
        # vectorize per key-run: sort the batch by key once, searchsorted all
        # of a key's probes against that key's start array in one call
        order = np.argsort(by_np, kind="stable")
        by_s, on_s = by_np[order], on_np[order]
        bounds = np.flatnonzero(np.r_[True, by_s[1:] != by_s[:-1], True]) \
            if len(by_s) else np.array([0])
        res = np.zeros(len(batch), dtype=np.int64)
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            starts = index.get(by_s[lo])
            if starts is None:
                continue
            ts = on_s[lo:hi]
            res[lo:hi] = (np.searchsorted(starts, ts, side="right")
                          - np.searchsorted(starts, ts - window, side="left"))
        out[order] = res
        cols = {c: batch[c] for c in left_cols}
        cols[out_col] = pa.array(out, type=pa.int64())
        return pa.table(cols)

    return left.map_batches(probe, batch_format="pyarrow")
