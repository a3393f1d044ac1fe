"""Small shared numpy helpers for the block-local relational kernels."""

from __future__ import annotations

import numpy as np


def key_runs(arr: np.ndarray) -> np.ndarray:
    """Run boundaries of equal adjacent values in a (sorted) array: returns
    ``bounds`` such that ``bounds[i]:bounds[i+1]`` slices the i-th run and
    ``len(bounds) - 1`` is the run count.  ``len(arr) == 0`` → ``[0]`` (zero
    runs).  Used by the as-of / interval-join kernels — one definition so a
    dtype or comparison fix lands everywhere."""
    n = len(arr)
    if n == 0:
        return np.array([0], dtype=np.int64)
    neq = np.empty(n - 1, dtype=bool)
    np.not_equal(arr[1:], arr[:-1], out=neq)
    return np.flatnonzero(np.r_[True, neq, True]).astype(np.int64)
