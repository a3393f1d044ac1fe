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


def hash128(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The repo's 128-bit content-hash convention: two independent
    pandas ``hash_array`` passes with fixed keys, viewed int64.
    Collisions at 10^12 keys are ~1e-14-probable, so hashed keys can
    replace the key bytes in shuffles (the ``exact_dedup`` discipline).
    ``vals`` must be an object array of strings (no NULLs — callers
    flag those separately)."""
    from pandas.util import hash_array

    h1 = hash_array(vals, hash_key="0123456789abcdef",
                    categorize=False).view(np.int64)
    h2 = hash_array(vals, hash_key="fedcba9876543210",
                    categorize=False).view(np.int64)
    return h1, h2
