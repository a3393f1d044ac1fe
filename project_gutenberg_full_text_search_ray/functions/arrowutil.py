"""Shared Arrow helpers for driver-side folds over Ray block refs.

Why this module exists: Ray's sort-based ``groupby().aggregate()`` can emit
an output partition whose value column holds ONLY nulls — that block comes
back **null-typed** (``value: null`` instead of ``value: int64``), and a
plain ``pa.concat_tables`` over ``to_arrow_refs()`` output then raises
``ArrowInvalid: Schema at index N was different``.  This is parallelism-
dependent (more CPUs → more/narrower partitions → higher odds one holds
only null marker rows); it took down ``grouped_quantiles`` in the round-4
driver run at ``num_cpus=32`` while passing every 8-CPU local sweep.

Every driver fold that concatenates Ray groupby/aggregate output blocks
must go through :func:`concat_cast` (or cast per-block BEFORE concat) —
one definition so the fix lands everywhere.

Repo-wide audit (round 5) of every ``to_arrow_refs()`` fold site: the
hazard needs a Ray aggregate whose VALUE/KEY column can be entirely NULL
within one output partition.  Only two operators deliberately feed
all-null rows into an aggregate — ``stages/topk.grouped_quantiles``
(the (group, NULL, 0) markers; fixed here) and ``stages/sketches``'s
heavy-hitters error rider (guarded by a per-block key cast BEFORE its
concat, the other sanctioned pattern).  Every other fold concatenates
map-produced blocks whose columns are typed by construction (explicit
``pa.array(..., type=)`` / ``.cast(schema)`` in the UDF — asof/
sessionize/pack summaries, knn folds) or parquet-read blocks that carry
their file schema even when empty (dedup doc stores).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


@ray.remote(num_cpus=0.25)
def _block_to_arrow(block) -> pa.Table:
    """Convert a non-Arrow (pandas) block to a pa.Table (remote so the
    block never moves through the driver)."""
    return block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)


def table_refs(ds) -> list:
    """Execute a Dataset ONCE and return its Arrow block object refs.

    ``Dataset.to_arrow_refs()`` consumes the stream via
    ``iter_internal_ref_bundles()`` and then calls
    ``schema(fetch_if_missing=True)`` — which, on a dataset that was never
    materialized, plans a SECOND limit-1 execution of the entire upstream
    pipeline (measured in round 5: 2× the task count for every lazy fold;
    on a pipeline ending in a blocking aggregate the "limit 1" re-runs the
    whole corpus scan).  Every driver-side fold in this repo must collect
    block refs through this helper instead.  All blocks here are Arrow
    (``batch_format="pyarrow"`` throughout), so the skipped
    schema-dependent conversion branch can never be needed — but the
    LIBRARY surface can still be handed pandas-block datasets
    (``rd.from_pandas``), so bundles whose ``schema`` is not an Arrow
    schema are converted block-by-block (one tiny task each), preserving
    to_arrow_refs' behavior without its re-execution.
    """
    import ray

    refs: list = []
    for bundle in ds.iter_internal_ref_bundles():
        arrow = bundle.schema is None or isinstance(bundle.schema, pa.Schema)
        for ref in bundle.block_refs:
            refs.append(ref if arrow else _block_to_arrow.remote(ref))
    return refs


def concat_cast(tabs: list[pa.Table], schema: pa.Schema) -> pa.Table:
    """Concatenate Ray output blocks that may disagree on null-typed
    columns, then cast to the declared ``schema``.

    ``promote_options="permissive"`` unifies a ``null``-typed column with
    its real type (null + int64 → int64); the explicit cast afterwards
    restores the declared type even when EVERY block is null-typed (the
    permissive common type would stay ``null``) and pins column order.
    Blocks are re-selected to the schema's column order first so blocks
    whose aggregate emitted columns in a different order (pyarrow
    ``group_by`` output order is version-dependent) still line up.
    Empty input → empty table with the declared schema."""
    names = schema.names
    keep = [t.select(names) for t in tabs if t.num_rows]
    if not keep:
        return schema.empty_table()
    return pa.concat_tables(keep, promote_options="permissive").cast(schema)


def run_starts_sorted(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Indices where a new run of equal values starts in an array that is
    ALREADY sorted on that column (nulls grouped, e.g. Arrow's
    ``sort_by`` null-at-end placement).  Null-aware: a null↔non-null
    transition is a boundary, null↔null is not — works for any Arrow type
    without a dictionary-encode round trip.  Empty input → ``[]``."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    a1, a0 = arr.slice(1), arr.slice(0, n - 1)
    # not_equal(x, null) is null → fill False, then OR with validity flips
    neq = pc.fill_null(pc.not_equal(a1, a0), False)
    vflip = pc.xor(pc.is_valid(a1), pc.is_valid(a0))
    tail = pc.or_(neq, vflip).to_numpy(zero_copy_only=False)
    return np.flatnonzero(np.r_[True, tail]).astype(np.int64)
