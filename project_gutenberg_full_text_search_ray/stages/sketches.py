"""Streaming-sketch operators: distributed heavy hitters (Misra–Gries).

The reference's facet blocks answer "top categories" by sampling
(/root/reference/search/full_text_search.py:446-494); a training-data
pipeline needs the same answer over the FULL corpus without an exact
groupby when the key cardinality is huge (URLs, user ids, shingles).
Misra–Gries summaries are mergeable with a proven bound, which makes the
operator Ray-Data-shaped:

  1. ``map_batches`` builds one bounded summary per batch — at most
     ``capacity`` (value, count) rows leave each batch, NEVER its full
     distinct set;
  2. one vocabulary-of-survivors-sized ``groupby(col).sum`` merges the
     summaries (summing MG summaries and never re-truncating only
     tightens the classic bound);
  3. the global decrement total (Σ per-batch thresholds) is an upper
     bound on any value's undercount, so the result carries certified
     [count_lower, count_lower + err] intervals.

Guarantees (classic MG, Misra & Gries 1982 / Agarwal et al. "Mergeable
Summaries", PODS'12): every value with true frequency > N/(capacity+1)
survives to the output, and for survivors
``count_lower ≤ true ≤ count_lower + err``.  With
``capacity ≥ distinct(col)`` nothing is ever truncated, ``err == 0`` and
the result is EXACT — that configuration is SQL-oracle-checkable, which
is how the driver query pins this operator's correctness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ..functions.arrowutil import table_refs


def heavy_hitters(
    ds: rd.Dataset, col: str, k: int = 10, capacity: int = 64,
) -> tuple[pa.Table, int]:
    """Top-``k`` values of ``col`` by lower-bound count → (table, err).

    Table columns: (``col``, ``count_lower``) sorted by (count_lower DESC,
    value ASC).  ``err`` is the global decrement total: any value's true
    count is within [count_lower, count_lower + err], and every value with
    true count > err is guaranteed present before the top-k cut.  NULLs
    count as their own value (SQL GROUP BY parity)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def partial(b: pa.Table) -> pa.Table:
        # exact per-batch value counts, then ONE Misra–Gries truncation:
        # subtract the (capacity+1)-th largest count from everything and
        # keep the strictly-positive survivors (≤ capacity rows out)
        vc = b.select([col]).group_by(col).aggregate([([], "count_all")])
        vals = vc[col]
        cnts = vc["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        thr = 0
        if len(cnts) > capacity:
            thr = int(np.partition(cnts, -capacity - 1)[-capacity - 1])
            keep = cnts > thr
            vals = vals.filter(pa.array(keep))
            cnts = cnts[keep] - thr
        err_col = np.zeros(len(cnts) + (1 if thr else 0), dtype=np.int64)
        if thr:
            # the decrement rides along in ONE extra row (null value) so the
            # global error bound is a plain SUM in the same exchange
            vals = pa.concat_arrays([
                vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals,
                pa.nulls(1, type=vals.type)])
            cnts = np.concatenate([cnts, [0]])
            err_col[-1] = thr
        return pa.table({col: vals,
                         "count_lower": pa.array(cnts, type=pa.int64()),
                         "__mg_err": pa.array(err_col, type=pa.int64())})

    import pyarrow.compute as pc

    import ray

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .sum(["count_lower", "__mg_err"])
    )
    key_type = ds.schema().base_schema.field(col).type
    parts = [t for t in ray.get(table_refs(agg)) if t.num_rows]
    if not parts:
        return pa.table({col: pa.array([], type=key_type),
                         "count_lower": pa.array([], type=pa.int64())}), 0
    # Arrow throughout: pandas would coerce an int64 key column with the
    # null error-rider row into float64 and break oracle parity.  A groupby
    # partition holding ONLY the null-key rider infers `null` type for the
    # key — cast it back before concatenating.
    parts = [t.set_column(t.schema.get_field_index(col), col,
                          t[col].cast(key_type)) for t in parts]
    cat = pa.concat_tables(parts)
    merged = pa.table({col: cat[col],
                       "count_lower": cat["sum(count_lower)"],
                       "__mg_err": cat["sum(__mg_err)"]})
    err = int(pc.sum(merged["__mg_err"]).as_py() or 0)
    # NULL group: real NULL values in the data carry count_lower > 0; the
    # error-rider row carries 0 — keep the former, always drop a pure rider
    rider = pc.and_(pc.is_null(merged[col]),
                    pc.equal(merged["count_lower"], pa.scalar(0, pa.int64())))
    body = merged.filter(pc.invert(rider)).drop_columns(["__mg_err"])
    idx = pc.sort_indices(body, sort_keys=[("count_lower", "descending"),
                                           (col, "ascending")],
                          null_placement="at_end")
    return body.take(idx).slice(0, k), err


def distinct_count(
    ds: rd.Dataset, col: str, k: int = 1024,
) -> tuple[int, bool]:
    """Approximate COUNT(DISTINCT col) via a K-Minimum-Values sketch →
    (estimate, exact).

    Per batch: hash the distinct values (deterministic 64-bit FNV-1a over
    the value's string form — the same fold the SQL oracles re-express) and
    keep the ``k`` smallest hashes; merging = union + re-truncate, so at
    most ``k`` rows leave any batch regardless of cardinality.  If the
    merged sketch holds fewer than ``k`` hashes it has seen EVERY distinct
    value and the count is exact (``exact=True`` — the SQL-oracle-checkable
    regime) — exact up to 64-bit hash collisions: two distinct values
    colliding would undercount by one while still claiming exactness, with
    probability ≈ n²/2⁶⁵ (< 1e-10 below a million distinct values; callers
    needing collision-free exactness at tiny cardinalities should count raw
    values instead).  Otherwise the classic KMV estimator (k-1)/h_(k) scaled
    to the hash space, unbiased with RSE ≈ 1/√(k−2).  NULL counts as one value
    (DuckDB's count(DISTINCT) ignores NULL — callers subtract it; the
    driver query does)."""
    from ..functions.textstats import token_hashes

    if k < 2:
        raise ValueError("k must be >= 2")

    # splitmix64 finalizer (now the shared textstats.mix64): FNV-1a of short
    # similar strings (decimal ids) is NOT uniform enough for min-order
    # statistics — the raw estimator ran ~1.7× high.  Bijective, so the
    # exact regime is unaffected.
    from ..functions.textstats import mix64 as _mix64

    def batch_mins(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vals = pc.unique(b[col])
        strs = [("\x00NULL" if v is None else str(v)) for v in vals.to_pylist()]
        h = np.unique(_mix64(token_hashes(strs)))  # uint64, sorted
        return pa.table({"h": pa.array(h[:k].view(np.int64), type=pa.int64())})

    parts = (
        ds.select_columns([col])
        .map_batches(batch_mins, batch_format="pyarrow")
        .take_all()
    )
    hs = np.unique(np.array([r["h"] for r in parts], dtype=np.int64).view(np.uint64))
    if len(hs) < k:
        return int(len(hs)), True
    kth = float(hs[k - 1])  # k-th smallest over the union
    return int(round((k - 1) * (2.0 ** 64) / (kth + 1.0))), False
