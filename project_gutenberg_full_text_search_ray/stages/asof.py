"""Distributed AS-OF join — a custom operator Ray Data lacks (task brief:
"when the reference has an operator Ray Data lacks (as-of join, range join,
windowed aggregate), implement it as a composition of map_batches + sort if
semantics allow").

Semantics (backward, inclusive): for every LEFT row, attach the value of the
LAST RIGHT row with the same ``by`` key whose ``on`` value is ≤ the left
row's (ties broken by ``seq`` — largest wins; NULL when no right row
precedes).

Shape: ONE global ``sort((by, on, side, seq))`` exchange (rights sort before
lefts at equal timestamps → inclusive), then TWO vectorized passes over the
materialized sorted blocks:

  1. summarize — per block, the LAST right row of each key (≤ one row per
     key per block, so the collected summary set is bounded by
     min(#right rows, #keys × #blocks) — never by left rows).  The driver
     sorts summaries per key and broadcasts them via ``ray.put``.
  2. resolve — per block, a vectorized backward fill answers every left
     whose preceding right is in the same block; the remainder (no earlier
     right IN-BLOCK) binary-search the broadcast per-key summary timeline.
     Correctness of the lookup: any summary right with ``on ≤`` the left's
     ``on`` is strictly earlier in global order (a same-block right at equal
     ``on`` sorts before the left and would have resolved it locally), and
     the true match is always some block's last right for its key (any
     later same-block right would dominate it).

Unlike an edge-row fixup (re-emitting whole first/last-key row ranges, which
degenerates to collecting the ENTIRE dataset when key cardinality is low),
the carry set here never contains left rows at all.  Partitioning
assumption: the per-key × per-block summary table fits in driver/worker
memory (≤ the right-side row count)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.nputil import key_runs
from ..functions.arrowutil import table_refs

_SIDE = "__side"  # 0 = right, 1 = left


def _asof_block(by: np.ndarray, side: np.ndarray) -> np.ndarray:
    """Rows sorted by (by, on, side, seq) → for each row, index of the last
    right row in its key at-or-before it (−1 = none)."""
    n = len(by)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    key_first = np.empty(n, dtype=bool)
    key_first[0] = True
    np.not_equal(by[1:], by[:-1], out=key_first[1:])
    starts = np.flatnonzero(key_first)
    lens = np.diff(np.append(starts, n))
    key_start = np.repeat(starts, lens)
    r_idx = np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
    last_r = np.maximum.accumulate(r_idx)
    return np.where(last_r >= key_start, last_r, np.int64(-1))


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    left_cols: list[str],
    right_value_col: str,
    right_seq_col: str,
    out_value_col: str = "asof_value",
) -> rd.Dataset:
    """Backward-inclusive as-of join; see module docstring.  ``left_cols``
    are carried through; the matched right row contributes
    ``right_value_col`` (NULL if no right row precedes)."""
    lt = left.schema().base_schema
    val_type = right.schema().base_schema.field(right_value_col).type

    # SQL equality/comparison semantics for NULLs: a NULL ``by`` key never
    # equals anything (incl. another NULL) and a NULL ``on`` never satisfies
    # ``right.on <= left.on`` — so NULL-keyed/NULL-on RIGHT rows are dropped
    # from the join entirely, and such LEFT rows bypass the sort exchange
    # and emit the miss value (NULL) directly
    def _valid(b: pa.Table) -> pa.ChunkedArray:
        return pc.and_(pc.is_valid(b[by]), pc.is_valid(b[on]))

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.filter(_valid(b))
        cols = {c: b[c] for c in (by, on)}
        cols[_SIDE] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        cols["__seq"] = pa.nulls(b.num_rows, type=pa.int64())
        cols["__rval"] = pa.nulls(b.num_rows, type=val_type)
        for c in left_cols:
            cols[f"l_{c}"] = b[c]
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        b = b.filter(_valid(b))
        cols = {c: b[c] for c in (by, on)}
        cols[_SIDE] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["__seq"] = b[right_seq_col].cast(pa.int64())
        cols["__rval"] = b[right_value_col]
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(b.num_rows, type=lt.field(c).type)
        return pa.table(cols)

    def null_key_misses(b: pa.Table) -> pa.Table:
        b = b.filter(pc.invert(pc.fill_null(_valid(b), False)))
        return pa.table({**{f"l_{c}": b[c] for c in left_cols},
                         out_value_col: pa.nulls(b.num_rows, type=val_type)})

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    srt = tagged.sort([by, on, _SIDE, "__seq"]).materialize()

    # ---- pass 1: per-block per-key LAST-right summaries (tiny)
    def summarize(b: pa.Table) -> pa.Table:
        sidev = b[_SIDE].to_numpy(zero_copy_only=False)
        r = np.flatnonzero(sidev == 0)
        schema = pa.schema([(by, b.schema.field(by).type),
                            (on, b.schema.field(on).type),
                            ("__seq", pa.int64()), ("__rval", val_type)])
        if len(r) == 0:
            return schema.empty_table()
        rb = np.asarray(b[by].to_numpy(zero_copy_only=False))[r]
        last = r[key_runs(rb)[1:] - 1]  # last right per key run
        idx = pa.array(last, type=pa.int64())
        return pa.table({by: b[by].take(idx), on: b[on].take(idx),
                         "__seq": b["__seq"].take(idx),
                         "__rval": b["__rval"].take(idx)}).cast(schema)

    stabs = [t for t in ray.get(table_refs(
        srt.map_batches(summarize, batch_size=None,
                        batch_format="pyarrow")))
        if t.num_rows and "__rval" in t.column_names]
    summary = pa.concat_tables(stabs) if stabs else None
    carry: dict = {}
    if summary is not None and summary.num_rows:
        order = pc.sort_indices(summary, sort_keys=[
            (by, "ascending"), (on, "ascending"), ("__seq", "ascending")])
        summary = summary.take(order)
        s_by = np.asarray(summary[by].to_numpy(zero_copy_only=False))
        s_on = summary[on].to_numpy(zero_copy_only=False)
        s_val = summary["__rval"]
        bounds = key_runs(s_by)
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            carry[s_by[lo]] = (np.asarray(s_on[lo:hi]),
                               s_val.slice(lo, hi - lo).combine_chunks())
    carry_ref = ray.put(carry)

    out_schema = pa.schema([(f"l_{c}", lt.field(c).type) for c in left_cols]
                           + [(out_value_col, val_type)])

    # ---- pass 2: in-block backward fill + carry lookup for the remainder
    def resolve_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        byv = np.asarray(b[by].to_numpy(zero_copy_only=False))
        sidev = b[_SIDE].to_numpy(zero_copy_only=False)
        last_r = _asof_block(byv, sidev)
        take_idx = pa.array(np.where(last_r >= 0, last_r, 0), type=pa.int64())
        matched = b["__rval"].take(take_idx)
        if isinstance(matched, pa.ChunkedArray):
            matched = matched.combine_chunks()
        matched = pc.if_else(pa.array(last_r < 0),
                             pa.nulls(b.num_rows, type=val_type), matched)
        unresolved = (sidev == 1) & (last_r < 0)
        if unresolved.any():
            cmap = ray.get(carry_ref)
            onv = b[on].to_numpy(zero_copy_only=False)
            u = np.flatnonzero(unresolved)
            # group unresolved lefts by key (they're contiguous per key in
            # the sorted block) and binary-search each key's timeline once
            ub = byv[u]
            kb = key_runs(ub)
            pieces = []
            for i in range(len(kb) - 1):
                lo, hi = kb[i], kb[i + 1]
                entry = cmap.get(ub[lo])
                if entry is None:
                    pieces.append(pa.nulls(hi - lo, type=val_type))
                    continue
                c_on, c_val = entry
                pos = np.searchsorted(c_on, onv[u[lo:hi]], side="right") - 1
                found = pos >= 0
                take = pa.array(np.where(found, pos, 0), type=pa.int64())
                vals = c_val.take(take)
                if isinstance(vals, pa.ChunkedArray):
                    vals = vals.combine_chunks()
                pieces.append(pc.if_else(
                    pa.array(~found), pa.nulls(hi - lo, type=val_type), vals))
            fills = pa.concat_arrays(
                [p if isinstance(p, pa.Array) else p.combine_chunks()
                 for p in pieces]) if pieces \
                else pa.nulls(0, type=val_type)
            # splice fills into matched at the unresolved slots
            repl = np.zeros(b.num_rows, dtype=bool)
            repl[u] = True
            src_idx = np.cumsum(repl) - 1  # unresolved rows take from fills
            fills_full = fills.take(pa.array(np.where(repl, src_idx, 0),
                                             type=pa.int64())) \
                if len(fills) else pa.nulls(b.num_rows, type=val_type)
            matched = pc.if_else(pa.array(repl), fills_full, matched)
        is_left = pa.array(sidev == 1)
        lb = b.filter(is_left)
        lv = matched.filter(is_left)
        return pa.table({**{f"l_{c}": lb[f"l_{c}"] for c in left_cols},
                         out_value_col: lv}).cast(out_schema)

    resolved = srt.map_batches(resolve_block, batch_size=None,
                               batch_format="pyarrow") \
                  .select_columns([f"l_{c}" for c in left_cols] + [out_value_col])
    # left rows with a NULL key / NULL on never entered the exchange; they
    # re-join the output here with the miss value
    resolved = resolved.union(
        left.map_batches(null_key_misses, batch_format="pyarrow"))
    return resolved.rename_columns({f"l_{c}": c for c in left_cols})
