"""Distributed AS-OF join — a custom operator Ray Data lacks (task brief:
"when the reference has an operator Ray Data lacks (as-of join, range join,
windowed aggregate), implement it as a composition of map_batches + sort if
semantics allow").

Semantics (backward, inclusive): for every LEFT row, attach the value of the
LAST RIGHT row with the same ``by`` key whose ``on`` value is ≤ the left
row's (ties broken by ``seq`` — largest wins; NULL when no right row
precedes).

Shape: ONE global ``sort((by, on, side, seq))`` exchange (rights sort before
lefts at equal timestamps → inclusive), then a fully vectorized per-block
forward-fill of the last-right index with per-key resets.  Keys whose rows
span block edges are re-emitted and resolved in a tiny collected fixup —
the same edge-key pattern as dedup candidate generation (edge rows ≈
2 × blocks × rows-per-key).  Partitioning assumption: a single ``by`` key's
timeline fits in memory (same assumption as any per-key window operator)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_SIDE = "__side"  # 0 = right, 1 = left
_TAG = "__edge"


def _asof_block(by: np.ndarray, side: np.ndarray, rval: np.ndarray,
                ) -> tuple[np.ndarray, np.ndarray]:
    """Rows sorted by (by, on, side, seq) → for each row, index of the last
    right row in its key at-or-before it (−1 = none).  Returns
    (last_right_row_index per row, key_start per row)."""
    n = len(by)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    key_first = np.empty(n, dtype=bool)
    key_first[0] = True
    np.not_equal(by[1:], by[:-1], out=key_first[1:])
    starts = np.flatnonzero(key_first)
    lens = np.diff(np.append(starts, n))
    key_start = np.repeat(starts, lens)
    r_idx = np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
    last_r = np.maximum.accumulate(r_idx)
    last_r = np.where(last_r >= key_start, last_r, np.int64(-1))
    return last_r, key_start


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
    on_type = lt.field(on).type
    by_type = lt.field(by).type
    val_type = right.schema().base_schema.field(right_value_col).type

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in (by, on)}
        cols[_SIDE] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        cols["__seq"] = pa.nulls(b.num_rows, type=pa.int64())
        cols["__rval"] = pa.nulls(b.num_rows, type=val_type)
        for c in left_cols:
            cols[f"l_{c}"] = b[c]
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in (by, on)}
        cols[_SIDE] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        cols["__seq"] = b[right_seq_col].cast(pa.int64())
        cols["__rval"] = b[right_value_col]
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(b.num_rows, type=lt.field(c).type)
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    srt = tagged.sort([by, on, _SIDE, "__seq"])

    out_schema = pa.schema(
        [(f"l_{c}", lt.field(c).type) for c in left_cols]
        + [(out_value_col, val_type), (_TAG, pa.bool_()),
           (by, by_type), (on, on_type), (_SIDE, pa.int8()),
           ("__seq", pa.int64()), ("__rval", val_type)]
    )

    def resolve_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        byv = b[by].to_numpy(zero_copy_only=False)
        sidev = b[_SIDE].to_numpy(zero_copy_only=False)
        edge = (byv == byv[0]) | (byv == byv[-1])
        last_r, _ = _asof_block(byv, sidev, None)
        rvals = b["__rval"]
        take_idx = pa.array(np.where(last_r >= 0, last_r, 0), type=pa.int64())
        matched = rvals.take(take_idx)
        if isinstance(matched, pa.ChunkedArray):
            matched = matched.combine_chunks()
        none_mask = pa.array(last_r < 0)
        matched = pc.if_else(none_mask, pa.nulls(b.num_rows, type=val_type), matched)
        is_left_inner = pa.array((sidev == 1) & ~edge)
        inner = b.filter(is_left_inner)
        inner_vals = matched.filter(is_left_inner)
        cols = {f"l_{c}": inner[f"l_{c}"] for c in left_cols}
        cols[out_value_col] = inner_vals
        cols[_TAG] = pa.array(np.zeros(inner.num_rows, dtype=bool))
        for c in (by, on, _SIDE, "__seq", "__rval"):
            cols[c] = inner[c]
        res = pa.table(cols).cast(out_schema)
        # edge rows (BOTH sides) re-emitted verbatim for the fixup
        eb = b.filter(pa.array(edge))
        ecols = {f"l_{c}": eb[f"l_{c}"] for c in left_cols}
        ecols[out_value_col] = pa.nulls(eb.num_rows, type=val_type)
        ecols[_TAG] = pa.array(np.ones(eb.num_rows, dtype=bool))
        for c in (by, on, _SIDE, "__seq", "__rval"):
            ecols[c] = eb[c]
        return pa.concat_tables([res, pa.table(ecols).cast(out_schema)])

    out = srt.map_batches(resolve_block, batch_format="pyarrow").materialize()
    resolved = out.map_batches(
        lambda b: b.filter(pc.equal(b[_TAG], pa.scalar(False))), batch_format="pyarrow"
    ).select_columns([f"l_{c}" for c in left_cols] + [out_value_col])

    # edge-key fixup: keys whose timeline spans block edges (collected; tiny)
    etabs = [t for t in ray.get(out.to_arrow_refs())
             if t.num_rows and _TAG in t.column_names]
    fix = (pa.concat_tables([t.filter(t[_TAG]) for t in etabs]) if etabs else None)
    if fix is not None and fix.num_rows:
        idx = pc.sort_indices(fix, sort_keys=[
            (by, "ascending"), (on, "ascending"), (_SIDE, "ascending"),
            ("__seq", "ascending")])
        fix = fix.take(idx)
        byv = fix[by].to_numpy(zero_copy_only=False)
        sidev = fix[_SIDE].to_numpy(zero_copy_only=False)
        last_r, _ = _asof_block(byv, sidev, None)
        take_idx = pa.array(np.where(last_r >= 0, last_r, 0), type=pa.int64())
        matched = fix["__rval"].take(take_idx)
        if isinstance(matched, pa.ChunkedArray):
            matched = matched.combine_chunks()
        matched = pc.if_else(pa.array(last_r < 0),
                             pa.nulls(fix.num_rows, type=val_type), matched)
        is_left = pa.array(sidev == 1)
        lf = fix.filter(is_left)
        lv = matched.filter(is_left)
        ftab = pa.table({**{f"l_{c}": lf[f"l_{c}"] for c in left_cols},
                         out_value_col: lv})
        resolved = resolved.union(rd.from_arrow(ftab))
    return resolved.rename_columns({f"l_{c}": c for c in left_cols})
