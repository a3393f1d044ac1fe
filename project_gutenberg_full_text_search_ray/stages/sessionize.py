"""Distributed gap-based sessionization — the standard event-stream /
conversation-log windowed operator Ray Data lacks (task brief: "windowed
aggregate ... implement as a composition of map_batches + sort if semantics
allow").

Semantics: events ordered by (user, ts, id); a NEW session starts at a
user's first event or when the time since the user's previous event exceeds
``gap``.  ``session_id`` = the id of the session's FIRST event (stable,
joinable, deterministic under the total (user, ts, id) order).  Rows with a
NULL user or NULL ts are not sessionizable and come back with
``session_id = NULL`` (SQL window-partition semantics would lump NULL users
into one bogus partition).

Shape (the as-of join's summary pattern, stages/asof.py): ONE global
``sort((user, ts, id))`` exchange, then two vectorized passes over the
materialized sorted blocks:

  1. summarize — ONE row per block (first/last user+ts+id, the last event's
     in-block session start, and a "single unbroken chain" flag).  The
     driver orders the per-block rows (the sort made block ranges disjoint,
     so ordering by the first row's key reconstructs block order) and walks
     them once: whenever a block's first event continues the previous
     block's last session (same user, gap not exceeded), it records
     first_event_id → inherited session start — sessions spanning ANY number
     of blocks resolve through the chain walk.  The collected state is one
     row per block: O(blocks), never O(rows).
  2. resolve — per block, a vectorized break-scan assigns in-block session
     starts; the block's HEAD segment (rows before the first in-block break)
     takes the inherited id from the broadcast fixup map when present.

Partitioning assumption: none beyond "the per-block summary table fits on
the driver" (one short row per block)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ..functions.arrowutil import table_refs


def _block_sessions(users: np.ndarray, ts: np.ndarray, ids: np.ndarray,
                    gap_us: int):
    """Vectorized in-block pass over (user, ts, id)-sorted rows → (session
    start id per row, index of the first break > 0 or n, single_chain)."""
    n = len(users)
    newsess = np.empty(n, dtype=bool)
    newsess[0] = True
    if n > 1:
        user_change = users[1:] != users[:-1]
        gap_break = (ts[1:] - ts[:-1]) > gap_us
        newsess[1:] = user_change | gap_break
    start_idx = np.maximum.accumulate(
        np.where(newsess, np.arange(n, dtype=np.int64), np.int64(-1)))
    sess = ids[start_idx]
    breaks = np.flatnonzero(newsess[1:])  # break positions (index-1 space)
    head_end = int(breaks[0]) + 1 if len(breaks) else n
    return sess, head_end, len(breaks) == 0


def sessionize(
    ds: rd.Dataset, user_col: str, ts_col: str, id_col: str, *,
    gap_us: int,
) -> rd.Dataset:
    """(id, user, session_id) per event; see module docstring."""
    id_type = ds.schema().base_schema.field(id_col).type
    user_type = ds.schema().base_schema.field(user_col).type

    def _valid(b: pa.Table):
        return pc.and_(pc.is_valid(b[user_col]), pc.is_valid(b[ts_col]))

    def keep_valid(b: pa.Table) -> pa.Table:
        return b.select([id_col, user_col, ts_col]).filter(_valid(b))

    srt = (ds.map_batches(keep_valid, batch_format="pyarrow")
           .sort([user_col, ts_col, id_col]).materialize())

    def _np(b: pa.Table, col: str) -> np.ndarray:
        v = b[col]
        if pa.types.is_timestamp(v.type):
            # normalize to MICROSECONDS before the raw-tick cast: gap_us
            # compares µs, so a timestamp[s]/[ms]/[ns] column must not leak
            # its native tick unit into the gap comparison
            if v.type.unit != "us":
                v = v.cast(pa.timestamp("us", tz=v.type.tz))
            v = v.cast(pa.int64())
        return np.asarray(v.to_numpy(zero_copy_only=False))

    # ---- pass 1: one summary row per block
    sum_schema = pa.schema([
        ("first_user", user_type), ("first_ts", pa.int64()), ("first_id", id_type),
        ("last_user", user_type), ("last_ts", pa.int64()), ("last_sess", id_type),
        ("single_chain", pa.bool_()),
    ])

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return sum_schema.empty_table()
        users, ts, ids = _np(b, user_col), _np(b, ts_col), _np(b, id_col)
        sess, _, single = _block_sessions(users, ts, ids, gap_us)
        return pa.table({
            "first_user": pa.array([users[0]], type=user_type),
            "first_ts": pa.array([int(ts[0])], type=pa.int64()),
            "first_id": pa.array([ids[0]], type=id_type),
            "last_user": pa.array([users[-1]], type=user_type),
            "last_ts": pa.array([int(ts[-1])], type=pa.int64()),
            "last_sess": pa.array([sess[-1]], type=id_type),
            "single_chain": pa.array([bool(single)]),
        })

    stabs = [t for t in ray.get(table_refs(
        srt.map_batches(summarize, batch_size=None,
                        batch_format="pyarrow")))
        if t.num_rows and "first_id" in t.column_names]
    fix: dict = {}
    if stabs:
        summ = pa.concat_tables(stabs)
        order = pc.sort_indices(summ, sort_keys=[
            ("first_user", "ascending"), ("first_ts", "ascending"),
            ("first_id", "ascending")])
        summ = summ.take(order).to_pylist()
        cur_user = cur_last_ts = cur_sess = None
        for s in summ:
            inherited = (cur_user is not None
                         and s["first_user"] == cur_user
                         and s["first_ts"] - cur_last_ts <= gap_us)
            if inherited:
                # key by the block's FIRST full sort key, not first_id
                # alone: blocks are disjoint ranges of the (user, ts, id)
                # total order, so the triple is unique per block, while a
                # bare id need not be globally unique (duplicate_spans
                # passes __pid = token position, reused across documents)
                fix[(s["first_user"], s["first_ts"], s["first_id"])] = cur_sess
            # the block's LAST session start is inherited only when the
            # whole block is one unbroken chain continuing the previous one
            last_sess = cur_sess if (inherited and s["single_chain"]) \
                else s["last_sess"]
            cur_user, cur_last_ts, cur_sess = \
                s["last_user"], s["last_ts"], last_sess
    fix_ref = ray.put(fix)

    out_schema = pa.schema([(id_col, id_type), (user_col, user_type),
                            ("session_id", id_type)])

    # ---- pass 2: in-block assignment + inherited head segment
    def resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        users, ts, ids = _np(b, user_col), _np(b, ts_col), _np(b, id_col)
        sess, head_end, _ = _block_sessions(users, ts, ids, gap_us)
        fmap = ray.get(fix_ref)

        def _py(v):
            return v.item() if hasattr(v, "item") else v

        inherited = fmap.get((_py(users[0]), int(ts[0]), _py(ids[0])))
        if inherited is not None:
            sess = sess.copy()
            sess[:head_end] = inherited
        return pa.table({id_col: pa.array(ids, type=id_type),
                         user_col: b[user_col],
                         "session_id": pa.array(sess, type=id_type)})

    resolved = srt.map_batches(resolve, batch_size=None, batch_format="pyarrow")

    def null_rows(b: pa.Table) -> pa.Table:
        nb = b.filter(pc.invert(pc.fill_null(_valid(b), False)))
        return pa.table({id_col: nb[id_col], user_col: nb[user_col],
                         "session_id": pa.nulls(nb.num_rows, type=id_type)})

    return resolved.union(ds.map_batches(null_rows, batch_format="pyarrow"))
