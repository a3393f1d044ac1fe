"""Grouped top-k — keep the best ``k`` rows per group (quality-score
selection per domain/language, "top N longest", etc.), an operator Ray Data
has no built-in for.

Shape (combiner, no all-to-all): each block contributes at most
``k × (groups present in the block)`` candidate rows — a vectorized
sort + per-group head inside ``map_batches`` — and the driver folds the
collected candidates with the same sort+head.  The exchange therefore
carries candidates only (≤ blocks × groups × k rows), never the corpus.

Partitioning assumption: the FOLDED candidate set (groups × k × blocks)
fits on the driver — true for enum-like group columns (the intended use).
For corpus-cardinality group columns, the same per-block partial feeds a
``groupby(group).map_groups`` fold instead; that variant is deliberately
not the default because per-group Python calls are the pattern this repo
avoids (BASELINE.md, pack_sequences r3 lesson).

Determinism: total order is (group ASC, order_col DESC|ASC, id ASC) — ties
on the order column cut identically everywhere, which the DuckDB
row_number() oracle (driver_api.q_topk_per_lang) depends on.

Both kernels are Arrow/numpy-native end to end (no pandas round trips):
the per-group head is one table sort + run-boundary rank filter, and the
quantile fold is one global cumsum + searchsorted over the sorted
(group, value) aggregate — cum counts are strictly increasing after the
``c > 0`` filter, so one global searchsorted lands inside the right
group's run without any per-group slicing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.arrowutil import concat_cast, run_starts_sorted, table_refs


def _head_per_group(t: pa.Table, group_col: str, order_col: str,
                    id_col: str, k: int, descending: bool) -> pa.Table:
    """First ``k`` rows per group under the total order (group ASC nulls
    last, order_col DESC|ASC, id ASC) — one sort, one vectorized rank
    filter, no per-group Python."""
    if t.num_rows == 0:
        return t
    srt = t.sort_by([
        (group_col, "ascending"),
        (order_col, "descending" if descending else "ascending"),
        (id_col, "ascending"),
    ])
    starts = run_starts_sorted(srt[group_col])
    run_len = np.diff(np.append(starts, srt.num_rows))
    rank = np.arange(srt.num_rows, dtype=np.int64) - np.repeat(starts, run_len)
    return srt.filter(pa.array(rank < k))


def grouped_topk(
    ds: rd.Dataset, group_col: str, order_col: str, id_col: str, *,
    k: int, descending: bool = True,
) -> pa.Table:
    """Top ``k`` rows per ``group_col`` value ordered by ``order_col``
    (ties → smallest ``id_col``); NULL groups form their own group, rows
    with NULL ``order_col`` are dropped (SQL ORDER BY would sort them
    last/first by dialect — excluding them keeps both sides exact).
    Returns the result table sorted by (group, order, id)."""
    cols = [group_col, order_col, id_col]
    sch = ds.schema().base_schema
    schema = pa.schema([(c, sch.field(c).type) for c in cols])

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.select(cols).filter(pc.is_valid(b[order_col]))
        return _head_per_group(b, group_col, order_col, id_col, k, descending)

    parts = ray.get(table_refs(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")))
    return _head_per_group(concat_cast(parts, schema), group_col, order_col,
                           id_col, k, descending)


def grouped_quantiles(
    ds: rd.Dataset, group_col: str, val_col: str,
    qs: list[tuple[str, float]],
) -> pa.Table:
    """EXACT per-group quantiles (``percentile_disc`` semantics: smallest
    value whose cumulative in-group count ≥ ceil(q·n)) over a
    bounded-cardinality value column — the per-language length-distribution
    report a training-mix audit runs.

    Shape (combiner, same as the global ``quantiles`` driver query this
    generalizes): per-batch ``(group, value) → count`` partials → ONE
    distinct-(group, value)-sized ``groupby().sum()`` → driver-side cumsum
    per group over the tiny aggregate.  The exchange is
    O(groups × distinct values), never O(rows).

    NULL values are dropped like ``quantile_disc``; NULL groups form their
    own group.  Returns ``(group_col, pct, val)`` sorted by (group, pct)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    gtype = ds.schema().base_schema.field(group_col).type
    vtype = ds.schema().base_schema.field(val_col).type
    part_schema = pa.schema([(group_col, gtype), (val_col, vtype),
                             ("c", pa.int64())])

    def counts(b: pa.Table) -> pa.Table:
        t = b.select([group_col, val_col]).filter(pc.is_valid(b[val_col]))
        part = t.group_by([group_col, val_col]).aggregate([([], "count_all")])
        # result columns picked BY NAME — pyarrow group_by output order is
        # version-dependent; the cast keeps all-NULL/empty batches
        # schema-stable (no null-typed blocks into the groupby)
        out = pa.table({group_col: part[group_col], val_col: part[val_col],
                        "c": part["count_all"]}).cast(part_schema)
        # marker row (group, NULL, 0) per distinct group in the batch: a
        # group whose values are ALL NULL must still surface with a NULL
        # quantile (SQL GROUP BY semantics)
        groups = pc.unique(b[group_col])
        markers = pa.table({
            group_col: groups.cast(gtype),
            val_col: pa.nulls(len(groups), type=vtype),
            "c": pa.array([0] * len(groups), type=pa.int64()),
        })
        return pa.concat_tables([out, markers])

    agg_ds = (
        ds.select_columns([group_col, val_col])
        .map_batches(counts, batch_format="pyarrow")
        .groupby([group_col, val_col]).aggregate(Sum("c", alias_name="c"))
    )
    # concat_cast, NOT a plain concat: Ray's sort-based aggregate can emit
    # a partition holding only the all-NULL marker rows, whose value column
    # comes back null-typed — the r4 driver failure at num_cpus=32
    tabs = [t for t in ray.get(table_refs(agg_ds))
            if t.num_rows and "c" in t.column_names]
    empty = pa.table({group_col: pa.array([], type=gtype),
                      "pct": pa.array([], type=pa.string()),
                      "val": pa.array([], type=vtype)})
    if not tabs:
        return empty
    agg = concat_cast(tabs, part_schema)
    data = agg.filter(pc.greater(agg["c"], 0)).sort_by(
        [(group_col, "ascending"), (val_col, "ascending")])
    all_groups = pc.unique(agg[group_col].combine_chunks()).to_pylist()
    # one global cumsum: counts are strictly positive after the filter, so
    # cum is strictly increasing and a single searchsorted per (group, q)
    # resolves inside the right group's run — no per-group slicing
    cnt = data["c"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(cnt, dtype=np.int64)
    starts = run_starts_sorted(data[group_col])
    ends = np.append(starts[1:], data.num_rows)
    base = np.where(starts > 0, cum[starts - 1], 0) if len(starts) else starts
    totals = (cum[ends - 1] - base) if len(starts) else base
    vals_v = data[val_col].to_pylist()   # distinct values only (bounded)
    run_of = {vals_v_g: r for r, vals_v_g in
              enumerate(data[group_col].take(pa.array(starts)).to_pylist())}
    out_g, out_p, out_v = [], [], []
    for g in all_groups:
        r = run_of.get(g)
        n = int(totals[r]) if r is not None else 0
        for name, q in qs:
            out_g.append(g)
            out_p.append(name)
            if n == 0:  # all-NULL group → NULL quantile, like quantile_disc
                out_v.append(None)
                continue
            rank = max(1, int(np.ceil(q * n)))
            i = int(np.searchsorted(cum, int(base[r]) + rank, side="left"))
            out_v.append(vals_v[i])
    res = pa.table({group_col: pa.array(out_g, type=gtype),
                    "pct": pa.array(out_p, type=pa.string()),
                    "val": pa.array(out_v, type=vtype)})
    return res.sort_by([(group_col, "ascending"), ("pct", "ascending")])



def _hist_geometry(spans: list, n_buckets: int, exact_span: int):
    """Per-interval histogram geometry for one refinement pass:
    ``[(lo, hi)] → (widths, n_buckets_i, bases, total)``.  Width 1 once the
    span fits ``exact_span`` (that pass is exact); all arithmetic in Python
    ints — a full-int64 span overflows int64."""
    widths, nbs, bases = [], [], []
    base = 0
    for lo, hi in spans:
        span = hi - lo + 1
        w = 1 if span <= exact_span else -(-span // n_buckets)
        nb = -(-span // w)
        widths.append(w)
        nbs.append(nb)
        bases.append(base)
        base += nb
    return widths, nbs, bases, base


def _interval_select(v: np.ndarray, los: np.ndarray, his: np.ndarray):
    """Assign each value to its row in the SORTED, DISJOINT interval
    arrays, dropping values outside every interval → (v_kept, idx_kept)."""
    idx = np.searchsorted(los, v, side="right") - 1
    ok = (idx >= 0) & (v <= his[np.clip(idx, 0, len(his) - 1)])
    return v[ok], idx[ok]


def _bin_values(v: np.ndarray, idx: np.ndarray, los: np.ndarray,
                widths: np.ndarray, bases: np.ndarray) -> np.ndarray:
    """Global bucket ids for values assigned to interval rows.  Wraparound-
    exact unsigned distance: (v - lo) mod 2^64 is the true offset for ANY
    int64 pair, even across a full-range span."""
    d = (v - los[idx]).view(np.uint64)
    return bases[idx] + (d // widths[idx]).astype(np.int64)


def _descend_ranks(cum: np.ndarray, rk: list, lo: int, hi: int, w: int):
    """One refinement step: each (name, rank) picks the first bucket whose
    cumulative count reaches it → (name, new_lo, new_hi, new_rank)."""
    out = []
    for name, r in rk:
        j = int(np.searchsorted(cum, r, side="left"))
        out.append((name, lo + j * w, min(hi, lo + (j + 1) * w - 1),
                    r - (int(cum[j - 1]) if j > 0 else 0)))
    return out


def quantiles_unbounded(
    ds: rd.Dataset, val_col: str, qs: list[tuple[str, float]], *,
    n_buckets: int = 8192, exact_span: int = 1 << 16, max_passes: int = 12,
) -> pa.Table:
    """EXACT ``percentile_disc`` quantiles over an UNBOUNDED-cardinality
    integer column — the classic distributed-median algorithm (iterative
    histogram refinement), where the value-count combiner behind
    ``grouped_quantiles`` / the global ``quantiles`` query would shuffle
    O(distinct values).

    Each pass streams the (column-pruned) dataset once and exchanges only
    O(active intervals × n_buckets) ``(bucket, count)`` rows: histogram the
    values falling in each quantile's current candidate interval, cumsum on
    the driver, descend every rank into its bucket.  Interval spans shrink
    ×``n_buckets`` per pass, so int64's full range resolves in
    ≤ ⌈64 / log2(n_buckets)⌉ + 1 passes; once a span is ≤ ``exact_span``
    the next pass histograms at width 1 and the rank's bucket IS the exact
    answer.  Nothing corpus-sized ever reaches the driver and there is no
    sort — at 100 TB this is ~5 column-pruned scans, each cheaper than the
    single all-to-all a distributed sort-based quantile would pay.

    NULLs are dropped (``quantile_disc`` semantics); empty input → NULL
    values.  Non-integer columns must be projected to int64 by the caller
    (e.g. prices → cents) — raises on float columns rather than silently
    binning inexactly.  Returns ``(pct, val)`` sorted by pct, val int64.
    """
    vtype = ds.schema().base_schema.field(val_col).type
    if not pa.types.is_integer(vtype) or vtype == pa.uint64():
        raise TypeError(
            f"quantiles_unbounded needs an integer column representable in int64 "
            f"(got {vtype}): project to int64 first (e.g. prices → cents) "
            f"so refinement stays exact — uint64 values ≥ 2^63 would wrap "
            f"negative in the int64 kernels and sort wrong silently")
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    src = ds.select_columns([val_col])

    # ---- pass 0: global min / max / non-null count (O(blocks) exchange)
    def minmax(b: pa.Table) -> pa.Table:
        col = pc.drop_null(b[val_col])
        if len(col) == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lo": pa.array([int(v.min())], type=pa.int64()),
                         "hi": pa.array([int(v.max())], type=pa.int64()),
                         "n": pa.array([len(v)], type=pa.int64())})

    mm_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                           ("n", pa.int64())])
    mm = concat_cast(
        ray.get(table_refs(src.map_batches(minmax, batch_format="pyarrow"))),
        mm_schema)
    n = int(pc.sum(mm["n"]).as_py() or 0)
    if n == 0:
        return pa.table({"pct": pa.array([name for name, _ in qs]),
                         "val": pa.nulls(len(qs), type=pa.int64())})
    glo = int(pc.min(mm["lo"]).as_py())
    ghi = int(pc.max(mm["hi"]).as_py())

    # intervals: disjoint [lo, hi] candidate ranges, each carrying the
    # (name, local_rank) pairs whose answer lies inside it; all bounds are
    # Python ints (a full-int64 span overflows int64 arithmetic)
    intervals = [(glo, ghi,
                  [(name, max(1, int(np.ceil(q * n)))) for name, q in qs])]
    resolved: dict[str, int] = {}
    hist_schema = pa.schema([("bkt", pa.int64()), ("c", pa.int64())])

    for _ in range(max_passes):
        live = [(lo, hi, rk) for lo, hi, rk in intervals if lo < hi]
        for lo, hi, rk in intervals:
            if lo == hi:
                for name, _r in rk:
                    resolved[name] = lo
        if not live:
            break
        live.sort(key=lambda t: t[0])
        widths_py, nb_py, bases_py, total = _hist_geometry(
            [(lo, hi) for lo, hi, _ in live], n_buckets, exact_span)
        los = np.array([lo for lo, _, _ in live], dtype=np.int64)
        his = np.array([hi for _, hi, _ in live], dtype=np.int64)
        widths = np.array(widths_py, dtype=np.uint64)
        bases = np.array(bases_py, dtype=np.int64)

        def hist(b: pa.Table, los=los, his=his, widths=widths, bases=bases,
                 total=total) -> pa.Table:
            col = pc.drop_null(b[val_col])
            if len(col) == 0:
                return hist_schema.empty_table()
            v, idx = _interval_select(
                col.to_numpy(zero_copy_only=False).astype(np.int64),
                los, his)
            if len(v) == 0:
                return hist_schema.empty_table()
            cnt = np.bincount(_bin_values(v, idx, los, widths, bases),
                              minlength=total)
            nz = np.flatnonzero(cnt)
            return pa.table({"bkt": pa.array(nz, type=pa.int64()),
                             "c": pa.array(cnt[nz], type=pa.int64())})

        agg = (src.map_batches(hist, batch_format="pyarrow")
               .groupby("bkt").aggregate(Sum("c", alias_name="c")))
        t = concat_cast([b for b in ray.get(table_refs(agg))
                         if b.num_rows], hist_schema)
        cnt = np.zeros(total, dtype=np.int64)
        cnt[t["bkt"].to_numpy(zero_copy_only=False)] = \
            t["c"].to_numpy(zero_copy_only=False)

        nxt: dict[tuple[int, int], list[tuple[str, int]]] = {}
        for (lo, hi, rk), w, nb, b0 in zip(live, widths_py, nb_py, bases_py):
            cum = np.cumsum(cnt[b0:b0 + nb])
            for name, nlo, nhi, nr in _descend_ranks(cum, rk, lo, hi, w):
                nxt.setdefault((nlo, nhi), []).append((name, nr))
        intervals = [(lo, hi, rk) for (lo, hi), rk in nxt.items()]
    for lo, hi, rk in intervals:  # span-1 leftovers from the final pass
        if lo == hi:
            for name, _r in rk:
                resolved.setdefault(name, lo)
    if any(name not in resolved for name, _ in qs):
        raise RuntimeError(
            f"quantiles_unbounded did not converge in {max_passes} passes "
            f"(span {ghi - glo + 1}, n_buckets {n_buckets}) — raise "
            f"max_passes or n_buckets")

    names = [name for name, _ in qs]
    return pa.table({
        "pct": pa.array(names, type=pa.string()),
        "val": pa.array([resolved[name] for name in names], type=pa.int64()),
    }).sort_by([("pct", "ascending")])


def grouped_quantiles_unbounded(
    ds: rd.Dataset, group_col: str, val_col: str,
    qs: list[tuple[str, float]], *,
    n_buckets: int = 8192, exact_span: int = 1 << 16, max_passes: int = 12,
) -> pa.Table:
    """PER-GROUP :func:`quantiles_unbounded`: exact ``percentile_disc`` per
    group over an UNBOUNDED-cardinality integer value column — the missing
    quadrant between :func:`grouped_quantiles` (bounded values, any-ish
    groups) and :func:`quantiles_unbounded` (unbounded values, no groups).
    Per-language timestamp/price percentiles at corpus scale run here.

    Same iterative histogram refinement, with every group's candidate
    intervals packed into ONE shared bucket space per pass: each streaming
    pass histograms all groups' live intervals at once (O(groups ×
    intervals × n_buckets) ``(bucket, count)`` exchange), the driver
    descends every (group, quantile) rank independently.  Pass count is
    driven by the WIDEST group's span — groups resolve independently and
    drop out of later passes as they finish.

    Group cardinality must be bounded (enum-like — the ``grouped_topk`` /
    ``grouped_quantiles`` contract); the per-batch kernel loops over groups
    PRESENT IN THE BATCH (vectorized within each group).  NULL groups form
    their own group; NULL values drop like ``quantile_disc``; a group whose
    values are all NULL gets NULL quantiles.  Returns
    ``(group_col, pct, val)`` sorted by (group, pct), val int64."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    gtype = ds.schema().base_schema.field(group_col).type
    vtype = ds.schema().base_schema.field(val_col).type
    if not pa.types.is_integer(vtype) or vtype == pa.uint64():
        raise TypeError(
            f"grouped_quantiles_unbounded needs an integer "
            f"value column representable in int64 (got {vtype}): project to int64 first so "
            f"refinement stays exact (uint64 ≥ 2^63 would wrap negative)")

    src = ds.select_columns([group_col, val_col])
    names = [name for name, _ in qs]

    # ---- pass 0: per-group min / max / non-null count (+ all-NULL-group
    # markers so such groups still surface, like grouped_quantiles)
    mm_schema = pa.schema([(group_col, gtype), ("lo", pa.int64()),
                          ("hi", pa.int64()), ("n", pa.int64())])

    def gminmax(b: pa.Table) -> pa.Table:
        t = b.select([group_col, val_col]).filter(pc.is_valid(b[val_col]))
        part = t.group_by([group_col]).aggregate(
            [(val_col, "min"), (val_col, "max"), ([], "count_all")])
        out = pa.table({
            group_col: part[group_col],
            "lo": part[f"{val_col}_min"].cast(pa.int64()),
            "hi": part[f"{val_col}_max"].cast(pa.int64()),
            "n": part["count_all"],
        }).cast(mm_schema)
        marker_groups = pc.unique(b[group_col])
        markers = pa.table({
            group_col: marker_groups.cast(gtype),
            "lo": pa.nulls(len(marker_groups), type=pa.int64()),
            "hi": pa.nulls(len(marker_groups), type=pa.int64()),
            "n": pa.array([0] * len(marker_groups), type=pa.int64()),
        })
        return pa.concat_tables([out, markers])

    mm = concat_cast(
        ray.get(table_refs(src.map_batches(gminmax, batch_format="pyarrow"))),
        mm_schema)
    # driver fold over the tiny (groups × blocks) partial table
    stats: dict = {}
    g_list = mm[group_col].to_pylist()
    lo_list, hi_list, n_list = (mm["lo"].to_pylist(), mm["hi"].to_pylist(),
                                mm["n"].to_pylist())
    for g, lo, hi, nn in zip(g_list, lo_list, hi_list, n_list):
        cur = stats.setdefault(g, [None, None, 0])
        if lo is not None:
            cur[0] = lo if cur[0] is None else min(cur[0], lo)
            cur[1] = hi if cur[1] is None else max(cur[1], hi)
        cur[2] += int(nn)
    groups = sorted(stats, key=lambda g: (g is None, g))

    # (group slot, qname) → value; all-NULL groups resolve to NULL now
    resolved: dict[tuple[int, str], int | None] = {}
    # live refinement state: slot → [(lo, hi, [(qname, local_rank)])]
    state: dict[int, list] = {}
    for s, g in enumerate(groups):
        glo, ghi, n_g = stats[g]
        if n_g == 0:
            for name in names:
                resolved[(s, name)] = None
            continue
        state[s] = [(glo, ghi,
                     [(name, max(1, int(np.ceil(q * n_g))))
                      for name, q in qs])]

    # non-null group lookup array for pc.index_in; NULL group → its slot
    nn_groups = [g for g in groups if g is not None]
    nn_slots = np.array([groups.index(g) for g in nn_groups], dtype=np.int64)
    null_slot = groups.index(None) if None in groups else -1
    gset = pa.array(nn_groups, type=gtype)
    hist_schema = pa.schema([("bkt", pa.int64()), ("c", pa.int64())])

    for _ in range(max_passes):
        live: list = []   # (slot, lo, hi, ranks)
        for s in list(state):
            still = []
            for lo, hi, rk in state[s]:
                if lo == hi:
                    for name, _r in rk:
                        resolved[(s, name)] = lo
                else:
                    still.append((lo, hi, rk))
            if still:
                state[s] = still
            else:
                del state[s]
        if not state:
            break
        for s in sorted(state):
            for lo, hi, rk in sorted(state[s], key=lambda t: t[0]):
                live.append((s, lo, hi, rk))
        # flattened per-interval geometry + per-slot sub-ranges for the
        # batch kernel's per-group searchsorted
        widths_py, nb_py, bases_py, total = _hist_geometry(
            [(lo, hi) for _s, lo, hi, _rk in live], n_buckets, exact_span)
        los = np.array([lo for _, lo, _, _ in live], dtype=np.int64)
        his = np.array([hi for _, _, hi, _ in live], dtype=np.int64)
        widths = np.array(widths_py, dtype=np.uint64)
        bases = np.array(bases_py, dtype=np.int64)
        slot_rng = {}   # slot → (first interval row, last+1) in the arrays
        for i, (s, _, _, _) in enumerate(live):
            if s not in slot_rng:
                slot_rng[s] = [i, i + 1]
            else:
                slot_rng[s][1] = i + 1
        slot_rng = {s: tuple(v) for s, v in slot_rng.items()}

        def hist(b: pa.Table, los=los, his=his, widths=widths, bases=bases,
                 total=total, slot_rng=slot_rng) -> pa.Table:
            t = b.filter(pc.is_valid(b[val_col]))
            if t.num_rows == 0:
                return hist_schema.empty_table()
            gcol = t[group_col]
            slot_arr = pc.index_in(gcol, value_set=gset).to_numpy(
                zero_copy_only=False)
            # index_in yields null BOTH for NULL groups and for values not
            # in gset (the latter is unreachable — pass 0 enumerated every
            # group — but must never alias into the NULL group's histogram)
            miss = np.isnan(slot_arr) if slot_arr.dtype.kind == "f" else \
                np.zeros(len(slot_arr), dtype=bool)
            isnull = pc.is_null(gcol).to_numpy(zero_copy_only=False)
            slots = np.where(miss, -1, np.nan_to_num(slot_arr)).astype(
                np.int64)
            slots = np.where(slots >= 0, nn_slots[np.clip(slots, 0, None)]
                             if len(nn_slots) else slots,
                             np.where(isnull, null_slot, -1))
            v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cnt = np.zeros(total, dtype=np.int64)
            for s in np.unique(slots):
                rng = slot_rng.get(int(s))
                if rng is None:
                    continue
                i0, i1 = rng
                vs, idx = _interval_select(v[slots == s], los[i0:i1],
                                           his[i0:i1])
                if len(vs) == 0:
                    continue
                cnt += np.bincount(
                    _bin_values(vs, i0 + idx, los, widths, bases),
                    minlength=total)
            nz = np.flatnonzero(cnt)
            return pa.table({"bkt": pa.array(nz, type=pa.int64()),
                             "c": pa.array(cnt[nz], type=pa.int64())})

        agg = (src.map_batches(hist, batch_format="pyarrow")
               .groupby("bkt").aggregate(Sum("c", alias_name="c")))
        t = concat_cast([b for b in ray.get(table_refs(agg))
                         if b.num_rows], hist_schema)
        cnt = np.zeros(total, dtype=np.int64)
        cnt[t["bkt"].to_numpy(zero_copy_only=False)] = \
            t["c"].to_numpy(zero_copy_only=False)

        nxt: dict[int, dict] = {}
        for (s, lo, hi, rk), w, nb, b0 in zip(live, widths_py, nb_py,
                                              bases_py):
            cum = np.cumsum(cnt[b0:b0 + nb])
            for name, nlo, nhi, nr in _descend_ranks(cum, rk, lo, hi, w):
                nxt.setdefault(s, {}).setdefault((nlo, nhi), []).append(
                    (name, nr))
        state = {s: [(lo, hi, rk) for (lo, hi), rk in d.items()]
                 for s, d in nxt.items()}
    for s, ivs in state.items():   # span-1 leftovers from the final pass
        for lo, hi, rk in ivs:
            if lo == hi:
                for name, _r in rk:
                    resolved.setdefault((s, name), lo)
    if any((s, name) not in resolved
           for s in range(len(groups)) for name in names):
        raise RuntimeError(
            f"grouped_quantiles_unbounded did not converge in {max_passes} "
            f"passes — raise max_passes or n_buckets")

    out_g = [groups[s] for s in range(len(groups)) for _ in names]
    out_p = [name for _ in groups for name in names]
    out_v = [resolved[(s, name)]
             for s in range(len(groups)) for name in names]
    return pa.table({
        group_col: pa.array(out_g, type=gtype),
        "pct": pa.array(out_p, type=pa.string()),
        "val": pa.array(out_v, type=pa.int64()),
    }).sort_by([(group_col, "ascending"), ("pct", "ascending")])
