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

from ..functions.arrowutil import concat_cast, run_starts_sorted


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

    parts = ray.get(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs())
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
    tabs = [t for t in ray.get(agg_ds.to_arrow_refs())
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
