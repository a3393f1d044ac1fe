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
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _head_per_group(df: pd.DataFrame, group_col: str, order_col: str,
                    id_col: str, k: int, descending: bool) -> pd.DataFrame:
    df = df.sort_values([group_col, order_col, id_col],
                        ascending=[True, not descending, True],
                        kind="mergesort")
    return df.groupby(group_col, sort=False, dropna=False).head(k)


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

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.select(cols).filter(pc.is_valid(b[order_col]))
        if b.num_rows == 0:
            return b
        out = _head_per_group(b.to_pandas(), group_col, order_col, id_col,
                              k, descending)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = [t for t in ray.get(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({c: pa.array([]) for c in cols})
    folded = _head_per_group(
        pa.concat_tables(parts, promote_options="permissive").to_pandas(),
        group_col, order_col, id_col, k, descending)
    return pa.Table.from_pandas(folded.reset_index(drop=True),
                                preserve_index=False)


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
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    gtype = ds.schema().base_schema.field(group_col).type
    vtype = ds.schema().base_schema.field(val_col).type

    def counts(b: pa.Table) -> pa.Table:
        t = b.select([group_col, val_col]).filter(pc.is_valid(b[val_col]))
        part = (t.to_pandas().groupby([group_col, val_col], dropna=False)
                .size().rename("c").reset_index())
        out = pa.Table.from_pandas(part, preserve_index=False).cast(
            pa.schema([(group_col, gtype), (val_col, vtype), ("c", pa.int64())]))
        # marker row (group, NULL, 0) per distinct group in the batch: a
        # group whose values are ALL NULL must still surface with a NULL
        # quantile (SQL GROUP BY semantics) — and the explicit cast above
        # keeps all-NULL/empty batches schema-stable (no null-typed blocks
        # into the groupby)
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
    tabs = [t for t in ray.get(agg_ds.to_arrow_refs())
            if t.num_rows and "c" in t.column_names]
    empty = pa.table({group_col: pa.array([], type=gtype),
                      "pct": pa.array([], type=pa.string()),
                      "val": pa.array([], type=vtype)})
    if not tabs:
        return empty
    # the fold stays in ARROW: a pandas round trip would promote the
    # marker-NULLed value column to float64 and silently round int64
    # values above 2^53
    agg = (pa.concat_tables(tabs)
           .cast(pa.schema([(group_col, gtype), (val_col, vtype),
                            ("c", pa.int64())])))
    data = agg.filter(pc.greater(agg["c"], 0)).sort_by(
        [(group_col, "ascending"), (val_col, "ascending")])
    all_groups = agg[group_col].to_pylist()
    vals_g = data[group_col].to_pylist()
    vals_v = data[val_col].to_pylist()          # exact (python scalars)
    cnt = data["c"].to_numpy(zero_copy_only=False)
    out_g, out_p, out_v = [], [], []
    for g in sorted(set(all_groups), key=lambda x: (x is None, x)):
        rows = [j for j, gg in enumerate(vals_g) if gg == g]
        cum = np.cumsum(cnt[rows]) if rows else np.array([], dtype=np.int64)
        n = int(cum[-1]) if len(cum) else 0
        for name, q in qs:
            out_g.append(g)
            out_p.append(name)
            if n == 0:  # all-NULL group → NULL quantile, like quantile_disc
                out_v.append(None)
                continue
            rank = max(1, int(np.ceil(q * n)))
            i = int(np.searchsorted(cum, rank, side="left"))
            out_v.append(vals_v[rows[i]])
    res = pa.table({group_col: pa.array(out_g, type=gtype),
                    "pct": pa.array(out_p, type=pa.string()),
                    "val": pa.array(out_v, type=vtype)})
    return res.sort_by([(group_col, "ascending"), ("pct", "ascending")])
