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
