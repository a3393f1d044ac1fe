"""Batch query evaluation: N queries in ONE Dataset pass over the segments.

The reference serves one HTTP request at a time; a training-data pipeline
instead asks "run this query *set* over the corpus and hand me all result
sets" (relevance sweeps, eval harnesses, distillation mining).  Evaluating
every plan inside the same segment task amortizes the posting reads — each
segment's postings file is opened once for the union of all query terms — and
the output is a Dataset, so it can stream straight into ``write_parquet``
partitioned by query name (a resumable, per-query-directory sink).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.arrowutil import table_refs
from ..pipelines.search import SearchQuery, SearchResult, _merge_comparator_indices
from ..stages.segment_search import (
    SEG_ID_COL,
    SEG_TOTAL_COL,
    SearchPlan,
    search_segment,
)


QUERY_COL = "__query"


def batch_search_dataset(engine, queries: dict[str, SearchQuery], k: int = 100) -> rd.Dataset:
    """→ Dataset of per-segment top-k rows for every query, tagged with
    ``__query``.  Lazy; consume with finalize_batch_results / write_parquet."""
    from dataclasses import replace

    # uniform doc-store schema across the query set (outputs are concatenated)
    plans: dict[str, SearchPlan] = {
        name: replace(engine.build_plan(q, k), need_cols=None) for name, q in queries.items()
    }
    plans_ref = ray.put(plans)
    seg_dirs = dict(engine.seg_dirs)  # committed-generation paths

    if not plans:
        raise ValueError("batch_search_dataset: empty query set")

    def run_segment(batch: pa.Table) -> pa.Table:
        from ..stages.segment_build import limit_worker_arrow_threads

        limit_worker_arrow_threads()
        p = ray.get(plans_ref)
        outs = []
        for seg_id in batch["seg_id"].to_pylist():
            sd = seg_dirs[int(seg_id)]
            cache: dict = {}  # share postings/doc reads across the query set
            for name, plan in p.items():
                t = search_segment(sd, plan, cache=cache)
                t = t.append_column(QUERY_COL, pa.array([name] * t.num_rows, type=pa.string()))
                t = t.append_column(SEG_ID_COL, pa.array(np.full(t.num_rows, seg_id, dtype=np.int32)))
                outs.append(t)
        return pa.concat_tables(outs)

    segs = rd.from_items([{"seg_id": s} for s in engine.seg_ids])
    return segs.map_batches(run_segment, batch_format="pyarrow", batch_size=1)


def finalize_batch_results(
    engine, queries: dict[str, SearchQuery], ds: rd.Dataset, k: int = 100
) -> dict[str, SearchResult]:
    """Merge the per-segment partials into per-query top-k SearchResults.
    Same contract as single-query ``execute()``: the same merge comparator
    (rank identical), the query's crosswalk projection applied, and
    ``page_size`` reporting the actual row cap (k) rather than the paging
    default the batch path doesn't use."""
    from ..crosswalks import apply_crosswalk

    parts = [ray.get(r) for r in table_refs(ds)]
    parts = [p for p in parts if p.num_rows]
    merged_all = pa.concat_tables(parts) if parts else None
    out: dict[str, SearchResult] = {}
    for name, q in queries.items():
        # empty results get the SAME crosswalk projection as engine.execute()
        # (a raw doc-store-schema empty next to projected non-empties makes
        # the per-query parquet export unreadable as one dataset)
        empty = lambda: apply_crosswalk(engine._empty_result_table(),
                                        q.crosswalk, engine.spec,
                                        engine._custom_transformer)
        if merged_all is None:
            out[name] = SearchResult(0, 1, k, empty())
            continue
        sub = merged_all.filter(pc.equal(merged_all[QUERY_COL], name))
        if sub.num_rows == 0:
            out[name] = SearchResult(0, 1, k, empty())
            continue
        segsum = sub.group_by(SEG_ID_COL).aggregate([(SEG_TOTAL_COL, "max")])
        total = int(pc.sum(segsum[f"{SEG_TOTAL_COL}_max"]).as_py() or 0)
        sub = sub.drop_columns([QUERY_COL, SEG_ID_COL, SEG_TOTAL_COL])
        idx = _merge_comparator_indices(sub, q.order, engine.spec.id_cols)[:k]
        tbl = apply_crosswalk(sub.take(pa.array(idx)), q.crosswalk, engine.spec,
                              engine._custom_transformer)
        out[name] = SearchResult(total, 1, k, tbl)
    return out


def export_results_parquet(
    engine, queries: dict[str, SearchQuery], out_dir: str, k: int = 100
) -> dict[str, int]:
    """Run the batch and write one parquet directory per query (resumable
    layout: a re-run overwrites per-query partitions independently)."""
    import os

    import pyarrow.parquet as pq

    results = finalize_batch_results(engine, queries, batch_search_dataset(engine, queries, k), k)
    counts = {}
    for name, res in results.items():
        d = os.path.join(out_dir, f"query={name}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(res.table, os.path.join(d, "part-0.parquet"))
        counts[name] = res.total
    return counts
