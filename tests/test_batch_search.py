"""Batch multi-query evaluation == the single-query path, query by query."""

import os

import pytest


def test_batch_equals_individual(engine, tmp_path):
    from project_gutenberg_full_text_search_ray import RELEVANCE
    from project_gutenberg_full_text_search_ray.pipelines.batch_search import (
        batch_search_dataset,
        export_results_parquet,
        finalize_batch_results,
    )

    queries = {
        "fox": engine.query().search("the quick brown fox").order_by(RELEVANCE),
        "phrase": engine.query().search('"to be or not to be"').order_by(RELEVANCE),
        "boolean": engine.query().search("w00001 or w00002 -the").order_by(RELEVANCE),
        "nohit": engine.query().search("zzz_nonexistent").order_by(RELEVANCE),
    }
    ds = batch_search_dataset(engine, queries, k=25)
    batch = finalize_batch_results(engine, queries, ds, k=25)
    for name, q in queries.items():
        single_total, single_tbl = engine._run(q, k_override=25)
        assert batch[name].total == single_total, name
        a = batch[name].table.slice(0, 25)
        b = single_tbl.slice(0, 25)
        cols = sorted(set(a.column_names) & set(b.column_names))
        assert a.select(cols).equals(b.select(cols)), name

    out = str(tmp_path / "export")
    counts = export_results_parquet(engine, queries, out, k=25)
    assert counts["fox"] == batch["fox"].total
    assert os.path.exists(os.path.join(out, "query=fox", "part-0.parquet"))
