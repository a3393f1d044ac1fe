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


def test_batch_empty_result_gets_crosswalk_schema(engine, tmp_path):
    """A query matching nothing must come back in the SAME crosswalk
    projection as its non-empty siblings (engine.execute parity) so the
    per-query parquet export reads as one dataset."""
    from project_gutenberg_full_text_search_ray import RELEVANCE
    from project_gutenberg_full_text_search_ray.crosswalks import Crosswalk
    from project_gutenberg_full_text_search_ray.pipelines.batch_search import (
        batch_search_dataset,
        finalize_batch_results,
    )

    queries = {
        "hit": engine.query(Crosswalk.MINI).search("the").order_by(RELEVANCE),
        "miss": engine.query(Crosswalk.MINI).search("zzz_nonexistent").order_by(RELEVANCE),
    }
    ds = batch_search_dataset(engine, queries, k=5)
    batch = finalize_batch_results(engine, queries, ds, k=5)
    assert batch["miss"].total == 0 and batch["miss"].table.num_rows == 0
    assert batch["miss"].table.schema.names == batch["hit"].table.schema.names
    # engine.execute parity on the empty page
    single = engine.execute(queries["miss"][1, 5])
    assert batch["miss"].table.schema.names == single.table.schema.names
