"""Segment merge/compaction: fewer segments, identical search results."""

import glob
import os

import pytest


def test_compact_preserves_results(ray_session, transcripts_table, tmp_path):
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import FullTextSearchEngine, TRANSCRIPTS_SPEC, build_index
    from project_gutenberg_full_text_search_ray.pipelines.build import compact_index

    src = str(tmp_path / "corpus.parquet")
    pq.write_table(transcripts_table, src, row_group_size=200)  # 8 row groups
    src_idx = str(tmp_path / "src")
    out_idx = str(tmp_path / "compacted")
    info = build_index(src, TRANSCRIPTS_SPEC, src_idx,
                       docs_per_segment=200, min_segments=8)
    assert info.n_segments >= 3
    cinfo = compact_index(src_idx, out_idx, target_docs_per_segment=1600)
    assert cinfo.n_segments < info.n_segments
    assert cinfo.n_docs == info.n_docs

    e1 = FullTextSearchEngine(src_idx)
    e2 = FullTextSearchEngine(out_idx)
    assert abs(e1.avgdl - e2.avgdl) < 1e-9
    queries = [
        lambda e: e.query().search("the quick brown fox"),
        lambda e: e.query().search('"to be or not to be"'),
        lambda e: e.query().search("w00001 or w00002 -the"),
        lambda e: e.query().search("the").eq("role", "user"),
    ]
    for make in queries:
        r1 = e1.execute(make(e1)[1, 25])
        r2 = e2.execute(make(e2)[1, 25])
        assert r1.total == r2.total
        assert r1.table.equals(r2.table)
    # dictionary identical
    import pyarrow.parquet as pq

    d1 = pq.read_table(e1.dict_dir).sort_by("term")
    d2 = pq.read_table(e2.dict_dir).sort_by("term")
    assert d1.equals(d2)
