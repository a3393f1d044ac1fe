"""Pathological corpus shapes through the FULL pipeline: nulls, empty text,
unicode, huge docs, single tokens — build + search must stay rank-identical
to the oracle."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def weird_engine_and_oracle(ray_session, tmp_path_factory):
    from project_gutenberg_full_text_search_ray import TRANSCRIPTS_SPEC, FullTextSearchEngine, build_index
    from project_gutenberg_full_text_search_ray.oracle import BruteForceOracle

    rows = []
    texts = [
        None,
        "",
        "   \t\n  ",
        "one",
        "émigré café naïve — unicode only: 中文内容 и кириллица",
        "mixed ascii42 and 中文 words here",
        "repeat " * 5000 + "needle",          # huge doc (10k tokens)
        "a b c d e f g h i j",
        "UPPER CASE ONLY TEXT",
        "punctuation!!! ??? ,,, ... ;;; :::",
        "hyphen-ated and under_scored and dot.ted",
        "99 bottles of 99 problems 99",
        "needle in this one too",
        "the the the the the",                # pure repetition
    ]
    for i, t in enumerate(texts):
        rows.append({
            "conv_id": f"weird-{i:04d}", "turn_idx": 0, "role": "user",
            "text": t, "tool": None, "ts": 1_767_225_600_000_000 + i,
        })
    table = pa.table({
        "conv_id": pa.array([r["conv_id"] for r in rows]),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], type=pa.int32()),
        "role": pa.array([r["role"] for r in rows]),
        "text": pa.array([r["text"] for r in rows], type=pa.string()),
        "tool": pa.array([r["tool"] for r in rows], type=pa.string()),
        "ts": pa.array([r["ts"] for r in rows], type=pa.timestamp("us")),
    })
    d = tmp_path_factory.mktemp("weird")
    src = str(d / "corpus.parquet")
    pq.write_table(table, src, row_group_size=4)
    idx = str(d / "idx")
    build_index(src, TRANSCRIPTS_SPEC, idx, docs_per_segment=8,
                min_segments=4, min_rows_per_segment=4)
    eng = FullTextSearchEngine(idx)
    oracle = BruteForceOracle(table, TRANSCRIPTS_SPEC)
    return eng, oracle


QUERIES = [
    "needle",
    "one",
    "the",
    "repeat needle",
    "中文",                       # multi-byte chars are separators → no token
    "ascii42",
    "caf or nai",                # unicode-split fragments
    '"needle in this"',
    "99",
    "under or dot",
    "case -problems",
]


@pytest.mark.parametrize("qs", QUERIES)
def test_pathological_rank_identity(weird_engine_and_oracle, qs):
    eng, oracle = weird_engine_and_oracle
    res = eng.execute(eng.query().search(qs)[1, 20])
    exp = oracle.search([qs], page_size=20)
    assert res.total == exp.total, qs
    got = list(zip(res.table["conv_id"].to_pylist(), res.table["turn_idx"].to_pylist()))
    assert got == [(r["conv_id"], r["turn_idx"]) for r in exp.rows], qs
    assert res.table["score"].to_pylist() == pytest.approx(
        [r["score"] for r in exp.rows], rel=1e-12, abs=1e-12
    ), qs


def test_pathological_stats(weird_engine_and_oracle):
    eng, oracle = weird_engine_and_oracle
    assert eng.n_docs == oracle.n_docs == 14
    assert abs(eng.avgdl - oracle.avgdl) < 1e-9
