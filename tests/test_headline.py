"""Headline/snippet generation (stages/headline.py + pipelines/search.headline):
vectorized kernel == naive per-row reference, Ray column stage, engine-level
top-k composition, ts_headline-style edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
from project_gutenberg_full_text_search_ray.stages.headline import (
    headline_batch,
    headline_column,
)


def naive_headline(text, terms, W, start_sel="<b>", stop_sel="</b>"):
    toks = DEFAULT_ANALYZER.tokenize(text or "")
    if not toks:
        return "", 0
    tset = set(terms)
    m = [1 if t in tset else 0 for t in toks]
    best_s, best_c = 0, -1
    for s in range(len(toks)):
        c = sum(m[s:s + W])
        if c > best_c:
            best_s, best_c = s, c
    win = toks[best_s:best_s + W]
    return (" ".join(f"{start_sel}{w}{stop_sel}" if w in tset else w for w in win),
            best_c)


BATTERY = [
    "the quick brown fox jumps over the lazy dog while the quick cat naps",
    "no matches here at all in this one",
    "",
    None,
    "table scan table scan table",
    "one table two three four five six table table end",
    "table",
    "x " * 50 + "table scan",
]


@pytest.mark.parametrize("w", [1, 3, 5, 12, 100])
def test_vectorized_equals_naive(w):
    terms = ["table", "quick", "fox"]
    out = headline_batch(pa.array(BATTERY, type=pa.string()), terms, max_words=w)
    for t, s, h in zip(BATTERY, out["snippet"].to_pylist(),
                       out["n_hits"].to_pylist()):
        assert (s, h) == naive_headline(t, terms, w), (w, t)


def test_vectorized_equals_naive_fuzz():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "hit", "miss", "x1"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(200)]
    terms = ["hit", "gamma"]
    for w in (2, 4, 9):
        out = headline_batch(pa.array(texts, type=pa.string()), terms, max_words=w)
        for t, s, h in zip(texts, out["snippet"].to_pylist(),
                           out["n_hits"].to_pylist()):
            assert (s, h) == naive_headline(t, terms, w)


def test_no_match_falls_back_to_document_start():
    out = headline_batch(pa.array(["alpha beta gamma delta"]), ["zzz"],
                         max_words=2)
    assert out["snippet"].to_pylist() == ["alpha beta"]
    assert out["n_hits"].to_pylist() == [0]


def test_tie_picks_earliest_window():
    # hit at pos 1 and pos 5; both 2-token windows score 1 → earliest wins
    out = headline_batch(pa.array(["hit a b c hit d"]), ["hit"], max_words=2)
    assert out["snippet"].to_pylist() == ["<b>hit</b> a"]


def test_custom_selectors_and_bad_width():
    out = headline_batch(pa.array(["a hit b"]), ["hit"], max_words=3,
                         start_sel="[", stop_sel="]")
    assert out["snippet"].to_pylist() == ["a [hit] b"]
    with pytest.raises(ValueError):
        headline_batch(pa.array(["x"]), ["x"], max_words=0)


def test_headline_column_over_dataset(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": ["a table here", "nothing", None]})
    out = headline_column(rd.from_arrow(t), "text", ["table"], max_words=2) \
        .to_arrow_refs()
    import ray as _ray

    got = pa.concat_tables([_ray.get(r) for r in out]).sort_by("doc_id")
    # earliest max-hit window: both 2-token windows of 'a table here' score
    # 1, so s=0 wins
    assert got["snippet"].to_pylist() == ["a <b>table</b>", "nothing", ""]
    assert got["n_hits"].to_pylist() == [1, 0, 0]
    assert got["doc_id"].to_pylist() == [1, 2, 3]  # original columns kept


SF = "/root/testdata/sf0.001"


def test_engine_headline_rank_order_and_wraps(ray_session):
    import os

    from project_gutenberg_full_text_search_ray import headline
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        ensure_documents_index,
    )

    eng = ensure_documents_index(SF)
    src = os.path.join(SF, "documents.parquet")
    t = headline(eng, "table scan", doc_source=src, k=5, max_words=6)
    top = eng.top_docs(eng.query().search("table scan"), 5)
    assert t["doc_id"].to_pylist() == top["doc_id"].to_pylist()
    assert t["score"].to_pylist() == top["score"].to_pylist()
    assert t.num_rows > 0
    for s, h in zip(t["snippet"].to_pylist(), t["n_hits"].to_pylist()):
        assert h >= 1 and "<b>" in s
        # window respects max_words
        assert len(s.split(" ")) <= 6


def test_engine_headline_no_hits_missing_source_and_multi_id(
        engine, ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import headline
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        ensure_documents_index,
    )

    eng = ensure_documents_index(SF)
    src = os.path.join(SF, "documents.parquet")
    t = headline(eng, "zzz_nonexistent_term", doc_source=src)
    assert t.num_rows == 0 and t.column_names == ["doc_id", "score",
                                                  "snippet", "n_hits"]
    # a doc_source that lacks the top ids must fail loudly, not misalign
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())}), empty)
    with pytest.raises(KeyError):
        headline(eng, "table", doc_source=empty)
    # multi-id specs are rejected up front (same contract as more_like_this)
    with pytest.raises(ValueError):
        headline(engine, "w00001", doc_source=src)
