"""TF-IDF keyword extraction (stages/keywords.py) — exact-score
semantics, ordering, and block-geometry invariance."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _run(tab, **kw):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.keywords import (
        tfidf_top_terms)

    return tfidf_top_terms(rd.from_arrow(tab), "text", "doc_id", **kw) \
        .to_pandas().sort_values(
            ["doc_id", "score_q", "term"],
            ascending=[True, False, True]).reset_index(drop=True)


def test_tfidf_exact_scores_and_order(ray_session):
    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["apple apple banana", "apple cherry", ""],
    })
    out = _run(tab, k=2, quant=1024)

    def idf(df):
        return math.floor(math.log2(3.0 / df) * 1024 + 0.5)

    # doc 1: apple tf2·idf(2), banana tf1·idf(1) — banana rarer, wins
    d1 = out[out.doc_id == 1]
    assert d1["term"].tolist() == ["banana", "apple"]
    assert d1["score_q"].tolist() == [idf(1), 2 * idf(2)]
    # doc 2: cherry (rarer) before apple
    d2 = out[out.doc_id == 2]
    assert d2["term"].tolist() == ["cherry", "apple"]
    # token-less doc 3 emits no rows
    assert (out.doc_id == 3).sum() == 0


def test_tfidf_ubiquitous_term_and_ties(ray_session):
    tab = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["same same", "same"],
    })
    out = _run(tab, k=1)
    # 'same' is in every doc → idf 0, score 0 — still the only candidate
    assert out["term"].tolist() == ["same", "same"]
    assert out["score_q"].tolist() == [0, 0]
    assert out["tf"].tolist() == [2, 1]


def test_tfidf_block_geometry_invariant(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.keywords import (
        tfidf_top_terms)

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    tab = pa.table({
        "doc_id": pa.array(range(50), type=pa.int64()),
        "text": [" ".join(rng.choice(vocab, size=15)) for _ in range(50)],
    })
    a = _run(tab, k=3)
    b = tfidf_top_terms(rd.from_arrow(tab).repartition(11), "text",
                        "doc_id", k=3).to_pandas().sort_values(
        ["doc_id", "score_q", "term"],
        ascending=[True, False, True]).reset_index(drop=True)
    assert a.equals(b)


def test_tfidf_vocab_cap_and_empty(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.keywords import (
        tfidf_top_terms)

    tab = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                    "text": ["a b c d e"]})
    with pytest.raises(ValueError, match="vocab_cap"):
        tfidf_top_terms(rd.from_arrow(tab), "text", "doc_id",
                        vocab_cap=3).to_pandas()
    empty = tfidf_top_terms(
        rd.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string())})),
        "text", "doc_id")
    assert empty.count() == 0


# ---------------------------------------------------------------- PMI


def _colloc(tab, **kw):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.keywords import (
        collocations_pmi)

    return collocations_pmi(rd.from_arrow(tab), "text", **kw).to_pandas()


def test_collocations_exact_scores_and_order(ray_session):
    import math

    # corpus: T=8 tokens, P=5 adjacent pairs (3 in doc1, 1 each in 2/3)
    tab = pa.table({"text": pa.array(
        ["new york new york", "new york", "other words"])})
    out = _colloc(tab, k=5, min_count=2, quant=1024)
    # pairs: (new,york) x3, (york,new) x1(<min_count), (other,words) x1
    assert out["w1"].tolist() == ["new"]
    assert out["w2"].tolist() == ["york"]
    assert out["pair_count"].tolist() == [3]
    c_new, c_york, t_tot, p_tot = 3.0, 3.0, 8.0, 5.0
    expect = math.floor(
        math.log2(((3.0 * t_tot) * t_tot) / ((p_tot * c_new) * c_york))
        * 1024 + 0.5)
    assert out["score_q"].tolist() == [expect]


def test_collocations_adjacency_stops_at_doc_boundary(ray_session):
    # 'b a' never occurs inside one doc — doc boundaries must not pair
    tab = pa.table({"text": pa.array(["a b", "a b", "a b"])})
    out = _colloc(tab, k=10, min_count=1)
    assert out[["w1", "w2"]].values.tolist() == [["a", "b"]]
    assert out["pair_count"].tolist() == [3]


def test_collocations_tie_order_and_k(ray_session):
    # two pairs with identical counts everywhere → identical score_q;
    # ties cut by (w1, w2) ascending, then k clamps
    tab = pa.table({"text": pa.array(["x y", "x y", "p q", "p q"])})
    out = _colloc(tab, k=1, min_count=2)
    assert out[["w1", "w2"]].values.tolist() == [["p", "q"]]
    full = _colloc(tab, k=10, min_count=2)
    assert full[["w1", "w2"]].values.tolist() == [["p", "q"], ["x", "y"]]


def test_collocations_block_geometry_invariant(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.keywords import (
        collocations_pmi)

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    tab = pa.table({"text": pa.array(
        [" ".join(rng.choice(vocab, size=12)) for _ in range(60)])})
    a = _colloc(tab, k=15, min_count=2)
    b = collocations_pmi(rd.from_arrow(tab).repartition(13), "text",
                         k=15, min_count=2).to_pandas()
    assert a.equals(b)


def test_collocations_empty_null_and_cap(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.keywords import (
        collocations_pmi)

    # all-null / token-less / single-token corpora → empty result
    for texts in ([None, None], ["", "  "], ["one", "two"]):
        out = _colloc(pa.table({"text": pa.array(texts, type=pa.string())}),
                      k=5, min_count=1)
        assert len(out) == 0
    with pytest.raises(ValueError, match="vocab_cap"):
        collocations_pmi(
            rd.from_arrow(pa.table({"text": pa.array(["a b c d e f"])})),
            "text", k=5, min_count=1, vocab_cap=3)
