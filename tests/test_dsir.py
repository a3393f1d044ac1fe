"""DSIR importance resampling (stages/dsir.py) — semantics, determinism
under block geometry, and the feature-hashing contract."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows, **kw):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows), **kw)


def test_hashed_feature_buckets_counts_and_order():
    from project_gutenberg_full_text_search_ray.stages.dsir import (
        hashed_feature_buckets)

    texts = pa.array(["a b c", "x", "", None, "a b"])
    bkt, didx = hashed_feature_buckets(texts, 64)
    # unigrams + within-doc bigrams: doc0 3+2, doc1 1+0, doc2/3 0, doc4 2+1
    counts = np.bincount(didx, minlength=5)
    assert counts.tolist() == [5, 1, 0, 0, 3]
    assert (np.diff(didx) >= 0).all()          # nondecreasing doc_index
    assert ((0 <= bkt) & (bkt < 64)).all()
    # deterministic
    b2, d2 = hashed_feature_buckets(texts, 64)
    assert (b2 == bkt).all() and (d2 == didx).all()


def test_hashed_feature_buckets_no_cross_doc_bigram():
    from project_gutenberg_full_text_search_ray.stages.dsir import (
        hashed_feature_buckets)

    # "a b" as one doc has a bigram; "a" and "b" as two docs must not
    one, _ = hashed_feature_buckets(pa.array(["a b"]), 1 << 20)
    two, _ = hashed_feature_buckets(pa.array(["a", "b"]), 1 << 20)
    assert len(one) == 3 and len(two) == 2
    assert set(two) <= set(one)                 # unigrams shared
    assert len(set(one) - set(two)) == 1        # the bigram bucket


def test_dsir_log_ratios_shape_and_sign():
    from project_gutenberg_full_text_search_ray.stages.dsir import (
        dsir_log_ratios)

    b = 16
    raw = np.zeros(b, dtype=np.int64)
    tgt = np.zeros(b, dtype=np.int64)
    raw[0], raw[1] = 100, 100
    tgt[0] = 100                                 # bucket 0 target-loved
    lrq = dsir_log_ratios(raw, tgt, quant=1024)
    assert lrq.shape == (b,) and lrq.dtype == np.int64
    assert lrq[0] > lrq[1]                       # target-like bucket wins


def test_dsir_weights_ranking_and_empty_doc(ray_session):
    from project_gutenberg_full_text_search_ray.stages.dsir import (
        dsir_weights)

    raw = _ds({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": ["cat sat mat", "dog ran far", "cat sat mat", ""],
    })
    tgt = _ds({"id": pa.array([9], type=pa.int64()),
               "text": ["cat sat mat cat sat"]})
    out = dsir_weights(raw, tgt, "text", "id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == [1, 2, 3, 4]
    # identical docs get identical weights; target-like beats unlike
    assert out.loc[0, "dsir_wq"] == out.loc[2, "dsir_wq"]
    assert out.loc[0, "dsir_wq"] > out.loc[1, "dsir_wq"]
    assert out.loc[3, "n_feats"] == 0 and out.loc[3, "dsir_wq"] == 0


def test_dsir_weights_block_geometry_invariant(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dsir import (
        dsir_weights)

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(60)]
    tab = pa.table({"id": pa.array(range(60), type=pa.int64()),
                    "text": texts})
    tgt = rd.from_arrow(tab.slice(0, 10))

    def run(ds):
        return dsir_weights(ds, tgt, "text", "id").to_pandas() \
            .sort_values("id").reset_index(drop=True)

    a = run(rd.from_arrow(tab))
    b = run(rd.from_arrow(tab).repartition(13))
    assert a.equals(b)


def test_dsir_select_topk_ties_and_overcount(ray_session):
    from project_gutenberg_full_text_search_ray.stages.dsir import (
        dsir_select)

    raw = _ds({
        "id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": ["cat sat", "dog ran", "cat sat", "cat sat", "dog ran", ""],
    })
    tgt = _ds({"id": pa.array([0], type=pa.int64()), "text": ["cat sat"]})
    top2 = dsir_select(raw, tgt, "text", "id", k=2)
    # three tied target-like docs (1, 3, 4): smallest ids win; the
    # token-less doc 6 (neutral weight 0) is excluded from selection
    assert top2["id"].to_pylist() == [1, 3]
    # k beyond the corpus returns every SCORED doc, sorted by id
    allrows = dsir_select(raw, tgt, "text", "id", k=100)
    assert allrows["id"].to_pylist() == [1, 2, 3, 4, 5]
    assert allrows.schema.names == ["id", "n_feats", "dsir_wq"]


def test_dsir_empty_target_raises(ray_session):
    from project_gutenberg_full_text_search_ray.stages.dsir import (
        dsir_weights)

    raw = _ds({"id": pa.array([1], type=pa.int64()), "text": ["a b"]})
    tgt = _ds({"id": pa.array([], type=pa.int64()),
               "text": pa.array([], type=pa.string())})
    with pytest.raises(ValueError, match="target corpus has no features"):
        dsir_weights(raw, tgt, "text", "id")
