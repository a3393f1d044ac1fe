"""Semantic tests for the non-SQL-expressible extras: MinHash-LSH, SimHash,
LSH-ANN, fingerprints, language-ID, fuzzy search, multimodal plumbing."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_minhash_pairs_match_bruteforce_jaccard(ray_session):
    """LSH candidates+verify must find exactly the pairs a brute-force
    all-pairs Jaccard scan finds above threshold (recall check at small n —
    LSH may miss borderline pairs whose bands all split; require >=90%
    recall and 100% precision)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import jaccard, shingles
    from project_gutenberg_full_text_search_ray.stages.dedup import minhash_lsh_pairs

    # corpus with planted near-dups
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    docs = []
    for i in range(30):
        words = base.split()
        if i % 3 == 0:
            words[i % len(words)] = f"sub{i}"  # near-dup of base
        elif i % 3 == 1:
            words = [f"w{i}_{j}" for j in range(15)]  # unique doc
        docs.append({"doc_id": i, "text": " ".join(words)})
    ds = rd.from_items(docs)
    got = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5, concurrency=2).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}

    sh = {d["doc_id"]: shingles(DEFAULT_ANALYZER.tokenize(d["text"])) for d in docs}
    exp_pairs = set()
    for i in range(30):
        for j in range(i + 1, 30):
            if jaccard(sh[i], sh[j]) >= 0.5:
                exp_pairs.add((i, j))
    assert got_pairs <= exp_pairs  # precision 100% (verified pairs only)
    assert len(got_pairs) >= 0.9 * len(exp_pairs)
    assert len(exp_pairs) > 5  # the fixture actually plants near-dups


def test_simhash_pairs_sane(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import hamming64, simhash64
    from project_gutenberg_full_text_search_ray.stages.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi"
    docs = [{"doc_id": i, "text": base + (f" extra{i}" if i % 2 else "")} for i in range(10)]
    out = simhash_pairs(rd.from_items(docs), "text", "doc_id", max_hamming=10).to_pandas()
    sigs = {d["doc_id"]: simhash64(DEFAULT_ANALYZER.tokenize(d["text"])) for d in docs}
    for a, b, h in zip(out["id_a"], out["id_b"], out["hamming"]):
        assert hamming64(sigs[int(a)], sigs[int(b)]) == int(h) <= 10


def test_lsh_ann_recall_vs_exact(ray_session):
    # sf0.01: the 500-vector corpus is dense enough that the query's sign-LSH
    # bucket provably holds true near-neighbors (at sf0.001's 50 vectors the
    # bucket can legitimately be empty of them — too sparse to assert recall)
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        q_ann_cosine_topk,
        q_ann_lsh_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = set(q_ann_cosine_topk(sf)["vec_id"].to_pylist())
    approx = set(q_ann_lsh_topk(sf)["vec_id"].to_pylist())
    assert len(exact) == 10
    assert len(approx) <= 10
    # REAL recall assertion: the approximate top-k must recover exact
    # near-neighbors, not merely have plausible shape
    assert len(exact & approx) >= 2


def test_rows_only_queries_run(ray_session):
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        QUERIES,
        ORACLE_SQL,
    )

    rows_only = set(QUERIES) - set(ORACLE_SQL)
    for name in sorted(rows_only):
        out = QUERIES[name](SF)
        df = out.to_pandas() if isinstance(out, pa.Table) else out
        assert df is not None and len(df.columns) > 0, name


def test_transcripts_flagship_has_phrase_hits(ray_session):
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import q_transcripts_flagship

    t = q_transcripts_flagship(SF)
    assert t.num_rows > 0
    assert set(t.column_names) == {"conv_id", "turn_idx", "score"}


def test_multimodal_decode_deterministic(ray_session):
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import q_multimodal_decode

    a = q_multimodal_decode(SF).to_pandas()
    b = q_multimodal_decode(SF).to_pandas()
    assert a.equals(b)
    assert len(a) == 64


def test_multimodal_real_decode_works_and_gates_unknown_formats():
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.stages.multimodal import (
        DecodeImageStage,
        synth_media_table,
    )

    media = synth_media_table(2)
    out = DecodeImageStage(dim=8, fake=False)(media)  # real PPM/WAV decode
    assert out.num_rows == 2 and len(out["features"][0].as_py()) == 8
    unknown = pa.table({"media_id": [9], "payload": [b"\x89PNG..."],
                        "meta": media["meta"].slice(0, 1)})
    with pytest.raises(NotImplementedError):
        DecodeImageStage(fake=False)(unknown)


def test_frame_sample_explodes(ray_session):
    from project_gutenberg_full_text_search_ray.stages.multimodal import (
        FrameSampleStage,
        synth_media_table,
    )

    out = FrameSampleStage(n_frames=3)(synth_media_table(5))
    assert out.num_rows == 15
    assert out.column_names == ["media_id", "frame_idx", "frame_payload"]


def test_langid_markers():
    from project_gutenberg_full_text_search_ray.functions.textstats import predict_language

    assert predict_language("the cat is on the mat and it was fine".split()) == "en"
    assert predict_language("le chat est sur la table et il est la".split()) == "fr"
    assert predict_language("el gato es un animal y las casas son grandes".split()) == "es"
    assert predict_language("der hund ist ein tier und die katze".split()) == "de"
    # CJK detection works on RAW text: the default analyzer tokenizes on
    # [^a-z0-9]+ so ideographs never reach the token stream
    assert predict_language([], raw_text="这是一个中文句子") == "zh"
    assert predict_language([]) == "und"


def test_winnow_fingerprints_detect_overlap():
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        rolling_fingerprints,
        winnow,
    )

    a = "one two three four five six seven eight nine ten".split()
    b = "zero one two three four five six seven eight extra".split()
    c = [f"x{i}" for i in range(10)]
    fa, fb, fc = (set(winnow(rolling_fingerprints(t)).tolist()) for t in (a, b, c))
    assert fa & fb  # shared 4-gram windows survive winnowing
    assert not (fa & fc)


def test_custom_udf_filter(engine, oracle):
    """F16 escape hatch: arbitrary Table→mask predicate shipped to segments."""
    import pyarrow.compute as pc

    from project_gutenberg_full_text_search_ray import FilterSpec

    def even_turns(t):
        return pc.equal(pc.bit_wise_and(t["turn_idx"], 1), 0).to_numpy(zero_copy_only=False)

    q = engine.query().search("the").where(FilterSpec(None, "udf", even_turns))[1, 20]
    res = engine.execute(q)
    exp = oracle.search(["the"], filters=[("turn_idx", "in", [0, 2, 4, 6])], page_size=20)
    assert res.total == exp.total
    got = list(zip(res.table["conv_id"].to_pylist(), res.table["turn_idx"].to_pylist()))
    assert got == [(r["conv_id"], r["turn_idx"]) for r in exp.rows]


def test_connected_components():
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.stages.dedup import connected_components

    pairs = pa.table({"id_a": [1, 2, 5, 9], "id_b": [2, 3, 6, 1]})
    out = connected_components(pairs)
    m = dict(zip(out["id"].to_pylist(), out["rep"].to_pylist()))
    assert m == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_sample_per_source_deterministic(ray_session):
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import q_sample_per_source

    a = q_sample_per_source(SF)
    b = q_sample_per_source(SF)
    assert a.equals(b)
    import collections

    c = collections.Counter(a["source"].to_pylist())
    assert all(v == 3 for v in c.values())


def test_contains_indexed_matches_scan(ray_session):
    """Index-assisted CONTAINS must find exactly the docs the naive scan
    finds for a single-token substring."""
    import os

    import duckdb

    from project_gutenberg_full_text_search_ray.pipelines.driver_api import q_contains_indexed

    got = set(q_contains_indexed(SF)["doc_id"].to_pylist())
    con = duckdb.connect()
    exp = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{os.path.join(SF, 'documents.parquet')}') "
            "WHERE contains(text, 'able')"
        ).fetchall()
    }
    assert got == exp and len(exp) > 0


def test_fuzzy_via_trigram_index(ray_session):
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        ensure_documents_index,
        q_fuzzy_search,
    )
    from project_gutenberg_full_text_search_ray.stages.trigram import fuzzy_expand

    eng = ensure_documents_index(SF)
    exp = fuzzy_expand(eng.index_dir, "tabel")
    assert any(t == "table" for t, _ in exp)
    t = q_fuzzy_search(SF)
    assert t.num_rows > 0


def test_ivf_recall_vs_exact(ray_session, tmp_path):
    """IVF recall properties on a FRESHLY BUILT index (not the shared /tmp
    cache — a cached store built by older training code would mask build
    regressions; that is exactly how the pre-r4 biased-sample centroids hid
    behind this test until a cache clear).  The query vector's true
    neighbors sit at cos≈0.3 spread over most lists, so per-rank assertions
    at n_probe=2 are luck; what IVF does guarantee here: useful top-10
    overlap at n_probe=2, the top-3 recovered by n_probe=4, and recall
    monotone in n_probe (probe-all exactness is pinned separately by
    test_ivf_probeall_equals_bruteforce)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        q_ann_cosine_topk,
    )
    from project_gutenberg_full_text_search_ray.stages.similarity import IVFIndex

    emb = os.path.join(SF, "embeddings.parquet")
    q_vec = pq.read_table(emb, filters=[("vec_id", "==", 0)])["embedding"].to_pylist()[0]
    idx = IVFIndex.build(rd.read_parquet(emb, columns=["vec_id", "embedding"]),
                         "embedding", "vec_id", str(tmp_path / "ivf"))
    Q = np.asarray([q_vec])
    exact = q_ann_cosine_topk(SF)["vec_id"].to_pylist()
    got = {}
    for n_probe in (2, 4):
        t = idx.topk(Q, k=10, n_probe=n_probe, exclude_ids={0})
        got[n_probe] = t["vec_id"].to_pylist()
        assert len(got[n_probe]) <= 10
    assert len(set(exact) & set(got[2])) >= 3  # top-10 overlap at 2/8 lists
    assert len(set(exact[:3]) & set(got[4])) >= 1  # near-neighbors by 4/8
    assert len(set(exact) & set(got[4])) >= len(set(exact) & set(got[2]))


def test_ivf_probeall_equals_bruteforce(ray_session):
    """n_probe = n_lists reads every list partition, so the persisted-IVF
    answer must EQUAL the exact brute-force cosine top-k — this is what lets
    `ann_ivf_probeall` share ann_cosine_topk's hard SQL oracle."""
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        q_ann_cosine_topk,
        q_ann_ivf_probeall,
    )

    exact = q_ann_cosine_topk(SF)
    probeall = q_ann_ivf_probeall(SF)
    assert probeall.cast(exact.schema).equals(exact)


def test_ivf_persisted_index_prunes_and_matches_inmemory(ray_session, tmp_path):
    """Persisted IVFIndex: (a) a query reads only its probed list partitions
    (directory pruning), (b) the persisted answer is identical to the
    in-memory ivf_topk with the same centroids, (c) a cold reload from disk
    answers identically."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.similarity import IVFIndex, ivf_topk

    emb_path = os.path.join(SF, "embeddings.parquet")
    q_vec = pq.read_table(emb_path, filters=[("vec_id", "==", 0)])["embedding"].to_pylist()[0]
    Q = np.asarray([q_vec])
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])

    idx = IVFIndex.build(ds, "embedding", "vec_id", str(tmp_path / "ivf"), n_lists=8)
    paths = idx.probe_paths(Q, n_probe=2)
    assert 1 <= len(paths) <= 2 < idx.meta["n_lists"]  # pruned read

    got = idx.topk(Q, k=10, n_probe=2, exclude_ids={0})
    exp = ivf_topk(ds, "embedding", "vec_id", Q, k=10, n_probe=2, exclude_ids={0})
    assert got.equals(exp)

    reloaded = IVFIndex(str(tmp_path / "ivf"))
    assert reloaded.topk(Q, k=10, n_probe=2, exclude_ids={0}).equals(got)


def test_ivf_training_unbiased_on_sorted_input(ray_session, tmp_path):
    """k-means training must sample the WHOLE corpus, not the first blocks:
    on an input sorted by cluster, limit()-based sampling trains centroids in
    one corner of the space and every other cluster piles into few lists.
    With the hash-bottom-k sample, list occupancy stays balanced."""
    import os

    import numpy as np
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.similarity import IVFIndex

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 16)) * 4
    rows = []
    for c in range(4):  # SORTED by cluster — the adversarial layout
        for i in range(512):
            rows.append({"vec_id": c * 512 + i,
                         "embedding": (centers[c] + rng.standard_normal(16) * 0.1).tolist()})
    ds = rd.from_items(rows)  # from_items preserves order; first blocks = cluster 0
    idx = IVFIndex.build(ds, "embedding", "vec_id", str(tmp_path / "ivf_sorted"),
                         n_lists=4, train_sample=256)  # sample < one cluster
    occ = []
    for li in range(4):
        d = os.path.join(str(tmp_path / "ivf_sorted"), "lists", f"ivf_list={li}")
        n = (rd.read_parquet(d).count() if os.path.isdir(d) else 0)
        occ.append(n)
    occ.sort()
    assert sum(occ) == 2048
    # balanced: every list populated and max/median bounded (a limit()-trained
    # index on this layout collapses 3 clusters into 1-2 lists)
    assert occ[0] > 0
    assert occ[-1] <= 3 * max(1, occ[1])


def test_ngram_jaccard_exact_vs_bruteforce(ray_session):
    """Unlike MinHash-LSH, the shingle-bucket candidate generation is exact
    for Jaccard > 0, so the result must EQUAL the brute-force pair set."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import jaccard, shingles
    from project_gutenberg_full_text_search_ray.stages.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    docs = []
    for i in range(24):
        words = base.split()
        if i % 3 == 0:
            words[i % len(words)] = f"sub{i}"
        elif i % 3 == 1:
            words = [f"w{i}_{j}" for j in range(15)]
        docs.append({"doc_id": i, "text": " ".join(words)})
    got = ngram_jaccard_pairs(rd.from_items(docs), "text", "doc_id", threshold=0.5).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    sh = {d["doc_id"]: shingles(DEFAULT_ANALYZER.tokenize(d["text"])) for d in docs}
    exp_pairs = {
        (i, j)
        for i in range(24)
        for j in range(i + 1, 24)
        if jaccard(sh[i], sh[j]) >= 0.5
    }
    assert got_pairs == exp_pairs  # exact, not probabilistic
    assert len(exp_pairs) > 3


def test_dedup_shuffles_carry_no_text(ray_session):
    """Scale invariant: the exchanged rows of exact-dedup and the candidate
    stages of MinHash carry (hash/sig, id) only — never the document text."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        MinHashStage,
        exact_dedup_keyed,
    )

    docs = [{"doc_id": i, "text": f"some document body {i}"} for i in range(8)]
    keyed = exact_dedup_keyed(rd.from_items(docs), "doc_id", "text")
    assert set(keyed.schema().names) == {"__h1", "__h2", "__isnull", "doc_id"}

    batch = pa.table({"doc_id": [1, 2], "text": ["a b c d", "e f g h"]})
    sigs = MinHashStage("text", "doc_id")(batch)
    assert set(sigs.column_names) == {"doc_id", "sig"}  # text dropped pre-shuffle


def test_exact_dedup_null_keys_kept(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import exact_dedup

    t = pa.table({"doc_id": [1, 2, 3, 4, 5], "text": ["a", "a", None, None, "b"]})
    out = exact_dedup(rd.from_arrow(t), "doc_id", "text").to_pandas().sort_values("keep_id")
    assert out.to_dict("records") == [
        {"keep_id": 1, "n_dups": 2},
        {"keep_id": 3, "n_dups": 2},  # NULL group kept, distinct from ''
        {"keep_id": 5, "n_dups": 1},
    ]


def test_ngram_bucket_occupancy_cap(ray_session):
    """Hot shingle buckets above the occupancy cap are skipped (bounded
    per-bucket pair work); an adversarial corpus where EVERY doc shares every
    shingle yields zero pairs at cap=1 but all pairs uncapped."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import ngram_jaccard_pairs

    docs = [{"doc_id": i, "text": "same exact shared text everywhere"} for i in range(6)]
    ds = rd.from_items(docs)
    capped = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.5,
                                 max_bucket_occupancy=1).to_pandas()
    assert len(capped) == 0
    full = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.5).to_pandas()
    assert len(full) == 15  # all C(6,2) identical-doc pairs


def test_connected_components_ds_long_chain(ray_session):
    """Distributed min-label propagation must converge on a chain whose
    diameter needs several rounds, matching driver-side union-find."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        connected_components,
        connected_components_ds,
    )

    # chain 0-1-2-...-9 plus a separate triangle 100-101-102
    pairs = pa.table({
        "id_a": list(range(9)) + [100, 101, 100],
        "id_b": list(range(1, 10)) + [101, 102, 102],
    })
    exp = connected_components(pairs).to_pandas().sort_values("id").reset_index(drop=True)
    got = (
        connected_components_ds(rd.from_arrow(pairs), driver_threshold=0).to_pandas()
        .rename(columns={"rep": "rep"}).sort_values("id").reset_index(drop=True)
    )
    assert got.astype("int64").equals(exp.astype("int64"))
    assert set(got[got["id"] < 50]["rep"]) == {0} and set(got[got["id"] >= 50]["rep"]) == {100}


def test_embedding_lsh_neardup_recall(ray_session):
    """Banded sign-LSH near-dup must find planted near-identical vectors and
    emit only pairs the exact path also emits."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    rng = np.random.default_rng(5)
    vecs = [{"vec_id": i, "embedding": rng.standard_normal(16).tolist()} for i in range(50)]
    for src, dst in [(3, 30), (7, 40), (11, 45)]:
        vecs[dst]["embedding"] = [v * 1.02 + 0.001 for v in vecs[src]["embedding"]]
    exact = embedding_neardup_pairs(rd.from_items(vecs), "embedding", "vec_id", threshold=0.98)
    exact_pairs = set(zip(exact["id_a"].to_pylist(), exact["id_b"].to_pylist()))
    lsh = embedding_neardup_pairs_lsh(
        rd.from_items(vecs), "embedding", "vec_id", threshold=0.98).to_pandas()
    lsh_pairs = {(int(a), int(b)) for a, b in zip(lsh["id_a"], lsh["id_b"])}
    assert lsh_pairs <= exact_pairs  # precision 100%
    assert len(exact_pairs) >= 3
    assert len(lsh_pairs) >= 0.66 * len(exact_pairs)  # recall on planted dups


def test_simjoin_spill_store_branch(ray_session, monkeypatch, tmp_path):
    """Above SIMJOIN_BROADCAST_CAP the default doc source must spill the
    encoded union to a temp parquet store (registered for atexit cleanup)
    and still produce the same matches as the broadcast path."""
    import glob

    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages import dedup

    mk = lambda ids, texts: rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()), "text": texts}))
    texts = [f"the quick brown fox jumps over lazy dog {i % 4}"
             for i in range(12)]
    left, right = mk(range(12), texts), mk(range(100, 112), texts)

    broadcast = dedup.jaccard_similarity_join(
        left, right, "text", "doc_id", "doc_id", threshold=0.5).to_pandas()

    pre = set(glob.glob(os.path.join(tempfile.gettempdir(),
                                     "pgfts_simjoin_store_*")))
    monkeypatch.setattr(dedup, "SIMJOIN_BROADCAST_CAP", 4)
    spilled = dedup.jaccard_similarity_join(
        left, right, "text", "doc_id", "doc_id", threshold=0.5).to_pandas()
    post = set(glob.glob(os.path.join(tempfile.gettempdir(),
                                      "pgfts_simjoin_store_*"))) - pre
    assert len(post) == 1  # spill branch taken; dir is atexit-reclaimed

    key = ["left_id", "right_id"] if "left_id" in broadcast.columns else \
        sorted(broadcast.columns)[:2]
    b = broadcast.sort_values(key).reset_index(drop=True)
    s = spilled.sort_values(key).reset_index(drop=True)
    assert b.equals(s) and len(b) > 0


def test_knn_join_pool_cap(ray_session, monkeypatch):
    """Above the pool cap the exact kNN path must refuse loudly and point
    at the IVF scale path instead of concat-materializing a heap-sized
    pool in every actor."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages import similarity

    monkeypatch.setattr(similarity, "KNN_POOL_CAP", 10)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(20), type=pa.int64()),
        "embedding": pa.array([[1.0, float(i)] for i in range(20)])}))
    with pytest.raises(ValueError, match="knn_join_ivf"):
        similarity.knn_join(ds, "embedding", "vec_id", k=2)


def test_apply_dedup_null_ids_int_broadcast(ray_session):
    """NULL corpus ids must survive the int64 broadcast fast path: the
    numpy view would round-trip NULL through float64 NaN and compare as an
    undefined sentinel — such batches must route through the Arrow
    membership kernel and keep their NULL rows."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import apply_dedup

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, None, 4], type=pa.int64()),
        "text": ["a", "b", "c", "d"]}))
    labels = rd.from_arrow(pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "rep": pa.array([1, 1], type=pa.int64())}))  # drop id 2
    kept = apply_dedup(corpus, labels, "doc_id").to_pandas()
    assert len(kept) == 3
    assert set(kept["doc_id"].dropna().astype("int64")) == {1, 4}
    assert kept["doc_id"].isna().sum() == 1


def test_semantic_dedup_lsh_recall(ray_session):
    """The registered LSH-routed SemDeDup (the 100 TB scale path) must
    agree with the exact all-pairs chain on nearly every dedup decision:
    every id IT drops is one the exact path drops (precision 100% — LSH
    pairs are exact-cosine verified, so a false drop is impossible), and
    it recovers ≥80% of the exact path's drops at sf0.001."""
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        q_semantic_dedup, q_semantic_dedup_lsh)

    sf = "/root/testdata/sf0.001"
    all_ids = set(range(500))
    kept_exact = set(q_semantic_dedup(sf)["vec_id"].to_pylist())
    kept_lsh = set(q_semantic_dedup_lsh(sf)["vec_id"].to_pylist())
    dropped_exact = all_ids - kept_exact
    dropped_lsh = all_ids - kept_lsh
    assert dropped_lsh <= dropped_exact          # no false drops
    assert len(dropped_exact) >= 3               # fixture actually dedups
    assert len(dropped_lsh) >= 0.8 * len(dropped_exact)


def test_contains_multi_token_boundary(ray_session, tmp_path):
    """Multi-token CONTAINS must equal ILIKE '%q%': positions collapse
    separators, so 'window, merge' phrase-matches but the literal substring
    verify rejects it; suffix/prefix edge fragments match mid-token."""
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import build_index, FullTextSearchEngine
    from project_gutenberg_full_text_search_ray.corpus import CorpusSpec

    texts = [
        "the window merge operator works",        # match
        "close the window, merge the branch",     # phrase-candidate, NOT a substring match
        "a rewindow merged thing",                # edge frags mid-token both sides: matches
        "use rewindow merge here",                # suffix edge: 'rewindow' ends with 'window'? yes -> 'window merge' substring? 'rewindow merge' contains 'window merge' -> match
        "nothing relevant here",
        "window  merge with two spaces",          # phrase-candidate, not substring
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    src = str(tmp_path / "mini.parquet")
    pq.write_table(t, src)
    spec = CorpusSpec(id_cols=("doc_id",), text_col="text", meta_cols=(), name="mini")
    idx = str(tmp_path / "idx")
    build_index(src, spec, idx, docs_per_segment=3)
    eng = FullTextSearchEngine(idx)
    got = sorted(eng.contains_multi_dataset("window merge").to_pandas()["doc_id"].tolist())
    exp = sorted(i for i, s in enumerate(texts) if "window merge" in s)
    assert got == exp == [0, 2, 3]
    # single-token fragment path still exact
    got1 = sorted(eng.contains_multi_dataset("indow").to_pandas()["doc_id"].tolist())
    assert got1 == sorted(i for i, s in enumerate(texts) if "indow" in s)


def test_per_field_postings_semantics(ray_session, tmp_path):
    """Per-field postings: field-scoped queries match only the field's
    tokens, support phrases within the field, and score with FIELD-local
    stats (a term frequent in bodies but rare in titles gets title-local
    idf when field-scoped)."""
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import build_index, FullTextSearchEngine
    from project_gutenberg_full_text_search_ray.corpus import CorpusSpec

    rows = [
        # body mentions 'alpha' everywhere; title has it only in doc 0
        {"doc_id": 0, "body": "alpha beta gamma alpha", "title": "alpha report"},
        {"doc_id": 1, "body": "alpha delta epsilon", "title": "summary notes"},
        {"doc_id": 2, "body": "alpha zeta", "title": "quarterly report data"},
        {"doc_id": 3, "body": "unrelated words here", "title": "report data alpha"},
    ]
    t = pa.table({k: [r[k] for r in rows] for k in ("doc_id", "body", "title")})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    spec = CorpusSpec(("doc_id",), "body", (), "fielded", field_cols=("title",))
    idx = str(tmp_path / "idx")
    build_index(src, spec, idx, docs_per_segment=2)
    eng = FullTextSearchEngine(idx)

    # field-scoped term: only docs whose TITLE has 'alpha'
    r = eng.execute(eng.query().search("alpha", field="title")[1, 10])
    assert sorted(r.table["doc_id"].to_pylist()) == [0, 3]
    # whole-text (body) search unaffected by titles
    r2 = eng.execute(eng.query().search("alpha")[1, 10])
    assert sorted(r2.table["doc_id"].to_pylist()) == [0, 1, 2]
    # phrase WITHIN the field (positions are field-local)
    r3 = eng.execute(eng.query().search('"report data"', field="title")[1, 10])
    assert sorted(r3.table["doc_id"].to_pylist()) == [2, 3]
    # field-local dl normalization: doc 0's title (2 tokens) beats doc 3's
    # (3 tokens) for the same tf=1 of 'alpha'
    r4 = eng.execute(eng.query().search("alpha", field="title")[1, 10])
    assert r4.table["doc_id"].to_pylist()[0] == 0
    # mixed clause: body clause AND title clause (AND across .search calls)
    r5 = eng.execute(eng.query().search("alpha").search("report", field="title")[1, 10])
    assert sorted(r5.table["doc_id"].to_pylist()) == [0, 2]


def test_opds_like_crosswalk_fallbacks():
    """OPDS projection fidelity (reference crosswalks.py:144-204): ordered
    format-preference chain, guaranteed acquisition link, relative-href
    resolution, cover.medium preference."""
    import json

    from project_gutenberg_full_text_search_ray.corpus import CorpusSpec
    from project_gutenberg_full_text_search_ray.crosswalks import opds_like_crosswalk

    spec = CorpusSpec(("doc_id",), "text", (), "t")
    fm = lambda ft, fn, **kw: {"filetype": ft, "filename": fn, "mediatype": kw.get("m"), "extent": kw.get("e")}
    rows = {
        "doc_id": [1, 2, 3, 4],
        "score": [1.0, 0.5, 0.3, 0.1],
        "is_audio": [False, False, True, False],
        "formats": [
            # doc 1: epub3 present -> chosen over pdf despite list order
            [fm("pdf.images", "a.pdf"), fm("epub3.images", "a.epub", m="application/epub+zip", e=123),
             fm("cover.small", "c1.jpg"), fm("cover.medium", "c2.jpg")],
            # doc 2: only a fallback format, absolute URL passes through
            [fm("html", "https://cdn.example.com/b.html")],
            # doc 3: audio -> 'index' preferred
            [fm("index", "ix.html"), fm("epub3.images", "x.epub")],
            # doc 4: nothing usable -> synthesized default link
            [fm("weird", None)],
        ],
    }
    t = pa.table(rows)
    out = opds_like_crosswalk(t, spec, is_audio_col="is_audio", base_url="https://example.org/")
    docs = [json.loads(s) for s in out["opds"].to_pylist()]
    assert docs[0]["links"][0]["href"] == "https://example.org/a.epub"
    assert docs[0]["links"][0]["length"] == 123
    assert [i["href"] for i in docs[0]["images"]] == [
        "https://example.org/c1.jpg", "https://example.org/c2.jpg"]  # plain cover then cover.medium
    assert docs[1]["links"][0]["href"] == "https://cdn.example.com/b.html"
    assert docs[2]["links"][0]["href"] == "https://example.org/ix.html"  # audio chain
    assert docs[3]["links"][0] == {
        "rel": "http://opds-spec.org/acquisition/open-access",
        "href": "https://example.org/items/4", "type": "text/html"}
    assert out.column_names == ["doc_id", "score", "opds"]


def test_asof_join_null_keys_and_times(ray_session):
    """SQL equality semantics: NULL-keyed lefts match nothing (not even
    NULL-keyed rights), NULL-on lefts match nothing, NULL-keyed/NULL-on
    rights are invisible — all emit the miss value.  Regression: None==None
    grouped NULL keys into one run and cross-matched them."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.asof import asof_join

    left = rd.from_arrow(pa.table({
        "lid": [1, 2, 3, 4, 5],
        "k": ["a", None, "a", "b", None],
        "t": [100, 100, None, 50, None],
    }))
    right = rd.from_arrow(pa.table({
        "rid": [10, 11, 12, 13],
        "k": ["a", None, "b", "b"],
        "t": [90, 90, None, 40],
    }))
    out = asof_join(left, right, by="k", on="t", left_cols=["lid"],
                    right_value_col="rid", right_seq_col="rid",
                    out_value_col="prev_rid") \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    got = [None if v != v else int(v) for v in out["prev_rid"]]
    # lid1: a@100 ← rid10 (a@90).  lid2: NULL key → miss (NOT rid11).
    # lid3: NULL t → miss.  lid4: b@50 ← rid13 (b@40; rid12 has NULL t).
    # lid5: NULL key and t → miss.
    assert got == [10, None, None, 13, None]


def test_asof_join_backward_inclusive(ray_session):
    """AS-OF join semantics vs a brute-force reference, with block sizes
    forced small so per-key timelines SPAN sorted blocks (cross-block
    carry-in), including a key whose rights all precede most of its lefts
    (every later block needs the broadcast carry, none resolves locally)."""
    import ray.data as rd
    from ray.data import DataContext

    from project_gutenberg_full_text_search_ray.stages.asof import asof_join

    rng = np.random.default_rng(7)
    n = 3000
    left_rows = [{"lid": i, "k": int(rng.integers(0, 5)), "t": int(rng.integers(0, 1000))}
                 for i in range(n)]
    right_rows = [{"rid": 10_000 + i, "k": int(rng.integers(0, 5)), "t": int(rng.integers(0, 1000))}
                  for i in range(400)]
    # planted: a right row exactly AT a left row's t (inclusive must match)
    right_rows.append({"rid": 99_999, "k": left_rows[0]["k"], "t": left_rows[0]["t"]})
    # planted: key 7 has lefts everywhere but rights ONLY at t < 10 — the
    # worst case for carry (virtually every block's lefts are locally
    # unresolved and must hit the broadcast summary)
    left_rows += [{"lid": n + i, "k": 7, "t": 10 + i} for i in range(500)]
    right_rows += [{"rid": 88_000 + t, "k": 7, "t": t} for t in range(3)]
    n += 500

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024  # force many sorted blocks
    try:
        out = asof_join(
            rd.from_items(left_rows), rd.from_items(right_rows),
            by="k", on="t", left_cols=["lid"],
            right_value_col="rid", right_seq_col="rid", out_value_col="prev_rid",
        ).to_pandas().sort_values("lid").reset_index(drop=True)
    finally:
        ctx.target_max_block_size = old

    # brute-force reference: max (t, rid) among same-key rights with t <= left t
    by_key: dict = {}
    for r in right_rows:
        by_key.setdefault(r["k"], []).append((r["t"], r["rid"]))
    exp = []
    for l in left_rows:
        cands = [(t, rid) for t, rid in by_key.get(l["k"], []) if t <= l["t"]]
        exp.append(max(cands)[1] if cands else None)
    got = [None if v != v else int(v) for v in out["prev_rid"]]  # NaN → None
    assert len(got) == n
    assert got == exp
    assert exp.count(None) > 0  # some lefts precede every right
    assert got[0] == 99_999  # inclusive: right at the exact same t matches


def test_connected_components_ds_raises_on_nonconvergence(ray_session):
    """A chain whose diameter exceeds max_rounds must raise, not silently
    return split clusters (each round advances min-labels one hop)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        connected_components_ds,
    )

    pairs = pa.table({"id_a": list(range(11)), "id_b": list(range(1, 12))})
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components_ds(rd.from_arrow(pairs), driver_threshold=0,
                                max_rounds=2)


def test_verify_jaccard_raises_on_missing_doc(ray_session):
    """Candidate ids absent from the doc store are a stale-store error, not
    empty documents (two fetch-misses would otherwise pair at Jaccard 1.0)."""
    from project_gutenberg_full_text_search_ray.stages.dedup import (
        VerifyJaccardStage,
    )

    store = pa.table({"doc_id": [1, 2], "text": ["alpha beta gamma", None]})
    stage = VerifyJaccardStage(store, "doc_id", "text", k_shingle=2, threshold=0.5)
    # NULL text is a real stored value: tokenizes to nothing, no raise
    ok = stage(pa.table({"id_a": [1], "id_b": [2]}))
    assert ok.num_rows == 0  # jaccard(nonempty, empty) = 0 < 0.5
    with pytest.raises(KeyError, match="missing"):
        stage(pa.table({"id_a": [1], "id_b": [99]}))


def test_ann_accepts_1d_query_vector(ray_session):
    """A single 1-D query vector must work through brute-force, LSH and IVF
    paths (not just an (n_q, dim) matrix)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_bucket_topk,
    )

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((80, 8))
    tbl = pa.table({"id": pa.array(np.arange(80, dtype=np.int64)),
                    "vec": pa.array(vecs.tolist(), type=pa.list_(pa.float64()))})
    q1d = vecs[17]  # 1-D: nearest neighbour is row 17 itself
    ds = rd.from_arrow(tbl)
    bf = brute_force_topk(ds, "vec", "id", q1d, k=3)
    assert bf["id"].to_pylist()[0] == 17
    lsh = lsh_bucket_topk(ds, "vec", "id", q1d, k=3)
    assert 17 in lsh["id"].to_pylist()
    ivf = ivf_topk(ds, "vec", "id", q1d, k=3, n_lists=4, n_probe=4)
    assert ivf["id"].to_pylist()[0] == 17


def test_token_hashes_long_token_no_dense_pad():
    """One very long token must not blow memory (fold works off the flat
    byte stream) and stays bit-identical to the scalar FNV-1a fold."""
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        token_hashes,
    )

    def fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for byte in b:
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    toks = ["hello", "", "a", "x" * 200_000, "the"]
    got = token_hashes(toks).tolist()
    assert got == [fnv(t.encode()) for t in toks]


def test_embedding_neardup_preserves_string_ids(ray_session):
    """embedding_neardup_pairs must work for non-integer doc ids (id dtype
    rides through from the input schema)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((20, 8))
    vecs[15] = vecs[3] * 1.01  # planted near-dup
    tbl = pa.table({"doc": pa.array([f"d{i:03d}" for i in range(20)]),
                    "vec": pa.array(vecs.tolist(), type=pa.list_(pa.float64()))})
    out = embedding_neardup_pairs(rd.from_arrow(tbl), "vec", "doc", threshold=0.98)
    pairs = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert ("d003", "d015") in pairs
    assert out.schema.field("id_a").type == pa.string()


def test_trigram_commit_race_existing_dir_wins(ray_session, tmp_path):
    """Concurrent trigram derivations of the same generation: the loser must
    adopt the winner's committed cache (and never rmtree it); an occupant
    without a matching _DONE is cleared and rebuilt."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import CorpusSpec, build_index
    from project_gutenberg_full_text_search_ray.stages.trigram import (
        ensure_trigram_index, fuzzy_expand,
    )

    spec = CorpusSpec(("doc_id",), "text", (), "tg_race")
    src = str(tmp_path / "src.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(pa.table({"doc_id": [1, 2], "text": ["window merge", "report title"]}), src)
    build_index(src, spec, idx)

    out1 = ensure_trigram_index(idx)
    mtime = os.path.getmtime(os.path.join(out1, "_DONE"))
    # second call adopts the committed cache untouched
    assert ensure_trigram_index(idx) == out1
    assert os.path.getmtime(os.path.join(out1, "_DONE")) == mtime
    # uncommitted occupant (no _DONE) is cleared and rebuilt
    os.remove(os.path.join(out1, "_DONE"))
    out2 = ensure_trigram_index(idx)
    assert out2 == out1 and os.path.exists(os.path.join(out1, "_DONE"))
    assert fuzzy_expand(idx, "windoq")  # index still serves lookups
    shutil.rmtree(idx)


def test_prefix_suffix_terms_case_insensitive(ray_session, tmp_path):
    """Mixed-case fragments must match the lowercase vocabulary, like their
    sibling fuzzy/contains expanders."""
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import CorpusSpec, build_index
    from project_gutenberg_full_text_search_ray.stages.trigram import (
        prefix_terms, suffix_terms,
    )

    spec = CorpusSpec(("doc_id",), "text", (), "tg_case")
    src = str(tmp_path / "src.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(pa.table({"doc_id": [1], "text": ["title window"]}), src)
    build_index(src, spec, idx)
    assert prefix_terms(idx, "Tit") == prefix_terms(idx, "tit") == ["title"]
    assert suffix_terms(idx, "DOW") == suffix_terms(idx, "dow") == ["window"]


def test_suggest_matches_bruteforce(engine, transcripts_table):
    """Autocomplete == brute-force (df DESC, term ASC) over the analyzer
    vocabulary; the wNNNNN token family gives a deep prefix bucket with
    distinct dfs AND exact ties (the alphabetical tie-break)."""
    from collections import Counter

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER

    df = Counter()
    for t in transcripts_table["text"].to_pylist():
        df.update(set(DEFAULT_ANALYZER.tokenize(t or "")))
    for prefix, k in (("w00", 10), ("w", 25), ("th", 5), ("zzz", 3)):
        exp = sorted(((t, n) for t, n in df.items() if t.startswith(prefix)),
                     key=lambda x: (-x[1], x[0]))[:k]
        got = engine.suggest(prefix, k=k)
        assert list(zip(got["term"].to_pylist(), got["df"].to_pylist())) == exp
    assert engine.suggest("ZZZ_nothing").num_rows == 0


def test_suggest_case_insensitive(engine):
    a, b = engine.suggest("W00", k=8), engine.suggest("w00", k=8)
    assert a.equals(b) and a.num_rows > 0


def test_did_you_mean_matches_bruteforce(engine, transcripts_table):
    """Spelling suggestion == brute-force (word_similarity DESC, df DESC,
    term ASC): among the wNNNNN tokens a misspelling has MANY candidates at
    identical trigram similarity, so the df tie-break is load-bearing."""
    from collections import Counter

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.stages.trigram import trigrams

    df = Counter()
    for t in transcripts_table["text"].to_pylist():
        df.update(set(DEFAULT_ANALYZER.tokenize(t or "")))
    for word, min_sim in (("w0001", 0.3), ("quik", 0.4), ("w00012", 0.4)):
        qt = trigrams(word)
        exp = []
        for t, n in df.items():
            sim = len(qt & trigrams(t)) / len(qt)
            if sim >= min_sim:
                exp.append((t, sim, n))
        exp.sort(key=lambda x: (-x[1], -x[2], x[0]))
        exp = [(t, int(np.floor(s * 10000 + 0.5)), n) for t, s, n in exp[:5]]
        got = engine.did_you_mean(word, k=5, min_sim=min_sim)
        assert list(zip(got["term"].to_pylist(), got["sim_i4"].to_pylist(),
                        got["df"].to_pylist())) == exp, word
    assert engine.did_you_mean("zq").num_rows == 0  # no shared trigrams


def test_suggest_and_did_you_mean_field_scoped(ray_session):
    """Field scope: candidates come from the field's own posting keyspace
    and word parts are returned (same contract as fuzzy_expand/prefix_terms)."""
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        ensure_head_field_index,
    )

    eng = ensure_head_field_index(SF)
    got = eng.suggest("s", k=10, field="head")
    assert got.num_rows > 0
    assert all(not t.startswith("head") for t in got["term"].to_pylist())
    unscoped = eng.suggest("s", k=10)
    # head = first 8 tokens only → a term's head-field df can't exceed its
    # whole-text df
    udf = dict(zip(unscoped["term"].to_pylist(), unscoped["df"].to_pylist()))
    for t, d in zip(got["term"].to_pylist(), got["df"].to_pylist()):
        assert d <= udf.get(t, d)
    dym = eng.did_you_mean("tabel", field="head")
    assert dym.num_rows > 0 and dym["term"].to_pylist()[0] == "table"


def test_quantiles_ignore_nulls_like_quantile_disc(ray_session, tmp_path):
    """q_quantiles over a documents table containing NULL n_chars must match
    DuckDB quantile_disc (which ignores NULLs) instead of crashing on the
    NaN the null int64 becomes through to_numpy."""
    import duckdb
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.pipelines.driver_nested import (
        _QUANTILES,
        q_quantiles,
    )

    vals = list(range(1, 101)) + [None] * 17
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(vals)), type=pa.int64()),
                  "n_chars": pa.array(vals, type=pa.int64())}),
        str(tmp_path / "documents.parquet"))
    got = q_quantiles(str(tmp_path)).to_pandas().sort_values("pct").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    sql = " UNION ALL ".join(
        f"SELECT '{name}' AS pct, quantile_disc(n_chars, {q}) AS val FROM documents"
        for name, q in _QUANTILES)
    exp = con.execute(f"SELECT pct, CAST(val AS BIGINT) AS val FROM ({sql}) ORDER BY pct").df()
    assert got["pct"].tolist() == exp["pct"].tolist()
    assert got["val"].tolist() == exp["val"].tolist()


def test_embedding_lsh_uneven_planes_and_wide_codes(ray_session):
    """n_planes not a multiple of bands must work (remainder planes ignored,
    like the scalar banding); oversized codes must raise loudly instead of
    silently merging buckets across bands."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        embedding_neardup_pairs_lsh,
    )

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((40, 8))
    vecs[30] = vecs[3] * 1.01
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(40, dtype=np.int64)),
        "vec": pa.array(vecs.tolist(), type=pa.list_(pa.float64()))}))
    out = embedding_neardup_pairs_lsh(ds, "vec", "id", threshold=0.98,
                                      n_planes=18, bands=4).to_pandas()
    assert (3, 30) in set(zip(out["id_a"], out["id_b"]))
    with pytest.raises(ValueError, match="overflow"):
        embedding_neardup_pairs_lsh(ds, "vec", "id", n_planes=256, bands=4)
    with pytest.raises(ValueError, match="<"):
        embedding_neardup_pairs_lsh(ds, "vec", "id", n_planes=2, bands=4)


def test_heavy_hitters_misra_gries_guarantees(ray_session):
    """Approximate regime (capacity < distinct): every value with true
    count > err must be present, and true counts must lie within
    [count_lower, count_lower + err].  Exact regime (capacity >= distinct):
    err == 0 and counts match an exact groupby."""
    import collections

    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(11)
    # zipf-ish: a few heavy users over a long tail, plus NULLs as a group
    vals = ([7] * 400 + [13] * 250 + [99] * 120 + [None] * 60
            + [int(v) for v in rng.integers(1000, 1150, size=600)])
    rng.shuffle(vals)
    tbl = pa.table({"user_id": pa.array(vals, type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(7)
    true = collections.Counter(v if v is not None else "NULL" for v in vals)

    # presence is guaranteed BEFORE the top-k cut (heavy_hitters docstring):
    # assert it with k covering every possible survivor, then check the
    # small-k shape separately
    top, err = heavy_hitters(ds, "user_id", k=10_000, capacity=16)
    assert err > 0  # truncation really happened
    got = {(v if v is not None else "NULL"): c
           for v, c in zip(top["user_id"].to_pylist(), top["count_lower"].to_pylist())}
    for v, c in true.items():
        if c > err:
            assert v in got, (v, c, err)
    top8, _ = heavy_hitters(ds, "user_id", k=8, capacity=16)
    assert top8.num_rows <= 8
    for v, lo in got.items():
        assert lo <= true[v] <= lo + err, (v, lo, true[v], err)
    assert top["user_id"].type == pa.int64()

    exact, err0 = heavy_hitters(ds, "user_id", k=4, capacity=4096)
    assert err0 == 0
    expect = sorted(true.items(), key=lambda kv: (-kv[1], float("inf") if kv[0] == "NULL" else kv[0]))[:4]
    got_exact = [((v if v is not None else "NULL"), c) for v, c in
                 zip(exact["user_id"].to_pylist(), exact["count_lower"].to_pylist())]
    assert got_exact == expect


def test_kmv_distinct_count_regimes(ray_session):
    """Exact regime (k > distinct) returns the true distinct count; the
    approximate regime estimates within a few standard errors."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.sketches import distinct_count

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 5000, size=20000)
    true = len(np.unique(vals))
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, type=pa.int64())})).repartition(8)
    est, exact = distinct_count(ds, "v", k=1 << 14)
    assert exact and est == true
    est2, exact2 = distinct_count(ds, "v", k=256)
    assert not exact2
    rse = 1.0 / np.sqrt(256 - 2)
    assert abs(est2 - true) <= 5 * rse * true, (est2, true)


def test_ivf_train_sample_is_global_bottomk(ray_session):
    """The hash-bottom-k training sample must equal the TRUE global bottom-k
    (one total order — int64 hash view — both in the per-block selection and
    the global sort), regardless of how rows split across blocks."""
    import numpy as np
    import ray.data as rd
    from pandas.util import hash_array

    from project_gutenberg_full_text_search_ray.stages.similarity import _train_sample_vectors

    # one big block + one tiny block (the regression shape: a signed/unsigned
    # mismatch makes tiny unpruned blocks dominate the sample)
    rows_a = [{"vec_id": i, "embedding": [float(i), 0.0]} for i in range(5000)]
    rows_b = [{"vec_id": 100000 + i, "embedding": [float(-i), 1.0]} for i in range(40)]
    ds = rd.from_items(rows_a).union(rd.from_items(rows_b))
    k = 16
    sample = _train_sample_vectors(ds, "embedding", "vec_id", k)
    ids_all = np.array([r["vec_id"] for r in rows_a + rows_b], dtype=np.int64)
    h = hash_array(ids_all, categorize=False).view(np.int64)
    expected_ids = ids_all[np.argsort(h, kind="stable")[:k]]
    exp = {(float(i if i < 100000 else -(i - 100000)),
            0.0 if i < 100000 else 1.0) for i in expected_ids}
    got = {tuple(v) for v in sample}
    assert got == exp


def test_dedup_default_doc_source_respects_transforms(ray_session, tmp_path):
    """A dataset transformed AFTER read_parquet must NOT verify against the
    raw files (that computes Jaccard on different strings than the
    signatures): the default falls back to the broadcast of the transformed
    rows, so every pair of now-identical docs verifies at 1.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import ngram_jaccard_pairs

    p = str(tmp_path / "raw.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(6)),
        "text": [f"completely distinct document number {i} with words w{i}a w{i}b w{i}c"
                 for i in range(6)],
    }), p)

    def make_same(b: pa.Table) -> pa.Table:
        same = pa.array(["identical canonical text for every doc here"] * b.num_rows)
        return b.set_column(b.schema.get_field_index("text"), "text", same)

    ds = rd.read_parquet(p).map_batches(make_same, batch_format="pyarrow")
    got = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.9).to_pandas()
    assert len(got) == 15  # C(6,2): every transformed doc is identical
    assert set(got["jacc_i4"]) == {10000}
    # untransformed read still uses the file fallback and finds nothing
    got2 = ngram_jaccard_pairs(rd.read_parquet(p), "text", "doc_id",
                               threshold=0.9).to_pandas()
    assert len(got2) == 0


def test_sessionize_sessions_span_blocks(ray_session):
    """A single ≤gap-chained run larger than any one sort block must come
    back as ONE session (the O(blocks) driver chain walk propagates the
    session start through every block boundary)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.sessionize import sessionize

    n = 50_000
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(np.full(n, 7), type=pa.int64()),
        # strictly increasing, every step below the gap
        "ts_us": pa.array(np.arange(n, dtype=np.int64) * 1000, type=pa.int64()),
    })
    # repartition BEFORE the sort: the range partitioner produces about as
    # many sorted output blocks as input blocks, so the single chained run
    # genuinely spans block boundaries (verified below via the sorted
    # intermediate's own block count)
    ds = rd.from_arrow(t).repartition(16)
    srt = ds.sort(["user_id", "ts_us", "event_id"]).materialize()
    assert srt.num_blocks() > 1  # the scenario under test actually occurs
    out = sessionize(ds, "user_id", "ts_us", "event_id", gap_us=10_000).to_pandas()
    assert len(out) == n
    assert set(out["session_id"]) == {0}  # one session, started at event 0


def test_sessionize_duplicate_ids_across_users(ray_session):
    """Regression: the cross-block fixup map is keyed by the block head's
    FULL (user, ts, id) sort key.  Keyed by id alone, two blocks whose first
    rows share an id value (ids unique only per user — duplicate_spans
    passes token positions) collided, leaking one user's session start into
    another user's rows and splitting an unbroken chain."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.sessionize import sessionize

    # the duplicate_spans shape: user = doc, ts = id = token position;
    # one single-row block per row forces every chain across block
    # boundaries and makes several blocks start with the same id value
    rows = [{"u": 0, "p": 1}, {"u": 0, "p": 2}, {"u": 0, "p": 3},
            {"u": 1, "p": 0}, {"u": 1, "p": 1}, {"u": 1, "p": 2}]
    t = pa.table({"u": pa.array([r["u"] for r in rows], type=pa.int64()),
                  "ts": pa.array([r["p"] for r in rows], type=pa.int64()),
                  "id": pa.array([r["p"] for r in rows], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(len(rows))
    out = sessionize(ds, "u", "ts", "id", gap_us=4).to_pandas()
    got = {(r.u, r.id): r.session_id for r in out.itertuples()}
    assert got == {(0, 1): 1, (0, 2): 1, (0, 3): 1,
                   (1, 0): 0, (1, 1): 0, (1, 2): 0}


def test_sessionize_gaps_users_and_nulls(ray_session):
    """Break on gap, break on user change, NULL user/ts rows get NULL
    session — matches the DuckDB window oracle's semantics exactly."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.sessionize import sessionize

    rows = [
        # user 1: two sessions (gap between id 2 and id 3)
        {"event_id": 1, "user_id": 1, "ts_us": 0},
        {"event_id": 2, "user_id": 1, "ts_us": 50},
        {"event_id": 3, "user_id": 1, "ts_us": 10_000},
        # user 2: one session; same ts tie broken by id
        {"event_id": 5, "user_id": 2, "ts_us": 0},
        {"event_id": 4, "user_id": 2, "ts_us": 0},
        # unsessionizable
        {"event_id": 6, "user_id": None, "ts_us": 0},
        {"event_id": 7, "user_id": 3, "ts_us": None},
    ]
    out = sessionize(rd.from_items(rows), "user_id", "ts_us", "event_id",
                     gap_us=100).to_pandas().set_index("event_id")["session_id"]
    assert out[1] == 1 and out[2] == 1 and out[3] == 3
    assert out[4] == 4 and out[5] == 4  # tie: id 4 sorts first
    assert out.isna()[6] and out.isna()[7]


def test_sessionize_timestamp_unit_normalized(ray_session):
    """gap_us must compare MICROSECONDS for every timestamp unit: a
    timestamp[ms] (or [s]/[ns]) column previously leaked raw ticks into the
    gap comparison, sessionizing with a gap off by 1e3/1e6 (ADVICE r3)."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.sessionize import sessionize

    # events at 0 ms, 50 ms, 10_000 ms: with gap_us=100_000 (=100 ms) the
    # first two chain and the third starts a new session
    for unit, scale in (("ms", 1), ("us", 1000), ("ns", 1_000_000), ("s", None)):
        if unit == "s":
            ticks = [0, 0, 10]  # 0 s, 0 s, 10 s — same break structure
        else:
            ticks = [0 * scale, 50 * scale, 10_000 * scale]
        t = pa.table({
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array(ticks, type=pa.timestamp(unit)),
        })
        out = (sessionize(rd.from_arrow(t), "user_id", "ts", "event_id",
                          gap_us=100_000)
               .to_pandas().set_index("event_id")["session_id"])
        assert out[1] == 1 and out[2] == 1 and out[3] == 3, unit


def test_get_and_get_many(engine):
    """Reference README's fts.get / fts.get_many (README.md:107-110 —
    documented there, absent from its code): point lookups by identity."""
    import pytest as _pytest

    row = engine.get("conv-00000003", 2)
    assert row is not None
    assert row["conv_id"] == "conv-00000003" and row["turn_idx"] == 2
    # FULL crosswalk = identity + metadata + dl + score; the segment doc
    # store (like the reference MV) does not retain raw text
    assert "role" in row and "dl" in row

    assert engine.get("conv-99999999", 0) is None
    with _pytest.raises(ValueError, match="id value"):
        engine.get("conv-00000003")

    ids = [("conv-00000005", 1), ("conv-00000002", 0),
           ("conv-99999999", 7), ("conv-00000002", 3)]
    t = engine.get_many(ids)
    got = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    # identity-ordered, missing id absent
    assert got == [("conv-00000002", 0), ("conv-00000002", 3),
                   ("conv-00000005", 1)]

    # a batch larger than the facade page clamp still comes back whole
    many = [("conv-%08d" % c, i) for c in range(30) for i in range(4)]
    t2 = engine.get_many(many)
    assert t2.num_rows == 120

    with _pytest.raises(ValueError, match="id must have"):
        engine.get_many([("conv-00000001",)])
    assert engine.get_many([]).num_rows == 0


def test_knn_join_matches_bruteforce(ray_session):
    """knn_join == per-row brute force (cos desc, id asc tie-break), block
    layout invariant, pool semantics (disjoint query subset vs full pool)."""
    import numpy as np
    import ray
    import ray.data as rd
    from project_gutenberg_full_text_search_ray.stages.similarity import (
        knn_join, _normalize)

    rng = np.random.default_rng(7)
    N, d, k = 97, 16, 5
    V = rng.normal(size=(N, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(N), type=pa.int64()),
                  "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32()))})

    Mn = _normalize(V.astype(np.float64))
    S = Mn @ Mn.T
    np.fill_diagonal(S, -np.inf)

    def collect(ds):
        tabs = [b for b in ray.get(ds.to_arrow_refs())
                if b.num_rows and "cos_i4" in b.column_names]
        return pa.concat_tables(tabs).sort_by(
            [("vec_id", "ascending"), ("rank", "ascending")])

    for parts in (1, 7):  # block-layout invariance
        out = collect(knn_join(rd.from_arrow(t).repartition(parts),
                               "embedding", "vec_id", k=k))
        assert out.num_rows == N * k
        nid = np.asarray(out["neighbor_id"])
        cos = np.asarray(out["cos_i4"])
        for q in range(N):
            order = np.lexsort((np.arange(N), -S[q]))[:k]
            assert (nid[q * k:(q + 1) * k] == order).all()
            assert (cos[q * k:(q + 1) * k]
                    == np.floor(S[q][order] * 10000 + 0.5)).all()

    # disjoint query subset against the full pool: self still excluded by id
    qds = rd.from_arrow(t.slice(0, 10))
    rows = knn_join(qds, "embedding", "vec_id", k=3,
                    pool=rd.from_arrow(t)).take_all()
    assert len(rows) == 30
    assert all(r["vec_id"] < 10 and r["neighbor_id"] != r["vec_id"]
               for r in rows)

    # k larger than pool: clamped to pool_size - 1
    tiny = rd.from_arrow(t.slice(0, 4))
    rows = knn_join(tiny, "embedding", "vec_id", k=50).take_all()
    assert len(rows) == 4 * 3


def test_knn_join_ivf(ray_session, tmp_path):
    """knn_join_ivf: probe-all == exact knn_join (bit-identical, the driver
    oracle's contract); pruned probes are a subset with bounded recall loss;
    per-actor list cache survives multiple query blocks."""
    import numpy as np
    import ray
    import ray.data as rd
    from project_gutenberg_full_text_search_ray.stages.similarity import (
        IVFIndex, knn_join, knn_join_ivf)

    rng = np.random.default_rng(17)
    N, d, k = 211, 12, 4
    V = rng.normal(size=(N, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(N), type=pa.int64()),
                  "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(5)
    idx = IVFIndex.build(ds, "embedding", "vec_id", str(tmp_path / "ivf"),
                         n_lists=6, train_sample=128)

    def collect(dso):
        tabs = [b for b in ray.get(dso.to_arrow_refs())
                if b.num_rows and "cos_i4" in b.column_names]
        return pa.concat_tables(tabs).sort_by(
            [("vec_id", "ascending"), ("rank", "ascending")])

    exact = collect(knn_join(ds, "embedding", "vec_id", k=k))
    # probe-all reads every partition → EXACT equality with the brute join
    probeall = collect(knn_join_ivf(ds, idx.index_dir, k=k, n_probe=6))
    assert probeall.equals(exact)

    # pruned probe: every emitted row must ALSO be exact-correct w.r.t. the
    # probed subset, and overall neighbor recall stays useful (>= 0.5 with
    # 2/6 lists on random Gaussians; typically much higher)
    pruned = collect(knn_join_ivf(ds, idx.index_dir, k=k, n_probe=2))
    assert pruned.num_rows == N * k  # every probed list holds >= k+1 here
    ex_pairs = set(zip(exact["vec_id"].to_pylist(),
                       exact["neighbor_id"].to_pylist()))
    pr_pairs = set(zip(pruned["vec_id"].to_pylist(),
                       pruned["neighbor_id"].to_pylist()))
    recall = len(ex_pairs & pr_pairs) / len(ex_pairs)
    assert recall >= 0.5
    # rank/cos consistency inside each row group of the pruned result
    for name in ("rank", "cos_i4"):
        assert pruned[name].null_count == 0
    rk = np.asarray(pruned["rank"])
    assert (rk.reshape(N, k) == np.arange(1, k + 1)).all()


def test_apply_dedup_broadcast_and_antijoin(ray_session):
    """apply_dedup drops exactly the non-canonical (rep != id) cluster
    members on BOTH physical routes: broadcast drop-set (default) and the
    native left-anti join (forced via broadcast_threshold=0)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import apply_dedup

    corpus = pa.table({
        "doc_id": list(range(10)),
        "lang": [f"l{i % 3}" for i in range(10)],
        "n_chars": [10 * i for i in range(10)],
    })
    # clusters {0,1,2} and {7,9}; docs 3-6, 8 unpaired
    labels = pa.table({"id": [0, 1, 2, 7, 9], "rep": [0, 0, 0, 7, 7]})
    expect = corpus.filter(
        pc.invert(pc.is_in(corpus["doc_id"], pa.array([1, 2, 9]))))

    got_b = apply_dedup(rd.from_arrow(corpus), rd.from_arrow(labels), "doc_id")
    tb = pa.concat_tables(ray.get(got_b.to_arrow_refs())).sort_by("doc_id")
    assert tb.equals(expect)
    # columns and within-block order preserved on the broadcast route
    assert tb.column_names == ["doc_id", "lang", "n_chars"]

    got_j = apply_dedup(rd.from_arrow(corpus), rd.from_arrow(labels), "doc_id",
                        broadcast_threshold=0)
    tj = (pa.concat_tables(
        b.select(["doc_id", "lang", "n_chars"])
        for b in ray.get(got_j.to_arrow_refs()) if b.num_rows)
        .sort_by("doc_id"))
    assert tj.equals(expect)


def test_apply_dedup_no_drops_is_identity(ray_session):
    """All-canonical labels (and empty labels) leave the corpus untouched."""
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import apply_dedup

    corpus = pa.table({"doc_id": [5, 6, 7], "n_chars": [1, 2, 3]})
    for labels in (
        pa.table({"id": [5, 6], "rep": [5, 6]}),  # self-reps only
        pa.table({"id": pa.array([], type=pa.int64()),
                  "rep": pa.array([], type=pa.int64())}),
    ):
        out = apply_dedup(rd.from_arrow(corpus), rd.from_arrow(labels), "doc_id")
        t = pa.concat_tables(ray.get(out.to_arrow_refs())).sort_by("doc_id")
        assert t.equals(corpus)


def test_exact_dedup_labels_and_apply(ray_session):
    """exact_dedup_labels emits (id, rep=min id) for every member of each
    identical-key group (NULL keys one group, unique docs absent); feeding
    apply_dedup keeps exactly one copy per text."""
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        apply_dedup,
        exact_dedup_labels,
    )

    corpus = pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "text": ["aa", "bb", "aa", None, "cc", None, "aa"],
    })
    labels = exact_dedup_labels(rd.from_arrow(corpus), "doc_id", "text")
    lt = pa.concat_tables(
        b for b in ray.get(labels.to_arrow_refs()) if b.num_rows
    ).sort_by("id")
    assert lt["id"].to_pylist() == [1, 3, 4, 6, 7]
    assert lt["rep"].to_pylist() == [1, 1, 4, 4, 1]

    kept = apply_dedup(rd.from_arrow(corpus),
                       exact_dedup_labels(rd.from_arrow(corpus), "doc_id", "text"),
                       "doc_id")
    kt = pa.concat_tables(
        b for b in ray.get(kept.to_arrow_refs()) if b.num_rows).sort_by("doc_id")
    assert kt["doc_id"].to_pylist() == [1, 2, 4, 5]

    # no duplicates -> empty labels, identity corpus
    uniq = pa.table({"doc_id": [1, 2], "text": ["x", "y"]})
    lbl = exact_dedup_labels(rd.from_arrow(uniq), "doc_id", "text")
    assert lbl.count() == 0


def test_apply_dedup_block_layout_invariance(ray_session):
    """apply_dedup's kept ROW SET is invariant to corpus block layout and to
    the physical route (broadcast vs anti-join) — property sweep vs a
    driver-side brute-force expectation."""
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import apply_dedup

    rng = np.random.default_rng(99)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    # random clusters: ~30 groups of 1-6 members over a subset of docs
    reps, mems = [], []
    pool = rng.permutation(n)[:120]
    i = 0
    while i < len(pool):
        size = int(rng.integers(1, 7))
        grp = np.sort(pool[i:i + size])
        i += size
        if len(grp) < 2:
            continue
        for m in grp:
            mems.append(int(m))
            reps.append(int(grp[0]))
    labels = pa.table({"id": pa.array(mems, type=pa.int64()),
                       "rep": pa.array(reps, type=pa.int64())})
    drop = {m for m, r in zip(mems, reps) if m != r}
    expected = sorted(set(ids.tolist()) - drop)

    corpus = pa.table({"doc_id": ids, "x": ids * 7})
    for nblocks in (1, 3, 16):
        ds = rd.from_arrow(corpus).repartition(nblocks)
        for thr in (5_000_000, 0):  # broadcast route, then anti-join route
            out = apply_dedup(ds, rd.from_arrow(labels), "doc_id",
                              broadcast_threshold=thr)
            got = sorted(
                v for b in ray.get(out.to_arrow_refs()) if b.num_rows
                for v in b["doc_id"].to_pylist())
            assert got == expected, (nblocks, thr)


def test_jaccard_similarity_join_semantics(ray_session):
    """similarity join: per-left top-1 by Jaccard with min-right-id ties,
    semi-join semantics (unmatched left rows absent), empty-result path,
    and the 2^32 right-id packing guard."""
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        jaccard_similarity_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    left = pa.table({"lid": pa.array([0, 1], type=pa.int64()),
                     "text": [base, "nothing in common here at all"]})
    # rids 10 and 11 tie exactly (identical text) -> min rid wins
    right = pa.table({"rid": pa.array([11, 10, 12], type=pa.int64()),
                      "text": [base, base, "unrelated filler words entirely"]})
    out = jaccard_similarity_join(rd.from_arrow(left), rd.from_arrow(right),
                                  "text", "lid", "rid", threshold=0.5)
    t = pa.concat_tables(
        b for b in ray.get(out.to_arrow_refs()) if b.num_rows).sort_by("left_id")
    assert t["left_id"].to_pylist() == [0]
    assert t["right_id"].to_pylist() == [10]  # tie -> smallest right id
    assert t["jacc_i4"].to_pylist() == [10000]

    # no qualifying pairs at all -> typed empty result
    none = jaccard_similarity_join(
        rd.from_arrow(left.slice(1, 1)), rd.from_arrow(right.slice(2, 1)),
        "text", "lid", "rid", threshold=0.9)
    assert none.count() == 0
    assert set(none.schema().base_schema.names) == {"left_id", "right_id", "jacc_i4"}

    for bad_id in (1 << 33, -7):  # packing guard: both bounds raise
        big = pa.table({"rid": pa.array([bad_id], type=pa.int64()),
                        "text": [base]})
        with pytest.raises(Exception, match="2\\^32"):
            jaccard_similarity_join(
                rd.from_arrow(left), rd.from_arrow(big),
                "text", "lid", "rid", threshold=0.5).materialize()


def test_apply_dedup_string_ids(ray_session):
    """The broadcast route must handle non-integer id columns (Arrow is_in
    membership instead of the int64 searchsorted fast path)."""
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import apply_dedup

    corpus = pa.table({"doc_id": [f"pg-{i}" for i in range(6)],
                       "x": list(range(6))})
    labels = pa.table({"id": ["pg-1", "pg-2", "pg-4"],
                       "rep": ["pg-1", "pg-1", "pg-4"]})
    out = apply_dedup(rd.from_arrow(corpus), rd.from_arrow(labels), "doc_id")
    t = pa.concat_tables(
        b for b in ray.get(out.to_arrow_refs()) if b.num_rows).sort_by("doc_id")
    assert t["doc_id"].to_pylist() == ["pg-0", "pg-1", "pg-3", "pg-4", "pg-5"]


def test_jaccard_similarity_join_topk(ray_session):
    """k>1: ranked match lists per left row, distinct right ids (the
    distinct-pair MIN guards against duplicated verify emissions filling
    several rank slots), rank 1 = best."""
    import ray
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        jaccard_similarity_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    left = pa.table({"lid": pa.array([0], type=pa.int64()), "text": [base]})
    right = pa.table({
        "rid": pa.array([10, 11, 12, 13], type=pa.int64()),
        "text": [base,                                   # J = 1.0
                 base.replace("kappa", "zz"),            # high J
                 base.replace("iota kappa", "aa bb"),    # lower J
                 "completely different words here"],     # below threshold
    })
    out = jaccard_similarity_join(rd.from_arrow(left), rd.from_arrow(right),
                                  "text", "lid", "rid", threshold=0.2, k=3)
    t = pa.concat_tables(
        b for b in ray.get(out.to_arrow_refs()) if b.num_rows
    ).sort_by([("left_id", "ascending"), ("rank", "ascending")])
    assert t["rank"].to_pylist() == [1, 2, 3]
    assert t["right_id"].to_pylist() == [10, 11, 12]
    ja = t["jacc_i4"].to_pylist()
    assert ja[0] == 10000 and ja[0] > ja[1] > ja[2]
    assert len(set(t["right_id"].to_pylist())) == 3  # distinct matches


def test_more_like_this(ray_session, tmp_path):
    """MLT: top tf-idf terms of the source doc (index-dictionary df),
    OR-searched with the source excluded; degenerate inputs are loud."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from project_gutenberg_full_text_search_ray import (
        FullTextSearchEngine, build_index)
    from project_gutenberg_full_text_search_ray.corpus import CorpusSpec
    from project_gutenberg_full_text_search_ray.pipelines.search import (
        more_like_this)

    rng = np.random.default_rng(7)
    common = [f"w{i}" for i in range(20)]
    texts = []
    for i in range(40):
        toks = list(rng.choice(common, size=12))
        if i % 10 == 0:
            toks += ["zebra", "quagga"]       # rare terms shared by 0,10,20,30
        texts.append(" ".join(toks))
    texts.append("")                           # token-less doc 40
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(41), type=pa.int64()),
        "text": texts}), src)
    spec = CorpusSpec(id_cols=("doc_id",), text_col="text",
                      meta_cols=(), name="mlt")
    idx = str(tmp_path / "idx")
    build_index(src, spec, idx, docs_per_segment=16)
    eng = FullTextSearchEngine(idx)

    terms, res = more_like_this(eng, 0, doc_source=src, k_terms=4, size=5)
    assert "zebra" in terms and "quagga" in terms   # rarest terms win
    got = res.table["doc_id"].to_pylist()
    assert 0 not in got                              # source excluded
    assert set(got[:3]) <= {10, 20, 30}              # zebra/quagga docs rank first

    with _pytest.raises(ValueError, match="no analyzer tokens"):
        more_like_this(eng, 40, doc_source=src)
    with _pytest.raises(KeyError, match="not in"):
        more_like_this(eng, 999, doc_source=src)


def test_ts_stat_matches_bruteforce(engine, transcripts_table):
    """ts_stat == brute-force (nentry DESC, ndoc DESC, word ASC) over the
    analyzer token stream: ndoc = docs containing the word, nentry = total
    occurrences — PG ts_stat's report, straight from the S5 dictionary."""
    from collections import Counter

    from project_gutenberg_full_text_search_ray.functions.analyzer import (
        DEFAULT_ANALYZER)

    ndoc, nentry = Counter(), Counter()
    for t in transcripts_table["text"].to_pylist():
        toks = DEFAULT_ANALYZER.tokenize(t or "")
        ndoc.update(set(toks))
        nentry.update(toks)
    exp = sorted(((w, ndoc[w], nentry[w]) for w in ndoc),
                 key=lambda x: (-x[2], -x[1], x[0]))
    got = engine.ts_stat(25)
    assert list(zip(got["word"].to_pylist(), got["ndoc"].to_pylist(),
                    got["nentry"].to_pylist())) == exp[:25]
    full = engine.ts_stat()
    assert full.num_rows == len(ndoc)


def test_ts_stat_field_scoped(ray_session):
    """Field scope: stats come from the field's own posting keyspace with
    the prefix stripped, and a term's field-scoped counts can't exceed its
    whole-text counts (head = first 8 tokens only)."""
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import (
        ensure_head_field_index,
    )

    eng = ensure_head_field_index(SF)
    scoped = eng.ts_stat(15, field="head")
    assert scoped.num_rows > 0
    words = scoped["word"].to_pylist()
    assert all("\x1f" not in w and not w.startswith("head") for w in words)
    full = eng.ts_stat()
    fmap = {w: (nd, ne) for w, nd, ne in zip(
        full["word"].to_pylist(), full["ndoc"].to_pylist(),
        full["nentry"].to_pylist())}
    for w, nd, ne in zip(words, scoped["ndoc"].to_pylist(),
                         scoped["nentry"].to_pylist()):
        assert ne >= nd > 0
        fnd, fne = fmap[w]
        assert nd <= fnd and ne <= fne
    # the unscoped report must not leak field-scoped posting keys
    assert all("\x1f" not in w for w in full["word"].to_pylist())
