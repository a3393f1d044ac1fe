"""Parser-kernel (N3–N8) and nested-containment (F10–F15) unit tests.

DuckDB is the semantics oracle for every kernel that claims DuckDB parity
(split_part / concat_ws / regexp-split / html-escape chain / json path)."""

import duckdb
import numpy as np
import pytest
import pyarrow as pa
import pyarrow.compute as pc

from project_gutenberg_full_text_search_ray.functions import parsers as P
from project_gutenberg_full_text_search_ray.stages.segment_search import FilterSpec, apply_filters

VALS = ["a b c", "one", "", None, "x  y", "alpha beta gamma delta",
        "Updated: 2020 foo", "pre Updated: 2021", " lead trail "]


def _duck_col(vals, expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    for v in vals:
        con.execute("INSERT INTO t VALUES (?)", [v])
    return [r[0] for r in con.execute(f"SELECT {expr} FROM t").fetchall()]


def test_split_part_matches_duckdb():
    col = pa.array(VALS, type=pa.string())
    for n in (1, 2, 3, 5):
        mine = P.split_part(col, " ", n).to_pylist()
        exp = _duck_col(VALS, f"split_part(s, ' ', {n})")
        assert mine == exp, f"n={n}"


def test_regexp_split_first_matches_duckdb():
    col = pa.array(VALS, type=pa.string())
    mine = P.regexp_split_first(col, "Updated:").to_pylist()
    exp = _duck_col(VALS, "regexp_split_to_array(s, 'Updated:')[1]")
    assert mine == exp
    # NULL input stays NULL (list-function semantics, unlike split_part)
    assert mine[3] is None


def test_parse_struct_fields():
    st = P.parse_struct_fields(pa.array(["a b c d", "only", None]))
    assert st.to_pylist() == [
        {"a": "a", "b": "b", "c": "c"},
        {"a": "only", "b": "", "c": ""},
        {"a": "", "b": "", "c": ""},
    ]


def test_concat_ws_skips_nulls_like_duckdb():
    a = pa.array(["x", None, "z", None])
    b = pa.array(["1", "2", None, None])
    mine = P.concat_ws("|", a, b).to_pylist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    for x, y in zip(a.to_pylist(), b.to_pylist()):
        con.execute("INSERT INTO t VALUES (?, ?)", [x, y])
    exp = [r[0] for r in con.execute("SELECT concat_ws('|', a, b) FROM t").fetchall()]
    assert mine == exp == ["x|1", "2", "z", ""]


def test_html_escape_matches_stdlib_and_sql():
    import html

    raw = ['<a href="x">&\'hi\'</a>', "plain", "&&<<"]
    col = pa.array(raw)
    mine = P.html_escape(col).to_pylist()
    assert mine == [html.escape(s) for s in raw]
    exp = _duck_col(raw, P.html_escape_sql("s"))
    assert mine == exp


def test_json_extract_int():
    col = pa.array(['{"k": 87}', '{"k": -3, "m": 1}', '{"m": 5}', None,
                    '{ "k" : 12 }', '{"k": "str"}'])
    got = P.json_extract_int(col, "k").to_pylist()
    assert got == [87, -3, None, None, 12, None]


def test_any_eq_filter():
    tags = pa.array([["a", "b"], [], None, ["c"], ["b", "b"]],
                    type=pa.list_(pa.string()))
    t = pa.table({"tags": tags, "i": list(range(5))})
    mask = apply_filters(t, [FilterSpec("tags", "any_eq", "b")])
    assert mask.tolist() == [True, False, False, False, True]


def test_struct_any_filter():
    typ = pa.list_(pa.struct([("cid", pa.int64()), ("role", pa.string())]))
    creators = pa.array([
        [{"cid": 1, "role": "author"}, {"cid": 3, "role": "editor"}],
        [{"cid": 3, "role": "author"}],  # right cid, wrong role
        [],
        None,
        [{"cid": 3, "role": "editor"}],
    ], type=typ)
    t = pa.table({"creators": creators, "i": list(range(5))})
    mask = apply_filters(t, [FilterSpec("creators", "struct_any",
                                        {"cid": 3, "role": "editor"})])
    assert mask.tolist() == [True, False, False, False, True]


def test_struct_any_composes_with_other_filters():
    typ = pa.list_(pa.struct([("cid", pa.int64())]))
    t = pa.table({
        "c": pa.array([[{"cid": 1}], [{"cid": 1}], [{"cid": 2}]], type=typ),
        "n": [10, 20, 30],
    })
    mask = apply_filters(t, [FilterSpec("c", "struct_any", {"cid": 1}),
                             FilterSpec("n", ">=", 15)])
    assert mask.tolist() == [False, True, False]


def test_chunked_list_column():
    a1 = pa.array([["x"], ["y"]], type=pa.list_(pa.string()))
    a2 = pa.array([["x", "z"]], type=pa.list_(pa.string()))
    t = pa.table({"tags": pa.chunked_array([a1, a2]), "i": [0, 1, 2]})
    mask = apply_filters(t, [FilterSpec("tags", "any_eq", "x")])
    assert mask.tolist() == [True, False, True]


def test_not_in_excludes_nulls():
    """SQL NOT IN: a NULL column value is NOT TRUE for the predicate —
    regression for pc.is_in's plain-false-on-NULL letting NULL rows through."""
    import pyarrow as pa

    t = pa.table({"lang": ["en", "fr", None, "de"]})
    mask = apply_filters(t, [FilterSpec("lang", "not_in", ["en"])])
    assert mask.tolist() == [False, True, False, True]
    mask_in = apply_filters(t, [FilterSpec("lang", "in", ["fr"])])
    assert mask_in.tolist() == [False, True, False, False]


def test_posting_cache_upgrades_to_positions(ray_session, tmp_path):
    """A term first loaded WITHOUT positions (plain term query) must be
    reloaded with them when a later phrase query through the same cache
    needs positional verification."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import (CorpusSpec, FullTextSearchEngine,
                                                        build_index)
    from project_gutenberg_full_text_search_ray.stages.segment_search import search_segment

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["alpha beta gamma", "beta alpha", "gamma alpha beta"]})
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, CorpusSpec(("doc_id",), "text", (), "pc"), idx)
    eng = FullTextSearchEngine(idx)
    (seg_path,) = eng.seg_dirs.values()
    cache: dict = {}
    term_plan = eng.build_plan(eng.query().search("alpha beta"), 10)
    r1 = search_segment(seg_path, term_plan, cache=cache)
    assert r1.num_rows == 3
    phrase_plan = eng.build_plan(eng.query().search('"alpha beta"'), 10)
    r2 = search_segment(seg_path, phrase_plan, cache=cache)  # same cache
    assert sorted(r2["doc_id"].to_pylist()) == [1, 3]  # adjacency verified


def test_broadcast_interval_join_edges(ray_session):
    """Inclusive bounds both ends, unknown keys count 0, empty right side."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.ranges import broadcast_interval_join

    right = pa.table({"k": ["a", "a", "b"], "start": [100, 200, 50]})
    left = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "k": ["a", "a", "a", "a", "b", "c"],
        # window=10 → a:[100,110],[200,210]; b:[50,60]
        "t": [100, 110, 111, 205, 60, 100],
    }))
    out = broadcast_interval_join(left, right, by="k", on="t", window=10,
                                  left_cols=["id"], right_start="start",
                                  ).to_pandas().sort_values("id")
    assert out["n_intervals"].tolist() == [1, 1, 0, 1, 1, 0]

    empty = right.slice(0, 0)
    out2 = broadcast_interval_join(left, empty, by="k", on="t", window=10,
                                   left_cols=["id"], right_start="start",
                                   ).to_pandas()
    assert out2["n_intervals"].tolist() == [0] * 6


def test_broadcast_interval_join_null_keys_and_times(ray_session):
    """SQL comparison semantics for NULLs: a NULL left key or NULL probe time
    counts 0; NULL-keyed / NULL-start right intervals contain nothing.
    Regression: NaT aliased INT64_MIN (wrap-around negative counts) and None
    keys crashed the object-array sort."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.ranges import broadcast_interval_join

    right = pa.table({"k": ["a", None, "b"], "start": [100, 50, None]})
    left = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5],
        "k": ["a", None, "a", "b", "a"],
        "t": [105, 105, None, 60, 100],
    }))
    out = broadcast_interval_join(left, right, by="k", on="t", window=10,
                                  left_cols=["id"], right_start="start",
                                  ).to_pandas().sort_values("id")
    # id1: a@105 in [100,110] → 1; id2 NULL key → 0; id3 NULL t → 0;
    # id4: b's only interval has NULL start → 0; id5: a@100 → 1
    assert out["n_intervals"].tolist() == [1, 0, 0, 0, 1]


def test_verify_jaccard_cache_overflow(ray_session, monkeypatch):
    """Cache clear-on-overflow must refetch ids the batch still needs
    (regression: pre-clear cached ids raised KeyError after the clear)."""
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.stages.dedup import VerifyJaccardStage

    docs = pa.table({
        "id": [1, 2, 3, 4],
        "text": ["a b c d", "a b c e", "x y z w", "a b c d"],
    })
    monkeypatch.setattr(VerifyJaccardStage, "CACHE_CAP", 2)
    stage = VerifyJaccardStage(docs, "id", "text", k_shingle=2, threshold=0.1)
    # batch 1 caches ids 1,2; batch 2 pairs cached id 1 with new ids 3,4 →
    # overflow clears the cache including id 1
    out1 = stage(pa.table({"id_a": [1], "id_b": [2]}))
    assert out1.num_rows == 1
    out2 = stage(pa.table({"id_a": [1, 1], "id_b": [3, 4]}))
    assert out2["id_b"].to_pylist() == [4]  # 1~4 duplicates, 1~3 disjoint


def test_compact_all_empty_text_segments(ray_session, tmp_path):
    """Compaction over segments whose docs tokenize to nothing must not
    crash (regression: entry_len[-1] on an empty array)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import CorpusSpec, build_index, compact_index
    from project_gutenberg_full_text_search_ray.pipelines.search import FullTextSearchEngine

    t = pa.table({
        "doc_id": list(range(8)),
        "text": ["...", "!!!", "", "??", "--", "..", "!", "?"],
    })
    src = str(tmp_path / "empty.parquet")
    pq.write_table(t, src, row_group_size=2)
    spec = CorpusSpec(("doc_id",), "text", (), "emptytest")
    idx = str(tmp_path / "idx")
    idx2 = str(tmp_path / "idx_compact")
    build_index(src, spec, idx, docs_per_segment=2)
    compact_index(idx, idx2, target_docs_per_segment=8)
    eng = FullTextSearchEngine(idx2)
    res = eng.execute(eng.query().search("anything")[1, 10])
    assert res.total == 0


def test_http_unknown_field_falls_back_to_whole_doc(engine):
    from project_gutenberg_full_text_search_ray.pipelines.http_api import SearchAPI

    api = SearchAPI(engine)
    s_plain = api.handle("/search", {"query": "w00001"})[1]
    s_field = api.handle("/search", {"query": "w00001", "field": "fts_nosuchfield"})[1]
    assert s_field["total"] == s_plain["total"] > 0


def test_candidate_pairs_hot_key_skipped_consistently(ray_session):
    """A key over the occupancy cap produces NO pairs — including when it
    spans every sorted block (its edge rows must not be shipped either)."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import _candidate_pairs

    hot = pa.table({"id": list(range(200)), "k": [7] * 200})
    out = _candidate_pairs(rd.from_arrow(hot), "id", "k", max_occupancy=50)
    assert out.count() == 0

    # mixed: one hot key (skipped) + one cool key (kept)
    mixed = pa.table({"id": list(range(104)),
                      "k": [7] * 100 + [9] * 4})
    out2 = _candidate_pairs(rd.from_arrow(mixed), "id", "k", max_occupancy=50)
    df = out2.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(df) == 6  # C(4,2) pairs of the cool key only
    assert set(df["id_a"]).union(df["id_b"]) == {100, 101, 102, 103}


def test_trigram_index_invalidated_on_rebuild(ray_session, tmp_path):
    """A rebuilt index (new dictionary) must not serve a stale trigram table
    (regression: _DONE never compared against the index generation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import CorpusSpec, build_index
    from project_gutenberg_full_text_search_ray.stages.trigram import contains_expand

    spec = CorpusSpec(("doc_id",), "text", (), "tristale")
    src = str(tmp_path / "src.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(pa.table({"doc_id": [1, 2], "text": ["alpha beta", "gamma"]}), src)
    build_index(src, spec, idx)
    assert contains_expand(idx, "alph", max_expansions=None) == ["alpha"]
    # rebuild with different vocabulary in the SAME index dir
    pq.write_table(pa.table({"doc_id": [1, 2], "text": ["delta epsilon", "zeta"]}), src)
    build_index(src, spec, idx, force=True)
    assert contains_expand(idx, "alph", max_expansions=None) == []
    assert contains_expand(idx, "delt", max_expansions=None) == ["delta"]


def test_sign_keys_use_all_planes():
    """Regression: packbits[...,0] silently ignored planes past the first 8."""
    import numpy as np

    from project_gutenberg_full_text_search_ray.stages.similarity import _sign_keys

    a = np.zeros((1, 16), dtype=np.uint8)
    b = np.zeros((1, 16), dtype=np.uint8)
    b[0, 12] = 1  # differs only in plane 12
    assert _sign_keys(a)[0] != _sign_keys(b)[0]
    c = np.zeros((1, 16), dtype=np.uint8)
    c[0, 3] = 1
    assert _sign_keys(c)[0] == np.uint64(8)


def test_matrix_handles_sliced_fixed_size_lists():
    import numpy as np
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.stages.similarity import _matrix

    arr = pa.FixedSizeListArray.from_arrays(
        pa.array([float(i) for i in range(12)]), 3)
    sliced = arr.slice(2, 2)  # rows [6,7,8], [9,10,11]
    M = _matrix(sliced)
    assert M.shape == (2, 3) and M[0].tolist() == [6.0, 7.0, 8.0]


def test_langid_cjk_from_raw_text():
    from project_gutenberg_full_text_search_ray.functions.textstats import predict_language

    assert predict_language([], raw_text="这是一个中文文档") == "zh"
    assert predict_language(["the", "and"], raw_text="the and") == "en"
    assert predict_language([], raw_text="") == "und"


def test_stopword_phrase_preserves_gaps(ray_session, tmp_path):
    """Postgres semantics: with a stopword analyzer, '"war and peace"' must
    become war<2>peace against the pre-stopword position stream — matching
    'war and peace' but NOT 'war peace' (and vice versa for '"war peace"')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import Analyzer, CorpusSpec, build_index
    from project_gutenberg_full_text_search_ray.pipelines.search import FullTextSearchEngine

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["war and peace", "war peace treaty", "peace and war"],
    })
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "i")
    an = Analyzer(stopwords=True)
    build_index(src, CorpusSpec(("doc_id",), "text", (), "stopph"), idx, analyzer=an)
    eng = FullTextSearchEngine(idx, mode="local")

    def ids(q):
        r = eng.execute(eng.query().search(q)[1, 10])
        return sorted(r.table["doc_id"].to_pylist())

    assert ids('"war and peace"') == [1]   # gap of 2 preserved
    assert ids('"war peace"') == [2]       # strict adjacency
    assert ids('"peace and war"') == [3]


def test_json_extract_int_rejects_float_prefix():
    """Non-integer values must be NULL, not their integer prefix (12.5 used
    to extract as 12; DuckDB's CAST rounds, so prefix-matching broke parity)."""
    col = pa.array(['{"k": 12.5}', '{"k": 1e3}', '{"k": 12}', '{"k": -3.9}',
                    '{"k": 7, "m": 2}', '{ "k" : 5 }'])
    got = P.json_extract_int(col, "k").to_pylist()
    assert got == [None, None, 12, None, 7, 5]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_candidate_pairs_randomized_vs_bruteforce(ray_session, seed):
    """Property sweep over random keyed rows: dedupe=True must equal the
    brute-force distinct pair set; dedupe=False must be a SUPERSET-free
    multiset cover of it (every pair present at least once, none invented),
    under random duplicates, hot keys, and the occupancy cap."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import _candidate_pairs

    rng = np.random.default_rng(100 + seed)
    n = 400
    ids = rng.integers(0, 60, size=n)          # repeated ids within keys
    keys = rng.integers(0, 25, size=n)          # some hot keys
    cap = 12 if seed % 2 else None
    keyed = rd.from_arrow(pa.table({"id": pa.array(ids, type=pa.int64()),
                                    "k": pa.array(keys, type=pa.int64())}))
    # brute force: distinct ids per key, capped occupancy, ordered pairs
    by_key = collections.defaultdict(set)
    for i, k in zip(ids.tolist(), keys.tolist()):
        by_key[k].add(i)
    exp = set()
    for k, members in by_key.items():
        if cap is not None and len(members) > cap:
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                exp.add((ms[x], ms[y]))

    got = _candidate_pairs(keyed, "id", "k", cap).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert got_pairs == exp
    assert len(got) == len(got_pairs)  # dedupe=True: truly distinct

    raw = _candidate_pairs(keyed, "id", "k", cap, dedupe=False).to_pandas()
    raw_pairs = {(int(a), int(b)) for a, b in zip(raw["id_a"], raw["id_b"])}
    assert raw_pairs == exp  # same SET; duplicates allowed across blocks


def test_verify_cosine_cache_overflow(ray_session, monkeypatch):
    """VerifyCosineStage keeps answering correctly when the per-actor
    normalized-row cache overflows mid-stream (clear + refetch, like the
    Jaccard stage)."""
    import numpy as np
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        VecCache, VerifyCosineStage)

    store = pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "vec": [[1.0, 0.0], [2.0, 0.0],    # parallel pair
                [0.0, 1.0], [1.0, 0.0],    # orthogonal
                [1.0, 1.0], [2.0, 2.0]],   # parallel pair
    })
    monkeypatch.setattr(VecCache, "CACHE_CAP", 2)
    stage = VerifyCosineStage(store, "id", "vec", threshold=0.9)
    out = []
    for a, b in [(1, 2), (3, 4), (5, 6), (1, 2)]:  # (1,2) re-queried post-evict
        t = stage(pa.table({"id_a": [a], "id_b": [b]}))
        out.extend(zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()))
    assert out == [(1, 2), (5, 6), (1, 2)]
