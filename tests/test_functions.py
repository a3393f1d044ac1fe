"""Unit tests for the pure kernels: analyzer, query parser, codec, BM25."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from project_gutenberg_full_text_search_ray.functions.analyzer import (
    DEFAULT_ANALYZER,
    TOKEN_SPLIT_PATTERN,
    Analyzer,
)
from project_gutenberg_full_text_search_ray.functions.bm25 import idf, scale_scores, tf_norm
from project_gutenberg_full_text_search_ray.functions.codec import (
    decode_sorted,
    delta_decode,
    delta_encode,
    encode_sorted,
    vbyte_decode,
    vbyte_encode,
)
from project_gutenberg_full_text_search_ray.functions.querylang import (
    AndGroup,
    Not,
    Phrase,
    Term,
    parse_query,
)


class TestAnalyzer:
    def test_scalar_basic(self):
        assert DEFAULT_ANALYZER.tokenize("Hello, World! x2") == ["hello", "world", "x2"]

    def test_vectorized_matches_scalar(self):
        texts = [
            "Hello, World! the quick brown fox",
            "",
            "a  b   c",
            "Spark-3.0 runs FAST!!",
            None,
            "...leading and trailing...",
            "UPPER lower 123abc",
        ]
        terms, di, pos = DEFAULT_ANALYZER.tokenize_column(pa.array(texts, type=pa.string()))
        for i, t in enumerate(texts):
            exp_t, exp_p = DEFAULT_ANALYZER.tokenize_with_positions(t or "")
            assert list(terms[di == i]) == exp_t
            assert list(pos[di == i]) == exp_p

    @given(st.lists(st.text(max_size=30), max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_vectorized_matches_scalar_property(self, texts):
        terms, di, pos = DEFAULT_ANALYZER.tokenize_column(pa.array(texts, type=pa.string()))
        for i, t in enumerate(texts):
            exp_t, exp_p = DEFAULT_ANALYZER.tokenize_with_positions(t)
            assert list(terms[di == i]) == exp_t
            assert list(pos[di == i]) == exp_p

    def test_stopwords_positions_preserved(self):
        a = Analyzer(stopwords=True)
        terms, pos = a.tokenize_with_positions("the cat and the dog")
        assert terms == ["cat", "dog"]
        assert pos == [1, 4]  # positions index the pre-stopword stream

    def test_duckdb_tokenizer_parity(self):
        """analyzer-v1 default == DuckDB regexp_split_to_array oracle."""
        import duckdb

        texts = ["hello world foo", "a-b c.d", "  x  ", ""]
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT i, t.term FROM (SELECT unnest(range({len(texts)})) AS i),
            LATERAL (SELECT ['{"','".join(texts)}'][i+1] AS txt),
            UNNEST(regexp_split_to_array(lower(txt), '{TOKEN_SPLIT_PATTERN}')) AS t(term)
            WHERE t.term <> '' ORDER BY i
            """
        ).fetchall()
        got: dict[int, list[str]] = {}
        for i, term in rows:
            got.setdefault(i, []).append(term)
        for i, t in enumerate(texts):
            assert got.get(i, []) == DEFAULT_ANALYZER.tokenize(t)


class TestQueryLang:
    def test_implicit_and(self):
        q = parse_query("hello world")
        assert q.groups == (AndGroup((Term("hello"), Term("world"))),)

    def test_or_precedence(self):
        q = parse_query("a b or c")
        assert len(q.groups) == 2  # (a AND b) OR c

    def test_phrase_and_not(self):
        q = parse_query('"big data" -spam')
        assert q.groups[0].atoms == (Phrase(("big", "data")), Not(Term("spam")))

    def test_single_word_phrase_degrades_to_term(self):
        q = parse_query('"hello"')
        assert q.groups[0].atoms == (Term("hello"),)

    def test_positive_terms_order(self):
        q = parse_query("b a or c -d")
        assert q.positive_terms() == ["b", "a", "c"]
        assert q.all_terms() == ["b", "a", "c", "d"]

    def test_empty(self):
        assert parse_query("").is_empty
        assert parse_query("   ").is_empty

    def test_followed_by_distance(self):
        q = parse_query("scan <2> group")
        assert q.groups[0].atoms == (Phrase(("scan", "group"), (0, 2)),)

    def test_followed_by_arrow_is_distance_one(self):
        # <-> == <1>; consecutive offsets normalize to None so the plan is
        # identical to the quoted-phrase form
        assert parse_query("a <-> b") == parse_query('"a b"')

    def test_followed_by_chains_left_associative(self):
        q = parse_query("a <-> b <2> c")
        assert q.groups[0].atoms == (Phrase(("a", "b", "c"), (0, 1, 3)),)

    def test_followed_by_binds_phrases(self):
        q = parse_query('lake <3> "big data"')
        assert q.groups[0].atoms == (Phrase(("lake", "big", "data"), (0, 3, 4)),)

    def test_followed_by_marker_dropped_at_edges(self):
        assert parse_query("<2> a") == parse_query("a")
        assert parse_query("a <2>") == parse_query("a")
        assert parse_query("a <2> or b") == parse_query("a or b")

    def test_followed_by_marker_dropped_on_negated_operand(self):
        # strict tsquery forbids NOT inside FOLLOWED BY; websearch-leniency
        # degrades to plain AND of the operands
        q = parse_query("a <2> -b")
        assert q.groups[0].atoms == (Term("a"), Not(Term("b")))

    def test_negated_phrase(self):
        # websearch_to_tsquery: -"a b" is a negated PHRASE, not NOT(a) AND b
        q = parse_query('-"quick brown" fox')
        assert q.groups[0].atoms == (Not(Phrase(("quick", "brown"))), Term("fox"))

    def test_negated_single_word_phrase(self):
        q = parse_query('-"spam" ham')
        assert q.groups[0].atoms == (Not(Term("spam")), Term("ham"))

    def test_double_dash_stays_negated(self):
        # websearch_to_tsquery: ONE leading '-' negates, further dashes are
        # punctuation — '--cat' is NOT cat, not a double negation
        q = parse_query("--cat dog")
        assert q.groups[0].atoms == (Not(Term("cat")), Term("dog"))

    def test_phrase_terms(self):
        q = parse_query('"big data" -"spam ham" fox')
        assert sorted(q.phrase_terms()) == ["big", "data", "ham", "spam"]
        assert parse_query("plain words").phrase_terms() == []


class TestCodec:
    def test_empty(self):
        assert vbyte_encode(np.empty(0, dtype=np.uint64)) == b""
        assert len(vbyte_decode(b"")) == 0

    def test_known_values(self):
        v = np.array([0, 1, 127, 128, 16383, 16384, 2**40], dtype=np.uint64)
        assert np.array_equal(vbyte_decode(vbyte_encode(v)), v)

    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(self, vals):
        v = np.array(vals, dtype=np.uint64)
        assert np.array_equal(vbyte_decode(vbyte_encode(v)), v)

    @given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_sorted_roundtrip(self, vals):
        v = np.array(sorted(vals), dtype=np.uint64)
        assert np.array_equal(decode_sorted(encode_sorted(v)), v)

    def test_delta(self):
        v = np.array([3, 5, 10, 11], dtype=np.uint64)
        d = delta_encode(v)
        assert list(d) == [3, 2, 5, 1]
        assert np.array_equal(delta_decode(d), v)

    def test_compression_is_compact(self):
        # dense ordinals ⇒ ~1 byte per gap
        v = np.arange(0, 10_000, 2, dtype=np.uint64)
        assert len(encode_sorted(v)) < len(v) * 2


class TestBM25:
    def test_idf_monotone_decreasing_in_df(self):
        assert idf(1000, 1) > idf(1000, 10) > idf(1000, 999)

    def test_tf_norm_saturates(self):
        tf = np.array([1, 2, 4, 100], dtype=np.float64)
        dl = np.full(4, 50.0)
        s = tf_norm(tf, dl, 50.0)
        assert np.all(np.diff(s) > 0) and s[-1] < 2.2  # bounded by k1+1

    def test_scale_scores(self):
        s = np.array([0.00004, 0.00005, 1.23456789])
        assert list(scale_scores(s)) == [0, 1, 12346]


class TestFastTokenizer:
    def test_byte_scan_equivalence(self):
        texts = [
            "Hello, World! the quick brown fox", "", "a  b   c", "Spark-3.0 FAST!!",
            None, "émigré café naïve", "中文 mixed ascii42", "x", " ", "tail42", "9z z9",
        ]
        col = pa.array(texts, type=pa.string())
        t1, d1, p1 = DEFAULT_ANALYZER.tokenize_column_arrow(col)
        t2, d2, p2 = DEFAULT_ANALYZER.tokenize_column_fast(col)
        assert t1.to_pylist() == t2.to_pylist()
        assert list(d1) == list(d2)
        assert list(p1) == list(p2)

    @given(st.lists(st.text(max_size=25), max_size=12))
    @settings(max_examples=40, deadline=None)
    def test_byte_scan_equivalence_property(self, texts):
        col = pa.array(texts, type=pa.string())
        t1, d1, p1 = DEFAULT_ANALYZER.tokenize_column_arrow(col)
        t2, d2, p2 = DEFAULT_ANALYZER.tokenize_column_fast(col)
        assert t1.to_pylist() == t2.to_pylist()
        assert list(d1) == list(d2)
        assert list(p1) == list(p2)

    def test_sliced_input(self):
        col = pa.array(["aa bb", "cc dd", "ee ff"]).slice(1, 2)
        t1, d1, p1 = DEFAULT_ANALYZER.tokenize_column_arrow(col)
        t2, d2, p2 = DEFAULT_ANALYZER.tokenize_column_fast(col)
        assert t1.to_pylist() == t2.to_pylist()
        assert list(d1) == list(d2) and list(p1) == list(p2)


def test_simhash64_column_matches_scalar():
    """Vectorized column SimHash must be bit-identical to the scalar fold
    for every row, including empties, NULLs, duplicates-heavy and unicode."""
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        simhash64,
        simhash64_column,
    )

    texts = ["the quick brown fox", "", None, "a a a a a b", "日本語 abc 123",
             "one", " punct!! split--case MIXED Case ", "z " * 500]
    got = simhash64_column(pa.array(texts)).tolist()
    exp = [simhash64(DEFAULT_ANALYZER.tokenize(t or "")) for t in texts]
    assert got == exp


def test_simhash64_column_chunk_straddling_docs(monkeypatch):
    """Docs whose token runs straddle vote-chunk boundaries must still fold
    into one signature (accumulator += across chunks)."""
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.functions import textstats as T
    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER

    monkeypatch.setattr(T, "_SIMHASH_CHUNK", 7)  # force many tiny chunks
    texts = ["alpha beta gamma delta epsilon zeta eta theta iota",
             "one two three four five six seven eight nine ten eleven",
             "x", "", "dup dup dup dup dup dup dup dup dup dup dup"]
    got = T.simhash64_column(pa.array(texts)).tolist()
    exp = [T.simhash64(DEFAULT_ANALYZER.tokenize(t)) for t in texts]
    assert got == exp


def test_minhash_signature_column_matches_scalar():
    """Vectorized column MinHash must be bit-identical to the scalar
    per-doc fold for every row: empties, NULLs, short docs (< k tokens),
    duplicate-shingle docs, unicode."""
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        minhash_params,
        minhash_signature,
        minhash_signature_column,
        shingle_hashes,
    )

    a, b = minhash_params(16, seed=9)
    texts = ["the quick brown fox jumps over the lazy dog", "", None,
             "one two", "ab", "rep rep rep rep rep rep",
             "日本語 テスト abc def ghi jkl", "x " * 300]
    got = minhash_signature_column(pa.array(texts), a, b, k=3)
    for i, t in enumerate(texts):
        exp = minhash_signature(shingle_hashes(DEFAULT_ANALYZER.tokenize(t or ""), 3), a, b)
        assert got[i].tolist() == exp.tolist(), (i, t)


def test_shingle_hashes_column_matches_scalar():
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        shingle_hashes,
        shingle_hashes_column,
    )

    texts = ["the quick brown fox jumps", "", None, "a b", "dup dup dup dup",
             "one two three four five six"]
    fp, rows = shingle_hashes_column(pa.array(texts), k=3)
    per_doc = {i: sorted(fp[rows == i].tolist()) for i in set(rows.tolist())}
    for i, t in enumerate(texts):
        exp = sorted(shingle_hashes(DEFAULT_ANALYZER.tokenize(t or ""), 3).tolist())
        assert per_doc.get(i, []) == exp, (i, t)


def test_langid_quality_columns_match_scalar():
    """Vectorized langid/quality column kernels must be row-identical to the
    scalar folds on adversarial rows: NULL, empty, CJK, marker ties, dups."""
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        predict_language,
        predict_language_column,
        quality_metrics,
        quality_metrics_column,
    )

    texts = [
        "the quick brown fox and the dog",       # en
        "le chat est sur la table et le lit",    # fr
        "el perro y el gato es que por",         # es
        "der hund und die katze ist ein tier",   # de
        None, "",                                 # null / empty -> und
        "de un une le el",                        # cross-language tie
        "漢字テスト mixed with the and of",        # CJK short-circuit -> zh
        "zzz qqq xxx",                            # no markers -> und
        "dup dup dup the the",                    # dup tokens
    ]
    col = pa.array(texts, type=pa.string())
    got_lang = predict_language_column(col)
    qm = quality_metrics_column(col)
    for i, t in enumerate(texts):
        toks = DEFAULT_ANALYZER.tokenize(t or "")
        assert got_lang[i] == predict_language(toks, raw_text=t or ""), (i, t)
        exp = quality_metrics(toks, t or "")
        for k in ("n_tokens", "distinct_terms", "stop_hits", "n_chars"):
            assert int(qm[k][i]) == exp[k], (i, t, k)
