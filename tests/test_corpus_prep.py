"""Edge cases for the corpus-prep operators (stages/corpus_prep.py):
boilerplate span scrub and token-budget sequence packing.  End-to-end
engine-vs-DuckDB parity for both runs in tests/test_driver_contract.py.
Both operators return streaming Datasets; tests collect them (tiny)."""

import os

import pyarrow as pa
import pytest


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def _collect(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_frequent_span_scrub_edges(ray_session):
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import frequent_span_scrub

    rows = (
        [(i, "aa bb cc dd") for i in range(5)]       # "aa bb" df=10, "cc dd" df=5
        + [(i, "aa bb") for i in range(5, 10)]
        + [(10, "")]                                  # no tokens
        + [(11, "xx yy zz")]                          # unique spans, odd tail window
    )
    out = _collect(frequent_span_scrub(_docs(rows), "text", "doc_id",
                                       span_tokens=2, max_df_frac=0.3))  # min_df = ceil(3.6) = 4
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert len(got) == 12
    for i in range(10):      # every span of these docs is frequent
        assert got[i] == ""
    assert got[10] == ""     # tokenless doc
    assert got[11] == "xx yy zz"   # unique spans survive, incl. 1-token tail


def test_frequent_span_scrub_partial_drop(ray_session):
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import frequent_span_scrub

    rows = [(i, f"hot hot u{i} v{i}") for i in range(6)]  # "hot hot" frequent, tails unique
    out = _collect(frequent_span_scrub(_docs(rows), "text", "doc_id",
                                       span_tokens=2, max_df_frac=0.5))
    for i, t in zip(out["doc_id"], out["clean_text"]):
        assert t == f"u{i} v{i}"


def test_pack_sequences_exclusive_prefix(ray_session):
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import pack_sequences

    def toks(n, tag):
        return " ".join(f"{tag}{j}" for j in range(n))

    rows = [(0, toks(4, "a")), (1, toks(12, "b")),  # doc 1 straddles capacity
            (2, toks(5, "c")), (3, ""), (4, toks(1, "e"))]
    out = _collect(pack_sequences(_docs(rows), "text", "doc_id", capacity=10, bucket_size=2))
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert out["n_tokens"].tolist() == [4, 12, 5, 0, 1]
    # exclusive prefixes: 0, 4, 16, 21, 21 → //10 → 0, 0, 1, 2, 2
    assert out["pack_id"].tolist() == [0, 0, 1, 2, 2]


def test_pack_sequences_null_text_matches_oracle(ray_session, tmp_path):
    """NULL text must count as 0 tokens on BOTH sides: the engine's tokenizer
    coalesces NULL→'', and the SQL oracle COALESCEs len(arr) (lower(NULL)
    propagates to arr=NULL).  Regression for the divergence where the oracle
    emitted n_tokens=NULL for NULL-text docs."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.pipelines.driver_api import ORACLE_SQL
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import pack_sequences

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": ["alpha beta gamma", None, "delta epsilon", "", "zeta eta theta iota"],
    })
    path = str(tmp_path / "documents.parquet")
    pq.write_table(t, path)
    eng = _collect(pack_sequences(rd.read_parquet(path), "text", "doc_id", capacity=4))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    oracle = con.execute(ORACLE_SQL["pack_sequences"].replace("// 512", "// 4")).df()
    pd.testing.assert_frame_equal(eng.astype("int64"), oracle.astype("int64"))


def test_pack_sequences_bucket_boundaries(ray_session):
    """pack_id must be independent of bucket_size (pure implementation knob)."""
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import pack_sequences

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(3 + i % 4))) for i in range(20)]
    a = _collect(pack_sequences(_docs(rows), "text", "doc_id", capacity=7, bucket_size=3))
    b = _collect(pack_sequences(_docs(rows), "text", "doc_id", capacity=7, bucket_size=100))
    assert a[["doc_id", "n_tokens", "pack_id"]].equals(b[["doc_id", "n_tokens", "pack_id"]])


def test_contamination_flags_match_bruteforce(ray_session):
    """Decontamination must flag exactly the docs whose distinct shingle set
    intersects the bench set, with exact intersection counts."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.functions.analyzer import DEFAULT_ANALYZER
    from project_gutenberg_full_text_search_ray.functions.textstats import shingle_hashes
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import contamination_flags

    bench = ["alpha beta gamma delta epsilon", "one two three four"]
    docs = [
        {"doc_id": 0, "text": "alpha beta gamma zeta"},        # 1 shared shingle
        {"doc_id": 1, "text": "totally disjoint text here"},   # 0
        {"doc_id": 2, "text": "one two three four five"},      # 2 shared
        {"doc_id": 3, "text": None},                           # null text
        {"doc_id": 4, "text": "beta gamma delta epsilon"},     # 2 shared
    ]
    got = contamination_flags(rd.from_items(docs), "text", "doc_id", bench,
                              k_shingle=3, min_hits=1).to_pandas()
    got = dict(zip(got["doc_id"], got["n_hits"]))
    bench_sh = set()
    for t in bench:
        bench_sh |= set(shingle_hashes(DEFAULT_ANALYZER.tokenize(t), 3).tolist())
    exp = {}
    for d in docs:
        n = len(set(shingle_hashes(DEFAULT_ANALYZER.tokenize(d["text"] or ""), 3).tolist()) & bench_sh)
        if n >= 1:
            exp[d["doc_id"]] = n
    assert got == exp and exp  # non-trivial fixture


def test_split_assign_stable_under_growth(ray_session):
    """A doc's split is a pure function of (seed, id): adding new docs must
    not move any existing doc between splits, and fractions are honored
    approximately."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import split_assign

    small = rd.from_arrow(pa.table({"doc_id": list(range(1000))}))
    grown = rd.from_arrow(pa.table({"doc_id": list(range(3000))}))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = dict(zip(*[split_assign(small, "doc_id", fractions=fr).to_pandas()[c]
                    for c in ("doc_id", "split")]))
    s2 = dict(zip(*[split_assign(grown, "doc_id", fractions=fr).to_pandas()[c]
                    for c in ("doc_id", "split")]))
    assert all(s2[i] == s1[i] for i in range(1000))  # growth never reassigns
    counts = collections.Counter(s2.values())
    assert 0.75 <= counts["train"] / 3000 <= 0.85
    assert 0.07 <= counts["val"] / 3000 <= 0.13
    assert 0.07 <= counts["test"] / 3000 <= 0.13
    import pytest

    with pytest.raises(ValueError):
        split_assign(small, "doc_id", fractions={"a": 0.5, "b": 0.6})


def test_quota_sample_deterministic_and_stable(ray_session):
    """quota_sample: per-group rates honored deterministically; a doc's
    keep/drop decision never changes when the corpus grows or other groups'
    rates are retuned; unknown + NULL groups use default_rate."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import quota_sample

    def docs(n):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "grp": pa.array([("a" if i % 3 == 0 else "b" if i % 3 == 1 else None)
                             for i in range(n)], type=pa.string()),
        }))

    rates = {"a": 1.0, "b": 0.4}
    small = quota_sample(docs(60), "doc_id", "grp", rates=rates, seed=5).to_pandas()
    big = quota_sample(docs(180), "doc_id", "grp", rates=rates, seed=5).to_pandas()
    # rate 1.0 keeps every 'a' row; NULL group → default_rate 0 → dropped
    assert set(small[small.grp == "a"].doc_id) == {i for i in range(60) if i % 3 == 0}
    assert small.grp.notna().all()
    # growth stability: the 60-doc prefix of the 180-doc run is identical
    assert set(small.doc_id) == set(big[big.doc_id < 60].doc_id)
    # retune another group: 'b' decisions unchanged
    retuned = quota_sample(docs(60), "doc_id", "grp",
                           rates={"a": 0.2, "b": 0.4}, seed=5).to_pandas()
    assert set(retuned[retuned.grp == "b"].doc_id) == set(small[small.grp == "b"].doc_id)
    # unknown group falls back to default_rate
    kept = quota_sample(docs(60), "doc_id", "grp", rates={"zzz": 1.0},
                        seed=5, default_rate=1.0).to_pandas()
    assert len(kept) == 60


def test_grouped_topk_ties_and_blocks(ray_session):
    """grouped_topk: per-group head-k with deterministic id tie-break, NULL
    order rows dropped, NULL group is its own group, result invariant to
    block layout (the per-block partial never loses a global winner)."""
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import grouped_topk

    t = pa.table({
        "grp": pa.array(["a"] * 5 + ["b"] * 3 + [None, None], type=pa.string()),
        "score": pa.array([5, 5, 5, 1, 2, 7, None, 3, 9, 9], type=pa.int64()),
        "id": pa.array(list(range(10)), type=pa.int64()),
    })
    for n_blocks in (1, 5):
        out = grouped_topk(rd.from_arrow(t).repartition(n_blocks),
                           "grp", "score", "id", k=2)
        rows = list(zip(out["grp"].to_pylist(), out["id"].to_pylist()))
        # a: three ties at 5 → ids 0,1 win; b: score-None row 6 dropped → 5,7
        # NULL group: ids 8,9 tie at 9 → both kept (k=2), id order
        assert rows == [("a", 0), ("a", 1), ("b", 5), ("b", 7),
                        (None, 8), (None, 9)], (n_blocks, rows)


def test_redact_pii_semantics(ray_session):
    """PII scrub: pattern order (email before IP), sequential hit counting,
    null/empty rows, and end-to-end via the Dataset stage."""
    import pyarrow as pa
    import ray.data as rd
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        redact_pii, redact_pii_column)

    texts = pa.array([
        "mail jo.doe+x@sub.example.co.uk now",       # 1 email
        "ip 192.168.0.1 call 555-123-4567 or 555.123.4567",  # 1 ip + 2 phones
        "addr 1.2.3.4@host.org is ONE email hit",    # email eats the ip
        "v4 10.0.0.7, versioned 1.2.3 untouched",    # \b keeps 1.2.3 intact
        "",
        None,
    ])
    clean, n = redact_pii_column(texts)
    got = clean.to_pylist()
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "ip <IP> call <PHONE> or <PHONE>"
    assert got[2] == "addr <EMAIL> is ONE email hit"
    assert got[3] == "v4 <IP>, versioned 1.2.3 untouched"
    assert got[4] == "" and got[5] is None
    assert n.tolist() == [1, 3, 1, 1, 0, 0]

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()), "text": texts}))
    out = redact_pii(ds, "text", "doc_id").take_all()
    assert sorted(r["n_pii"] for r in out) == [0, 0, 1, 1, 1, 3]
    assert {r["doc_id"]: r["clean_text"] for r in out}[1] == got[1]


def test_repetition_metrics_column_matches_scalar(ray_session):
    """Vectorized repetition kernel is row-identical to the scalar fold,
    including empty strings, single words and all-duplicate docs."""
    import numpy as np
    import pyarrow as pa
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        repetition_metrics, repetition_metrics_column)

    rng = np.random.default_rng(23)
    texts = ["", "solo", "a a", "b c b c b", "x y z"]
    for _ in range(150):
        nw = int(rng.integers(1, 30))
        texts.append(" ".join(f"t{rng.integers(0, 9)}" for _ in range(nw)))
    m = repetition_metrics_column(pa.array(texts))
    for i, t in enumerate(texts):
        ref = repetition_metrics(t.split(" "))
        for k, v in ref.items():
            assert m[k][i] == v, (i, k, t)
    # all-null block arrives null-typed (pyarrow-ray gotcha)
    z = repetition_metrics_column(pa.array([None, None]))
    assert all(v.tolist() == [0, 0] for v in z.values())


def test_chunk_documents_windows(ray_session):
    """Sliding-window chunking: coverage (every word in >= 1 chunk), stride
    arithmetic, short tails unpadded, single-chunk docs, arg validation."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        chunk_documents)

    texts = ["a b c d e f g", "x", "p q r s", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts)}))
    rows = sorted(chunk_documents(ds, "text", "doc_id",
                                  chunk_tokens=3, overlap=1).take_all(),
                  key=lambda r: (r["doc_id"], r["chunk_idx"]))
    got = [(r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_words"])
           for r in rows]
    assert got == [
        (0, 0, "a b c", 3), (0, 1, "c d e", 3), (0, 2, "e f g", 3),
        (1, 0, "x", 1),
        (2, 0, "p q r", 3), (2, 1, "r s", 2),
        (3, 0, "", 1),  # "" splits to [''] (string_split parity)
    ]
    # no overlap: chunks partition the words exactly
    rows0 = chunk_documents(ds, "text", "doc_id",
                            chunk_tokens=2, overlap=0).take_all()
    d0 = " ".join(r["chunk_text"] for r in sorted(
        (r for r in rows0 if r["doc_id"] == 0),
        key=lambda r: r["chunk_idx"]))
    assert d0 == texts[0]
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(ds, "text", "doc_id", chunk_tokens=3, overlap=3)


def test_normalize_text_semantics(ray_session):
    """normalize_text: NFC composition (decomposed input → composed bytes),
    Unicode lower, whitespace collapse, space trim, changed flag; NULL and
    empty rows pass through."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        normalize_text,
        normalize_text_column,
    )

    decomposed = "Café"          # e + combining acute
    angstrom = "Å"                 # ANGSTROM SIGN → Å → å
    vals = [decomposed + "  X", angstrom, "already canonical", "  A\tB\nC ",
            None, "", "MiXeD case"]
    out = normalize_text_column(pa.array(vals)).to_pylist()
    assert out[0] == "café x"      # composed single codepoint
    assert out[1] == "å"
    assert out[2] == "already canonical"
    assert out[3] == "a b c"
    assert out[4] is None and out[5] == ""
    assert out[6] == "mixed case"

    ds = rd.from_arrow(pa.table({"doc_id": list(range(7)),
                                 "text": pa.array(vals, type=pa.string())}))
    t = normalize_text(ds, "text", "doc_id").to_pandas().sort_values("doc_id")
    assert t["norm_text"].tolist()[:4] == out[:4]
    assert t["changed"].tolist() == [True, True, False, True, False, False, True]


def test_grouped_quantiles_semantics(ray_session):
    """grouped_quantiles: percentile_disc per group (smallest value with
    cumulative count >= ceil(q*n)); NULL vals dropped, NULL group kept as
    its own group, DuckDB-identical."""
    import duckdb
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import grouped_quantiles

    # group "c" is ALL-NULL in v: SQL GROUP BY still emits it with a NULL
    # quantile — the operator must not silently drop it
    t = pa.table({
        "g": ["a"] * 5 + ["b"] * 4 + [None] * 2 + ["c"] * 2,
        "v": [1, 2, 3, 4, 100, 10, 20, 30, None, 7, 9, None, None],
    })
    qs = [("p50", 0.5), ("p95", 0.95)]
    got = grouped_quantiles(rd.from_arrow(t), "g", "v", qs).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT g, pct, val FROM ("
        "SELECT g, 'p50' AS pct, quantile_disc(v, 0.5) AS val FROM t GROUP BY g "
        "UNION ALL SELECT g, 'p95', quantile_disc(v, 0.95) FROM t GROUP BY g"
        ") ORDER BY g NULLS LAST, pct"
    ).df()
    got = got.sort_values(["g", "pct"], na_position="last").reset_index(drop=True)
    assert got["val"].isna().tolist() == exp["val"].isna().tolist()
    assert got["val"].fillna(-1).astype("int64").tolist() == \
        exp["val"].fillna(-1).astype("int64").tolist()
    assert got["pct"].tolist() == exp["pct"].tolist()
    assert got["g"].fillna("~").tolist() == exp["g"].fillna("~").tolist()


def test_normalize_text_duckdb_parity_fuzz():
    """Seeded Unicode fuzz: normalize_text_column is byte-identical to its
    DuckDB oracle expression (nfc_normalize → lower → \\s+ collapse →
    space-trim) across combining marks, Turkish dotted I, sharp-S casing,
    fullwidth forms, CJK, ligatures and exotic whitespace."""
    import duckdb

    import numpy as np

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        normalize_text_column,
    )

    rng = np.random.default_rng(7)
    pool = list("abcXYZ 0189") + [
        "é", "é", "İ", "ı", "ẞ", "ß", "Σ", "σ", "ς", "Д", "д", "中",
        "\t", "\n", "\r", " ", " ", "　", "Ａ", "ﬁ", "Å", "Å",
        "I", "õ", "õ"]
    vals = ["".join(rng.choice(pool, int(rng.integers(0, 12))))
            for _ in range(1500)]
    got = normalize_text_column(pa.array(vals)).to_pylist()
    con = duckdb.connect()
    exp = [r[0] for r in con.execute(
        "SELECT trim(regexp_replace(lower(nfc_normalize(v)), '\\s+', ' ', "
        "'g'), ' ') FROM (SELECT unnest(?) AS v)", [vals]).fetchall()]
    assert got == exp


def test_concat_cast_null_typed_block_regression():
    """r4 driver failure: Ray's sort-based aggregate emitted a partition
    holding only the all-NULL (group, NULL, 0) marker rows, whose value
    column came back NULL-TYPED, and the plain concat threw ArrowInvalid
    (CORRECTNESS_r04 grouped_quantiles at num_cpus=32).  concat_cast must
    absorb null-typed blocks — including when EVERY block is null-typed —
    and pin column order."""
    from project_gutenberg_full_text_search_ray.functions.arrowutil import (
        concat_cast)

    schema = pa.schema([("lang", pa.string()), ("n_chars", pa.int64()),
                        ("c", pa.int64())])
    typed = pa.table({"lang": ["en"], "n_chars": pa.array([7], pa.int64()),
                      "c": pa.array([3], pa.int64())})
    # the failing shape, verbatim from the r4 traceback: n_chars: null
    marker_only = pa.table({
        "lang": pa.array(["zz"], pa.string()),
        "n_chars": pa.array([None], pa.null()),
        "c": pa.array([0], pa.int64())})
    # column order differing per block (pyarrow group_by is version-dependent)
    reordered = typed.select(["c", "n_chars", "lang"])
    out = concat_cast([typed, marker_only, reordered], schema)
    assert out.schema == schema
    assert out["n_chars"].to_pylist() == [7, None, 7]
    # every block null-typed → declared type still wins
    out = concat_cast([marker_only], schema)
    assert out.schema == schema and out["n_chars"].to_pylist() == [None]
    # empty input → typed empty
    out = concat_cast([typed.slice(0, 0)], schema)
    assert out.schema == schema and out.num_rows == 0


def test_run_starts_sorted_null_boundaries():
    from project_gutenberg_full_text_search_ray.functions.arrowutil import (
        run_starts_sorted)

    a = pa.chunked_array([["a", "a"], ["b", None], [None]])
    assert run_starts_sorted(a).tolist() == [0, 2, 3]
    assert run_starts_sorted(pa.array([], pa.string())).tolist() == []
    assert run_starts_sorted(pa.array([None, None], pa.int64())).tolist() == [0]
    assert run_starts_sorted(pa.array([5])).tolist() == [0]


def test_grouped_quantiles_marker_only_partitions(ray_session):
    """Force the r4 crash geometry: a group that is ENTIRELY NULL-valued
    (its only aggregate rows are the (group, NULL, 0) markers) and sorts
    LAST, over many more partitions than groups, so Ray's sort-based
    aggregate carves out partitions holding only marker rows."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import (
        grouped_quantiles)

    t = pa.table({
        "g": (["a"] * 400 + ["m"] * 400 + ["zz"] * 400),
        "v": pa.array(list(range(400)) + list(range(400)) + [None] * 400,
                      type=pa.int64()),
    })
    got = grouped_quantiles(rd.from_arrow(t).repartition(64), "g", "v",
                            [("p50", 0.5), ("p95", 0.95)])
    assert got["g"].to_pylist() == ["a", "a", "m", "m", "zz", "zz"]
    assert got["val"].to_pylist() == [199, 379, 199, 379, None, None]
    assert got["val"].type == pa.int64()


def test_grouped_quantiles_int64_exact_and_null_schema(ray_session):
    """The fold must stay exact above 2^53 (no float64 round trip) and the
    output val type must equal the input type even when EVERY group is
    all-NULL."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import grouped_quantiles

    big = (1 << 53) + 1
    t = pa.table({"g": ["a", "a", "a"],
                  "v": pa.array([big, big, big], type=pa.int64())})
    got = grouped_quantiles(rd.from_arrow(t), "g", "v", [("p50", 0.5)])
    assert got["val"].to_pylist() == [big]          # exact, not 2^53
    assert got["val"].type == pa.int64()

    allnull = pa.table({"g": ["a", "b"],
                        "v": pa.array([None, None], type=pa.int64())})
    got = grouped_quantiles(rd.from_arrow(allnull), "g", "v", [("p50", 0.5)])
    assert got["val"].to_pylist() == [None, None]
    assert got["val"].type == pa.int64()            # schema-stable output


def test_quantiles_unbounded_vs_bruteforce(ray_session):
    """quantiles_unbounded (iterative histogram refinement) must equal the
    sorted-array percentile_disc on every geometry: full-int64 spans (the
    wraparound-distance arithmetic), mass points, all-negative values, and
    single-row inputs — with tiny n_buckets/exact_span so several
    refinement passes actually run."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import (
        quantiles_unbounded)

    import numpy as np

    def ref(v, q):
        s = np.sort(v)
        return int(s[max(1, int(np.ceil(q * len(v)))) - 1])

    rng = np.random.default_rng(7)
    cases = {
        "wide": rng.integers(-2**62, 2**62, 2000, dtype=np.int64),
        "mass_point": np.concatenate([
            np.full(1500, 123456789, dtype=np.int64),
            rng.integers(-10**12, 10**12, 500, dtype=np.int64)]),
        "negative": rng.integers(-10**15, -5, 1000, dtype=np.int64),
        "single": np.array([42], dtype=np.int64),
        "extremes": np.array([-2**63, 2**63 - 1], dtype=np.int64),
    }
    qs = [("p01", 0.01), ("p50", 0.5), ("p95", 0.95), ("p100", 1.0)]
    for name, v in cases.items():
        ds = rd.from_arrow(pa.table({"x": pa.array(v, type=pa.int64())})) \
            .repartition(8)
        t = quantiles_unbounded(ds, "x", qs, n_buckets=64, exact_span=128)
        got = dict(zip(t["pct"].to_pylist(), t["val"].to_pylist()))
        assert got == {n2: ref(v, q) for n2, q in qs}, name


def test_quantiles_unbounded_nulls_empty_and_float_guard(ray_session):
    """NULLs drop like quantile_disc, empty/all-NULL input yields NULL
    values, and float columns are refused (exactness contract)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import (
        quantiles_unbounded)

    ds = rd.from_arrow(pa.table({
        "x": pa.array([None, 5, None, 1, 9], type=pa.int64())}))
    t = quantiles_unbounded(ds, "x", [("p50", 0.5)])
    assert t["val"].to_pylist() == [5]

    empty = rd.from_arrow(pa.table({
        "x": pa.array([None, None], type=pa.int64())}))
    t = quantiles_unbounded(empty, "x", [("p50", 0.5)])
    assert t["val"].to_pylist() == [None]
    assert t["val"].type == pa.int64()

    with pytest.raises(TypeError, match="integer"):
        quantiles_unbounded(
            rd.from_arrow(pa.table({"x": [1.0]})), "x", [("p50", 0.5)])


def test_table_refs_single_execution(ray_session, tmp_path):
    """arrowutil.table_refs must execute a lazy pipeline exactly once.
    Dataset.to_arrow_refs() consumes the stream and then fetches the schema
    with fetch_if_missing=True, which plans a SECOND limit-1 execution of
    the whole upstream (the round-5 2×-fold finding) — pin the helper's
    behavior with a side-effect counter so a regression is loud."""
    import glob
    import uuid

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from project_gutenberg_full_text_search_ray.functions.arrowutil import (
        table_refs)

    marker_dir = str(tmp_path / "exec_markers")
    os.makedirs(marker_dir, exist_ok=True)

    def touch(b: pa.Table) -> pa.Table:
        open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
        import pyarrow.compute as pc
        k = pc.cast(pc.bit_wise_and(b["id"], 3), pa.int64())
        return pa.table({"k": k,
                         "c": pa.array([1] * b.num_rows, type=pa.int64())})

    ds = rd.range(1000, override_num_blocks=4) \
        .map_batches(touch, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("c", alias_name="c"))
    tabs = [t for t in ray.get(table_refs(ds)) if t.num_rows]
    assert sum(t.num_rows for t in tabs) == 4  # groups 0..3
    n_exec = len(glob.glob(marker_dir + "/*"))
    assert n_exec == 4, f"upstream ran {n_exec / 4:.0f}x (expected once)"


def test_grouped_quantiles_unbounded_vs_duckdb(ray_session):
    """Per-group iterative-refinement quantiles must match DuckDB's
    GROUP BY quantile_disc on a mixed fixture: full-int64-range values,
    NULL groups, scattered NULL values, and an all-NULL-value group — with
    tiny n_buckets/exact_span so several refinement passes run."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.topk import (
        grouped_quantiles_unbounded)

    rng = np.random.default_rng(9)
    n = 4000
    g = rng.choice(["en", "fr", "de", None], size=n, p=[.5, .25, .15, .1]).tolist()
    v = rng.integers(-2**60, 2**60, n).tolist()
    g += ["zz"] * 5
    v += [None] * 5                     # all-NULL group must surface as NULL
    for i in range(0, n, 37):
        v[i] = None                     # scattered NULL values drop
    t = pa.table({"lang": pa.array(g, type=pa.string()),
                  "x": pa.array(v, type=pa.int64())})
    qs = [("p25", 0.25), ("p50", 0.5), ("p100", 1.0)]
    got = grouped_quantiles_unbounded(
        rd.from_arrow(t).repartition(8), "lang", "x", qs,
        n_buckets=64, exact_span=256).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.execute(
        "SELECT lang, pct, val FROM ("
        + " UNION ALL ".join(
            f"SELECT lang, '{nm}' AS pct, quantile_disc(x, {q}) AS val "
            f"FROM t GROUP BY lang" for nm, q in qs)
        + ") ORDER BY lang NULLS LAST, pct").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)

    with pytest.raises(TypeError, match="integer"):
        grouped_quantiles_unbounded(
            rd.from_arrow(pa.table({"g": ["a"], "x": [1.0]})), "g", "x", qs)


def test_lm_surprisal_hand_computed(ray_session):
    """Tiny corpus with hand-derivable unigram surprisals: counts a:2 b:2
    c:1 over C=5 tokens; per-doc bits are exact sums of the per-distinct-
    token quantized values (independently recomputed here with math.log2)."""
    import math

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        lm_surprisal_scores)

    rows = [(0, "a a b"), (1, "b c")]
    out = _collect(lm_surprisal_scores(_docs(rows), "text", "doc_id"))

    def qb(c, C=5, quant=1024):
        return math.floor(-math.log2(c / C) * quant + 0.5)

    exp0 = 2 * qb(2) + qb(2)          # a a b
    exp1 = qb(2) + qb(1)              # b c
    assert out["n_tokens"].tolist() == [3, 2]
    assert out["bits_q"].tolist() == [exp0, exp1]
    assert out["bpt_q"].tolist() == [exp0 // 3, exp1 // 2]


def test_lm_surprisal_partition_invariance_and_nulls(ray_session):
    """Scores are pure functions of (token, corpus counts): repartitioning
    cannot move them; NULL/empty texts score 0 tokens with NULL bpt_q."""
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        lm_surprisal_scores)

    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["x y z", None, "", "x x y"], type=pa.string()),
    })
    ds = rd.from_arrow(t)
    a = _collect(lm_surprisal_scores(ds, "text", "doc_id"))
    b = _collect(lm_surprisal_scores(ds.repartition(5), "text", "doc_id"))
    assert a.equals(b)
    assert a["n_tokens"].tolist() == [3, 0, 0, 3]
    assert a["bpt_q"].isna().tolist() == [False, True, True, False]
    assert (a.loc[[0, 3], "bits_q"] > 0).all()


def test_lm_surprisal_vocab_cap(ray_session):
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        lm_surprisal_scores)

    with pytest.raises(ValueError, match="vocab_cap"):
        lm_surprisal_scores(_docs([(0, "a b c d e f")]), "text", "doc_id",
                            vocab_cap=3)


def _gdocs(spec):
    """spec: {group: n_docs} → Dataset of (doc_id, grp, text) with doc_ids
    assigned in group order; text = f"w{doc_id % 7} common"."""
    import ray.data as rd

    ids, grps, texts = [], [], []
    i = 0
    for g, n in spec.items():
        for _ in range(n):
            ids.append(i)
            grps.append(g)
            texts.append(f"w{i % 7} common")
            i += 1
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "grp": pa.array(grps, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_temperature_rates_alpha_half(ray_session):
    """rate_g = sqrt(n_min/n_g): the smallest group keeps everything,
    larger groups downsample by the square-root ratio; α=1 keeps all."""
    import numpy as np

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        temperature_rates)

    ds = _gdocs({"en": 400, "de": 100, "fr": 25})
    rates = temperature_rates(ds, "grp", alpha=0.5)
    assert rates["fr"] == 1.0
    assert rates["de"] == float(np.sqrt(np.float64(25.0) / np.float64(100.0)))
    assert rates["en"] == float(np.sqrt(np.float64(25.0) / np.float64(400.0)))
    assert temperature_rates(ds, "grp", alpha=1.0) == {
        "en": 1.0, "de": 1.0, "fr": 1.0}


def test_temperature_sample_deterministic_null_groups_dropped(ray_session):
    """Sampling is a pure function of (seed, id, group counts): identical
    across repartitionings; NULL-group rows never survive; the min group
    survives completely (rate exactly 1.0)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        temperature_sample)

    t = pa.table({
        "doc_id": pa.array(list(range(300)), type=pa.int64()),
        "grp": pa.array((["en"] * 250 + ["fr"] * 40)
                        + [None] * 10, type=pa.string()),
    })
    ds = rd.from_arrow(t)
    a = temperature_sample(ds, "doc_id", "grp", seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = temperature_sample(ds.repartition(7), "doc_id", "grp", seed=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert not a["grp"].isna().any()
    assert (a["grp"] == "fr").sum() == 40          # min group: rate 1.0
    n_en = (a["grp"] == "en").sum()
    assert 0 < n_en < 250                          # en downsampled


def test_perplexity_buckets_labels_and_nulls(ray_session):
    """Bucket = first edge whose cut ≥ bpt_q (cut points are data values,
    so per group roughly thirds land in each tier); token-less docs get a
    NULL bucket; a scalar reimplementation of the rule agrees row-for-row
    with the vectorized labeling pass."""
    import numpy as np
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        lm_surprisal_scores, perplexity_buckets)

    rng = range(120)
    t = pa.table({
        "doc_id": pa.array(list(rng) + [900, 901], type=pa.int64()),
        "grp": pa.array(["a" if i % 2 else "b" for i in rng]
                        + ["a", None], type=pa.string()),
        # i%5 once-only tokens per doc → 5 distinct bpt strata per group
        "text": pa.array(["common common " + " ".join(
            f"u{i}x{j}" for j in range(i % 5))
            for i in rng] + ["", "common"], type=pa.string()),
    })
    ds = rd.from_arrow(t)
    out = perplexity_buckets(ds, "text", "doc_id", "grp") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 122
    # token-less doc → NULL bucket; NULL group is its own group
    assert out.loc[out["doc_id"] == 900, "bucket"].isna().all()
    assert out.loc[out["doc_id"] == 901, "bucket"].notna().all()

    # scalar reference: per-group exact percentile_disc cuts over bpt_q
    scores = lm_surprisal_scores(ds, "text", "doc_id", carry_cols=("grp",)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for g in ["a", "b", None]:
        m = scores["grp"].isna() if g is None else scores["grp"] == g
        vals = np.sort(scores.loc[m, "bpt_q"].dropna().to_numpy())
        cuts = [vals[max(1, int(np.ceil(q * len(vals)))) - 1]
                for q in (1 / 3, 2 / 3)] if len(vals) else [None, None]
        gm = out["grp"].isna() if g is None else out["grp"] == g
        for _, row in out.loc[gm].iterrows():
            if pa.compute.is_null(pa.scalar(row["bpt_q"])).as_py() or \
                    row["bpt_q"] is None or row["bpt_q"] != row["bpt_q"]:
                assert row["bucket"] is None or row["bucket"] != row["bucket"]
                continue
            v = int(row["bpt_q"])
            exp = ("head" if cuts[0] is not None and v <= cuts[0] else
                   "middle" if cuts[1] is not None and v <= cuts[1]
                   else "tail")
            assert row["bucket"] == exp, (g, v, cuts, row["bucket"])
    # each populated tier is non-trivial per group (thirds by construction)
    for g in ("a", "b"):
        counts = out.loc[out["grp"] == g, "bucket"].value_counts()
        assert set(counts.index) == {"head", "middle", "tail"}
        assert (counts >= len(out.loc[out["grp"] == g]) // 6).all()


def test_token_budget_rates_and_sample(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        token_budget_rates, token_budget_sample)

    rng = np.random.default_rng(11)
    rows = {"doc_id": [], "grp": [], "text": []}
    for i in range(300):
        grp = "big" if i % 3 else "small"
        n = 40 if grp == "big" else 5
        rows["doc_id"].append(i)
        rows["grp"].append(grp)
        rows["text"].append(" ".join(
            f"w{int(x)}" for x in rng.integers(0, 50, size=n)))
    rows["doc_id"].append(300)
    rows["grp"].append(None)          # NULL group → excluded
    rows["text"].append("x y z")
    tab = pa.table({"doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                    "grp": pa.array(rows["grp"], type=pa.string()),
                    "text": rows["text"]})
    ds = rd.from_arrow(tab)
    rates = token_budget_rates(ds, "text", "grp", budget_tokens=1000)
    # big: 200 docs × 40 tokens = 8000 → rate 0.125; small: 500 → rate 1.0
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 1000 / 8000) < 1e-12
    assert None not in rates

    out = token_budget_sample(ds, "text", "doc_id", "grp",
                              budget_tokens=1000).to_pandas()
    kept = out.groupby("grp")["doc_id"].count()
    assert kept["small"] == 100                 # rate 1.0 keeps everything
    assert 5 <= kept["big"] <= 60               # ~25 expected at rate 0.125
    assert (out["grp"].notna()).all()           # NULL group dropped
    # deterministic and partition-invariant
    again = token_budget_sample(rd.from_arrow(tab).repartition(7), "text",
                                "doc_id", "grp",
                                budget_tokens=1000).to_pandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_token_budget_rates_edge_cases(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        token_budget_rates)

    ds = rd.from_arrow(pa.table({
        "grp": pa.array(["a", "b"], type=pa.string()),
        "text": pa.array(["one two three", None], type=pa.string())}))
    rates = token_budget_rates(ds, "text", "grp", budget_tokens=2)
    assert abs(rates["a"] - 2 / 3) < 1e-12
    assert rates["b"] == 1.0                     # zero tokens ≤ budget
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_rates(ds, "text", "grp", budget_tokens=-1)


# ------------------------------------------------------------ line dedup


def _line_dedup(tab, **kw):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    return line_dedup(rd.from_arrow(tab), "text", "doc_id", **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_line_dedup_first_occurrence_wins(ray_session):
    tab = pa.table({
        "doc_id": pa.array([5, 1, 2, 3, 9], type=pa.int64()),
        "text": [
            "alpha\nbeta\nalpha\ngamma",  # in-doc dup alpha; beta loses to 1
            "beta\n\ndelta",              # empty piece never participates
            "delta\nepsilon",             # delta already first in doc 1
            "",                           # no pieces → no row
            None,                         # null text → no row
        ]})
    out = _line_dedup(tab)
    assert out["doc_id"].tolist() == [1, 2, 5]
    assert out["text"].tolist() == ["beta\ndelta", "epsilon", "alpha\ngamma"]


def test_line_dedup_custom_sep_and_all_deduped_doc(ray_session):
    tab = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["x | y", "x | y"]})
    out = _line_dedup(tab, sep=" | ")
    # doc 2 loses every line → emits no row
    assert out["doc_id"].tolist() == [1]
    assert out["text"].tolist() == ["x | y"]


def test_line_dedup_block_geometry_invariant(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    import numpy as np

    rng = np.random.default_rng(11)
    lines = [f"line{i}" for i in range(25)]
    texts = ["\n".join(rng.choice(lines, size=rng.integers(1, 8)))
             for _ in range(80)]
    tab = pa.table({"doc_id": pa.array(range(80), type=pa.int64()),
                    "text": texts})
    a = _line_dedup(tab)
    b = line_dedup(rd.from_arrow(tab).repartition(17), "text", "doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_line_dedup_guards(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    with pytest.raises(Exception, match="integer id"):
        line_dedup(rd.from_arrow(pa.table({
            "doc_id": pa.array(["a"], type=pa.string()),
            "text": ["x"]})), "text", "doc_id").to_pandas()
    with pytest.raises(Exception, match="NULL ids"):
        line_dedup(rd.from_arrow(pa.table({
            "doc_id": pa.array([None], type=pa.int64()),
            "text": ["x"]})), "text", "doc_id").to_pandas()
    with pytest.raises(Exception, match="2\\^42"):
        line_dedup(rd.from_arrow(pa.table({
            "doc_id": pa.array([1 << 50], type=pa.int64()),
            "text": ["x"]})), "text", "doc_id").to_pandas()

def test_line_dedup_spill_route_matches_broadcast(ray_session):
    """Above line_cap the winner keys spill to packed-sorted parquet and
    rebuild batches read range-pruned slices — row-identical to the
    broadcast route on the same corpus."""
    import numpy as np
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    rng = np.random.default_rng(13)
    lines = [f"line{i}" for i in range(40)]
    texts = ["\n".join(rng.choice(lines, size=rng.integers(1, 9)))
             for _ in range(120)]
    tab = pa.table({"doc_id": pa.array(range(120), type=pa.int64()),
                    "text": texts})
    broad = line_dedup(rd.from_arrow(tab).repartition(9), "text",
                       "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    spilled = line_dedup(rd.from_arrow(tab).repartition(9), "text",
                         "doc_id", line_cap=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert broad.equals(spilled)


def test_line_dedup_duplicate_and_uint64_ids_raise(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    # duplicate ids: packed occurrence keys would collide and keep BOTH
    # copies of a duplicated line — must raise instead
    with pytest.raises(Exception, match="duplicate ids"):
        line_dedup(rd.from_arrow(pa.table({
            "doc_id": pa.array([7, 7], type=pa.int64()),
            "text": ["x", "x"]})), "text", "doc_id").to_pandas()
    # uint64 beyond int64 range: a wrapping astype would invert the
    # first-occurrence order — the safe cast must raise
    with pytest.raises(Exception, match="[Cc]ast|[Oo]verflow"):
        line_dedup(rd.from_arrow(pa.table({
            "doc_id": pa.array([1, (1 << 64) - 1], type=pa.uint64()),
            "text": ["x", "x"]})), "text", "doc_id").to_pandas()
    # in-range uint64 stays usable
    ok = line_dedup(rd.from_arrow(pa.table({
        "doc_id": pa.array([2, 1], type=pa.uint64()),
        "text": ["x", "x"]})), "text", "doc_id").to_pandas()
    assert ok["doc_id"].tolist() == [1]


def test_line_dedup_idempotent_and_globally_unique(ray_session):
    """After one pass every distinct line occurs exactly once corpus-wide,
    so a second pass is the identity — the CCNet-pass semantic contract."""
    import numpy as np
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    rng = np.random.default_rng(29)
    lines = [f"line{i}" for i in range(15)]
    texts = ["\n".join(rng.choice(lines, size=rng.integers(1, 6)))
             for _ in range(50)]
    tab = pa.table({"doc_id": pa.array(range(50), type=pa.int64()),
                    "text": texts})
    once = line_dedup(rd.from_arrow(tab), "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # global uniqueness: each distinct line appears exactly once
    flat = [ln for t in once["text"] for ln in t.split("\n")]
    assert len(flat) == len(set(flat))
    # idempotence
    again = line_dedup(
        rd.from_arrow(pa.Table.from_pandas(once, preserve_index=False)),
        "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert once.equals(again)


def test_group_cap_exact_and_block_invariant(ray_session):
    import numpy as np
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        group_cap)

    rng = np.random.default_rng(3)
    groups = rng.choice(["a", "b", "c", None], size=400).tolist()
    ids = rng.permutation(400).astype(np.int64)
    tab = pa.table({"doc_id": pa.array(ids),
                    "grp": pa.array(groups, type=pa.string())})
    out = group_cap(rd.from_arrow(tab).repartition(11), "grp", "doc_id",
                    cap=5).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    # brute force: smallest 5 ids per group (None = its own group)
    import collections
    by = collections.defaultdict(list)
    for i, g in zip(ids.tolist(), groups):
        by[g].append(i)
    exp = sorted((i, g) for g, vs in by.items() for i in sorted(vs)[:5])
    assert list(zip(out["doc_id"], out["grp"].where(out["grp"].notna(),
                                                    None))) == exp
    # block-geometry invariance
    b = group_cap(rd.from_arrow(tab).repartition(2), "grp", "doc_id",
                  cap=5).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out.equals(b)


def test_group_cap_guards_and_edges(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        group_cap)

    with pytest.raises(ValueError, match="cap"):
        group_cap(rd.from_arrow(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "grp": ["x"]})), "grp", "doc_id", cap=0)
    # single group spanning every block: only cap rows survive
    tab = pa.table({"doc_id": pa.array(range(100), type=pa.int64()),
                    "grp": pa.array(["only"] * 100)})
    out = group_cap(rd.from_arrow(tab).repartition(10), "grp", "doc_id",
                    cap=3).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 1, 2]


def test_group_cap_nul_suffix_groups_and_guards(ray_session):
    """Regression (review-confirmed): numpy object-vs-scalar string
    compares truncate trailing NULs, so a group value ending in '\\x00'
    used to break the boundary carry.  Arrow-native run boundaries must
    count it exactly; NULL / duplicate ids raise."""
    import numpy as np
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        group_cap)

    rng = np.random.default_rng(19)
    opts = ["a", "aa", "a\x00"]  # NOT rng.choice — numpy <U2 strips \x00
    groups = [opts[i] for i in rng.integers(0, 3, size=300)]
    ids = rng.permutation(300).astype(np.int64)
    tab = pa.table({"doc_id": pa.array(ids),
                    "grp": pa.array(groups, type=pa.string())})
    out = group_cap(rd.from_arrow(tab).repartition(17), "grp", "doc_id",
                    cap=8).to_pandas()
    import collections
    by = collections.defaultdict(list)
    for i, g in zip(ids.tolist(), groups):
        by[g].append(i)
    exp = sorted((i, g) for g, vs in by.items() for i in sorted(vs)[:8])
    got = sorted(zip(out["doc_id"], out["grp"]))
    assert got == exp and len(got) == 24
    with pytest.raises(Exception, match="NULL ids"):
        group_cap(rd.from_arrow(pa.table({
            "doc_id": pa.array([None], type=pa.int64()),
            "grp": ["x"]})), "grp", "doc_id", cap=1).to_pandas()
    with pytest.raises(Exception, match="duplicate ids"):
        group_cap(rd.from_arrow(pa.table({
            "doc_id": pa.array([3, 3], type=pa.int64()),
            "grp": ["x", "x"]})), "grp", "doc_id", cap=1).to_pandas()


def test_line_dedup_explicit_spill_dir(ray_session, tmp_path):
    """spill_dir: caller-managed winner-table location (the multi-node
    shared-path contract) — used, row-identical, left for the caller."""
    import os

    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    tab = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                    "text": [f"u{i}\nshared" for i in range(20)]})
    spill = str(tmp_path / "winners")
    out = line_dedup(rd.from_arrow(tab), "text", "doc_id",
                     line_cap=3, spill_dir=spill).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # 21 distinct lines > cap → the spill route ran and used our dir
    assert os.path.isdir(spill) and os.listdir(spill)
    ref = line_dedup(rd.from_arrow(tab), "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.equals(ref)
    assert out["text"].tolist()[0] == "u0\nshared"
    assert "shared" not in out["text"].tolist()[1]
