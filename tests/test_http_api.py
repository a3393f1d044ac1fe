"""HTTP JSON facade (S6/§2.10): real sockets via ThreadingHTTPServer, result
parity with direct engine execution, reference pagination clamps."""

import json
import urllib.request

import pytest

from project_gutenberg_full_text_search_ray.pipelines.http_api import (
    SearchAPI, SearchHTTPServer, parse_field, parse_pagination)


@pytest.fixture(scope="module")
def server(engine):
    srv = SearchHTTPServer(engine).start()
    yield srv
    srv.close()


def _get(srv, path):
    try:
        with urllib.request.urlopen(srv.url + path, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_pagination_clamps_match_reference():
    # opds.py:55-60: default 28, clamp 1..100
    assert parse_pagination(None, None) == (1, 28)
    assert parse_pagination(0, 0) == (1, 1)
    assert parse_pagination(3, 500) == (3, 100)
    assert parse_pagination("x", "y") == (1, 28)


def test_parse_field():
    assert parse_field("") == (None, "fts")
    assert parse_field("keyword") == (None, "fts")
    assert parse_field("fts_text") == ("text", "fts")
    assert parse_field("fuzzy_keyword") == (None, "fuzzy")
    assert parse_field("contains_text") == ("text", "contains")


def test_values_browse_cardinality_guard(server, engine):
    """A corpus-cardinality column must 400 on /values (and /browse, which
    shares value_counts) instead of materializing a corpus-sized vocabulary
    on the driver — the KMV precheck enforces the cap loudly."""
    old = engine.max_browse_vocab
    engine.max_browse_vocab = 100  # fixture ts has 1600 distinct values
    try:
        assert "ts" not in engine._vocab_cache  # precheck must actually run
        status, body = _get(server, "/values?col=ts")
        assert status == 400
        assert "cap" in body["error"]
        status2, _ = _get(server, "/browse?col=ts")
        assert status2 == 400
        # enum-like columns stay browseable under the same cap
        status3, ok = _get(server, "/values?col=role")
        assert status3 == 200 and len(ok["values"]) >= 2
    finally:
        engine.max_browse_vocab = old


def test_default_mode_divergence_from_reference(server, engine):
    """Documented divergence from opds.py:31-32: a bare/unknown field runs
    FTS here (the reference defaults to FUZZY) — the bare search box fronts
    the ranked BM25 engine; fuzzy stays one explicit prefix away and the
    socket path proves both routes stay live and distinct."""
    assert parse_field("nosuchfield") == ("nosuchfield", "fts")
    _, bare = _get(server, "/search?query=streming&limit=5")
    _, fuzzy = _get(server, "/search?query=streming&field=fuzzy_keyword&limit=5")
    # 'streming' is a typo present in no document: FTS finds nothing, fuzzy
    # trigram-expands it to the planted 'streaming' and does
    assert bare["total"] == 0
    assert fuzzy["total"] > 0


def test_default_mode_fuzzy_reference_parity(engine):
    """``default_mode="fuzzy"`` restores the opds.py:31-32 default exactly:
    bare/unknown fields route FUZZY, explicit prefixes still win."""
    assert parse_field("", "fuzzy") == (None, "fuzzy")
    assert parse_field("keyword", "fuzzy") == (None, "fuzzy")
    assert parse_field("nosuchfield", "fuzzy") == ("nosuchfield", "fuzzy")
    assert parse_field("fts_text", "fuzzy") == ("text", "fts")

    srv = SearchHTTPServer(engine, default_mode="fuzzy").start()
    try:
        _, bare = _get(srv, "/search?query=streming&limit=5")
        assert bare["total"] > 0  # typo now trigram-expands by default
        _, fts = _get(srv, "/search?query=streming&field=fts_keyword&limit=5")
        assert fts["total"] == 0  # explicit prefix still selects FTS
    finally:
        srv.close()

    with pytest.raises(ValueError, match="default_mode"):
        SearchAPI(engine, default_mode="nonsense")


def test_index_feed(server):
    status, feed = _get(server, "/")
    assert status == 200
    rels = {l["rel"] for l in feed["links"]}
    assert {"self", "search"} <= rels


def test_search_parity_with_engine(server, engine):
    status, feed = _get(server, "/search?query=w00001&page=1&limit=10")
    assert status == 200
    res = engine.execute(engine.query().search("w00001")[1, 10])
    assert feed["total"] == res.total
    assert [r[c] for r in feed["results"] for c in ("conv_id", "turn_idx")] == \
           [r[c] for r in res.table.to_pylist() for c in ("conv_id", "turn_idx")]


def test_search_filter_param(server, engine):
    status, feed = _get(server, "/search?query=w00001&f.role=assistant&limit=100")
    assert status == 200
    res = engine.execute(engine.query().search("w00001").eq("role", "assistant")[1, 100])
    assert feed["total"] == res.total
    assert all(r["role"] == "assistant" for r in feed["results"])


def test_pagination_links(server):
    _, p1 = _get(server, "/search?query=the&page=1&limit=5")
    rels = {l["rel"] for l in p1["links"]}
    assert "self" in rels and "previous" not in rels
    if p1["total"] > 5:
        assert "next" in rels
    _, p2 = _get(server, "/search?query=the&page=2&limit=5")
    assert "previous" in {l["rel"] for l in p2["links"]}


def test_count_endpoint(server, engine):
    _, c = _get(server, "/count?query=w00001")
    assert c["total"] == engine.count(engine.query().search("w00001")[1, 1])


def test_zero_match_and_errors(server):
    status, feed = _get(server, "/search?query=zzzznotaword")
    assert status == 200 and feed["total"] == 0 and feed["results"] == []
    status, err = _get(server, "/nope")
    assert status == 404 and "error" in err


def test_suggest_endpoint(server, engine):
    status, feed = _get(server, "/suggest?prefix=w00&limit=5")
    assert status == 200 and len(feed["suggestions"]) == 5
    exp = engine.suggest("w00", k=5)
    assert [s["term"] for s in feed["suggestions"]] == exp["term"].to_pylist()
    assert [s["df"] for s in feed["suggestions"]] == exp["df"].to_pylist()
    # dfs arrive hottest-first
    dfs = [s["df"] for s in feed["suggestions"]]
    assert dfs == sorted(dfs, reverse=True)


def test_suggest_word_endpoint(server, engine):
    status, feed = _get(server, "/suggest?word=quik")
    assert status == 200
    exp = engine.did_you_mean("quik", k=10)
    assert [s["term"] for s in feed["suggestions"]] == exp["term"].to_pylist()
    assert all(0 <= s["similarity"] <= 1 for s in feed["suggestions"])


def test_suggest_param_validation(server):
    for path in ("/suggest", "/suggest?prefix=a&word=b"):
        status, err = _get(server, path)
        assert status == 400 and "error" in err
    status, feed = _get(server, "/suggest?prefix=w00&limit=bogus")
    assert status == 200 and len(feed["suggestions"]) <= 10


def test_api_handle_without_sockets(engine):
    api = SearchAPI(engine)
    status, feed = api.handle("/search", {"query": "w00001", "limit": "3"})
    assert status == 200 and len(feed["results"]) <= 3


def test_search_facets_block(server, engine):
    """facet=<col> adds sampled facet counts (the top-subjects feed block)."""
    status, feed = _get(server, "/search?query=the&facet=role&limit=5")
    assert status == 200
    assert "role" in feed["facets"]
    fac = feed["facets"]["role"]
    assert fac and all(set(f) == {"value", "n"} for f in fac)
    # parity with the engine-side sampled facet
    top = engine.top_docs(engine.query().search("the"), 100)
    import collections
    exp = collections.Counter(top["role"].to_pylist())
    got = {f["value"]: f["n"] for f in fac}
    for v, n in got.items():
        assert exp[v] == n
    status2, feed2 = _get(server, "/search?query=the&facet=nosuchcol")
    assert status2 == 200 and feed2["facets"]["nosuchcol"] == []


def test_facets_browse_endpoint(server, engine):
    """Standalone /facets — navigation-feed analog (no search query)."""
    status, feed = _get(server, "/facets?col=role&facet_sample=200")
    assert status == 200 and feed["col"] == "role"
    vals = {f["value"] for f in feed["facets"]}
    assert vals <= {"user", "assistant", "system", "tool"} and vals
    # filtered browse: only matching docs counted
    status2, feed2 = _get(server, "/facets?col=role&f.role=user")
    assert status2 == 200
    assert {f["value"] for f in feed2["facets"]} == {"user"}
    status3, feed3 = _get(server, "/facets")
    assert status3 == 400 and "error" in feed3


def test_contains_multiword_and_short_patterns(server, engine):
    """ILIKE '%q%' parity: multi-word and <3-char substrings must match via
    the substr-filter path (regression: indexed expansion returned 0)."""
    # find a real two-token substring from a doc
    res = engine.execute(engine.query().search("w00001")[1, 1])
    text = None
    if res.table.num_rows:
        for c in res.table.column_names:
            v = res.table[c][0].as_py()
            if isinstance(v, str) and len(v.split()) >= 2:
                text = v
                break
    probe = " ".join(text.split()[:2]) if text else "w00001 w00002"
    status, feed = _get(server, "/search?field=contains_book&query=" +
                        probe.replace(" ", "+"))
    exp_total = engine.contains_multi_dataset(probe).count()
    assert status == 200 and feed["total"] == exp_total > 0
    # short pattern
    status2, feed2 = _get(server, "/search?field=contains_book&query=w0")
    exp2_total = engine.contains_multi_dataset("w0").count()
    assert status2 == 200 and feed2["total"] == exp2_total > 0


def test_contains_field_scoped(server, engine):
    """contains_<metadata col> restricts the substring match to that column."""
    status, feed = _get(server, "/search?field=contains_role&query=assist")
    exp = engine.execute(engine.query().contains("role", "assist")[1, 28])
    assert status == 200 and feed["total"] == exp.total > 0
    assert all(r["role"] == "assistant" for r in feed["results"])


def test_facets_missing_col_is_400(server):
    status, body = _get(server, "/facets")
    assert status == 400 and "error" in body


def test_close_without_start_does_not_hang(engine):
    import time

    from project_gutenberg_full_text_search_ray.pipelines.http_api import SearchHTTPServer

    srv = SearchHTTPServer(engine)  # never started
    t0 = time.time()
    srv.close()
    assert time.time() - t0 < 2


def test_contains_multi_sort_is_400(engine):
    """An explicit sort on the identity-ordered contains-multi path must be
    a 400, not a silently dropped parameter (CLI parity)."""
    from project_gutenberg_full_text_search_ray.pipelines.http_api import SearchAPI

    api = SearchAPI(engine)
    status, payload = api.handle(
        "/search", {"query": "w00001 w00002", "field": "contains_text",
                    "sort": "ts"})
    assert status == 400 and "identity-ordered" in payload["error"]
    # no sort -> normal 200 feed via the same path
    status2, payload2 = api.handle(
        "/search", {"query": "w00001 w00002", "field": "contains_text"})
    assert status2 == 200 and payload2["total"] >= 0


# ---------------------------------------------------------- browse surface
def test_values_endpoint_vocabulary(server, transcripts_table):
    """/values derives the controlled vocabulary (reference constants.py
    analog): every stored value with its exact doc count."""
    import collections

    status, feed = _get(server, "/values?col=role")
    assert status == 200
    exp = collections.Counter(transcripts_table["role"].to_pylist())
    got = {d["value"]: d["n"] for d in feed["values"]}
    assert got == dict(exp)
    status, err = _get(server, "/values?col=nope")
    assert status == 400 and "not a stored column" in err["error"]


def _md5_sample_oracle(transcripts_table, col, value, seed, k):
    """The O6 seeded per-group sample oracle: md5(seed|conv_id|turn_idx)
    ascending — the same key _random_keys pins (segment_search.py)."""
    import hashlib

    rows = [(c, t) for c, t, r in zip(transcripts_table["conv_id"].to_pylist(),
                                      transcripts_table["turn_idx"].to_pylist(),
                                      transcripts_table[col].to_pylist())
            if r == value]
    rows.sort(key=lambda ct: hashlib.md5(f"{seed}|{ct[0]}|{ct[1]}".encode()).hexdigest())
    return rows[:k]


def test_browse_sections_with_seeded_samples(server, transcripts_table):
    """/browse?col=role — navigation lists every value with counts; groups
    carry per-section seeded random samples whose rows match the md5-order
    oracle (reference bookshelf sections, opds.py:543-561)."""
    import collections

    status, feed = _get(server, "/browse?col=role&sections=2")
    assert status == 200
    exp = collections.Counter(transcripts_table["role"].to_pylist())
    nav = {n["title"]: n for n in feed["navigation"]}
    assert len(nav) == len(exp)
    for v, n in exp.items():
        assert f"{v} ({n} docs)" in nav
    assert len(feed["groups"]) == 2
    top2 = sorted(exp.items(), key=lambda t: (-t[1], str(t[0])))[:2]
    for g, (v, n) in zip(feed["groups"], top2):
        assert g["metadata"]["title"] == str(v)
        assert g["metadata"]["numberOfItems"] == n
        assert len(g["publications"]) == min(15, n)  # SAMPLE_LIMIT parity
        got = [(r["conv_id"], r["turn_idx"]) for r in g["publications"]]
        assert got == _md5_sample_oracle(transcripts_table, "role", v, 42, 15)


def test_browse_section_page_and_seed(server, transcripts_table):
    """/browse?col&value: seeded sample pages are deterministic, disjoint,
    and follow the md5 order; changing the seed changes the order."""
    import collections

    role = collections.Counter(transcripts_table["role"].to_pylist()).most_common(1)[0][0]
    s1, p1 = _get(server, f"/browse?col=role&value={role}&page=1&limit=10")
    s2, p2 = _get(server, f"/browse?col=role&value={role}&page=2&limit=10")
    assert s1 == 200 and s2 == 200
    got = [(r["conv_id"], r["turn_idx"]) for r in p1["publications"] + p2["publications"]]
    assert got == _md5_sample_oracle(transcripts_table, "role", role, 42, 20)
    s3, p3 = _get(server, f"/browse?col=role&value={role}&page=1&limit=10&seed=7")
    alt = [(r["conv_id"], r["turn_idx"]) for r in p3["publications"]]
    assert alt == _md5_sample_oracle(transcripts_table, "role", role, 7, 10)
    assert alt != got[:10]


def test_hierarchy_navigation_counts_and_flags(server, transcripts_table):
    """/hierarchy: children one char deeper with exact doc counts and
    has_children flags (reference LoCC tree, opds.py:598-811)."""
    status, feed = _get(server, "/hierarchy?prefix=conv-000001")
    assert status == 200
    nav = feed["navigation"]
    assert [n["href"].split("prefix=")[1] for n in nav] == \
           [f"conv-000001{d}" for d in "0123456789"]
    assert all(n["has_children"] for n in nav)
    assert all("(80 docs)" in n["title"] for n in nav)  # 10 convs × 8 turns

    status, feed = _get(server, "/hierarchy?prefix=conv-0000019")
    assert status == 200
    assert len(feed["navigation"]) == 10
    assert all(not n["has_children"] for n in feed["navigation"])
    assert all("(8 docs)" in n["title"] for n in feed["navigation"])


def test_hierarchy_leaf_returns_identity_ordered_docs(server):
    """A prefix with no children is a leaf → its docs page, identity-ordered
    (reference leaf → books fallthrough)."""
    status, feed = _get(server, "/hierarchy?prefix=conv-00000003")
    assert status == 200
    assert feed["total"] == 8
    assert [r["turn_idx"] for r in feed["results"]] == list(range(8))
    assert {r["conv_id"] for r in feed["results"]} == {"conv-00000003"}


def test_browse_and_hierarchy_param_robustness(server):
    """Bad params degrade like the reference's clamps: garbage ints fall back
    to defaults, missing/unknown columns are 400s, never 500s."""
    status, err = _get(server, "/browse")
    assert status == 400
    status, err = _get(server, "/browse?col=definitely_not_a_column")
    assert status == 400 and "not a stored column" in err["error"]
    status, feed = _get(server, "/browse?col=role&sections=banana&seed=pear")
    assert status == 200 and len(feed["groups"]) <= 5  # defaults kick in
    status, feed = _get(server, "/browse?col=role&value=user&page=zzz&limit=-4")
    assert status == 200 and feed["page"] == 1 and feed["limit"] >= 1
    status, err = _get(server, "/hierarchy?col=nope&prefix=x")
    assert status == 400
    status, feed = _get(server, "/hierarchy?prefix=zzz-no-such-prefix")
    assert status == 200 and feed["total"] == 0  # leaf with no docs
    status, feed = _get(server, "/values?col=tool")
    assert status == 200  # nullable column: NULL group allowed


def test_hierarchy_nonstring_column_leaf(server, transcripts_table):
    """Navigation over a NON-string id column must not 500: prefix_children
    casts to string, and the leaf resolves raw values type-safely."""
    status, feed = _get(server, "/hierarchy?col=turn_idx&prefix=3")
    assert status == 200
    exp = sum(1 for t in transcripts_table["turn_idx"].to_pylist() if str(t).startswith("3"))
    assert feed["total"] == exp > 0
    assert all(r["turn_idx"] == 3 for r in feed["results"])
    status, feed = _get(server, "/hierarchy?col=turn_idx&prefix=9")
    assert status == 200 and feed["total"] == 0  # no such value, still 200


def test_browse_numeric_string_value_roundtrip(server):
    """The sections feed's own links must be servable: a browse value that
    LOOKS numeric stays a string for string columns (no blind int coercion)."""
    status, feed = _get(server, "/browse?col=role&value=123")
    assert status == 200 and feed["total"] == 0  # string compare, no kernel error
    status, feed = _get(server, "/browse?col=turn_idx&value=3&limit=5")
    assert status == 200 and feed["total"] > 0  # numeric column coerces


def test_hierarchy_exact_node_docs_reachable(ray_session, tmp_path):
    """Variable-length vocabularies: a node with children AND its own docs
    (values '3' and '30') must surface the exact-value docs via the
    'docs at this node' entry — child counts + exact count == parent count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import (
        DOCUMENTS_SPEC, FullTextSearchEngine, build_index)
    from project_gutenberg_full_text_search_ray.pipelines.http_api import SearchAPI

    t = pa.table({
        "doc_id": list(range(8)),
        "text": [f"doc body {i} words here" for i in range(8)],
        "lang": ["en"] * 8,
        "source": ["3", "3", "30", "30", "30", "31", "4", "40"],
        "n_chars": [10] * 8,
    })
    src = str(tmp_path / "var.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "var_idx")
    build_index(src, DOCUMENTS_SPEC, idx, docs_per_segment=4)
    api = SearchAPI(FullTextSearchEngine(idx))

    status, feed = api.handle("/hierarchy", {"col": "source", "prefix": "3"})
    assert status == 200
    titles = [n["title"] for n in feed["navigation"]]
    assert titles[0] == "3 (2 docs at this node)"      # exact-value docs
    assert "30 (3 docs)" in titles and "31 (1 docs)" in titles
    # parent level advertised 3 -> 6 docs; 2 exact + 3 + 1 children == 6
    status, top = api.handle("/hierarchy", {"col": "source", "prefix": ""})
    t3 = [n for n in top["navigation"] if n["title"].startswith("3 (")][0]
    assert t3["title"] == "3 (6 docs)"
    # exact docs page
    status, docs = api.handle("/hierarchy",
                              {"col": "source", "prefix": "3", "exact": "1"})
    assert status == 200 and docs["total"] == 2
    assert {r["doc_id"] for r in docs["results"]} == {0, 1}


def test_browse_numeric_column_bad_value_is_400(server):
    status, err = _get(server, "/browse?col=turn_idx&value=banana")
    assert status == 400 and "not valid for numeric column" in err["error"]


def test_values_endpoint_truncation(server):
    """Corpus-scaled vocabularies (id columns) must not serialize whole:
    the response caps at ?limit= and flags truncation."""
    status, feed = _get(server, "/values?col=conv_id&limit=5")
    assert status == 200 and feed["truncated"] and len(feed["values"]) == 5
    assert feed["n_distinct"] == 200
    status, feed = _get(server, "/values?col=role")
    assert status == 200 and not feed["truncated"]


def test_prefix_hierarchy_variable_length_values(ray_session, tmp_path):
    """Variable-length vocabularies (the reference's LoCC tree shape, values
    like '3'/'30'/'300'): node '3' has children AND its own docs —
    prefix_exact_count catches the exact-'3' rows, children counts include
    every deeper extension, has_children flags the next level, NULL values
    never surface.  Exercises the r4 prefix-scoped combiner pass (including
    the parquet [prefix, next-prefix) pushdown) end to end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import CorpusSpec, FullTextSearchEngine, build_index

    t = pa.table({
        "doc_id": pa.array(list(range(8)), type=pa.int64()),
        "text": pa.array([f"w{i}" for i in range(8)], type=pa.string()),
        "code": pa.array(["3", "3", "30", "300", "300", "31", "4", None],
                         type=pa.string()),
    })
    src = str(tmp_path / "codes.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, CorpusSpec(("doc_id",), "text", ("code",), "codes"), idx,
                docs_per_segment=3)
    eng = FullTextSearchEngine(idx)

    assert eng.prefix_exact_count("code", "3") == 2      # the node's own docs
    ch = eng.prefix_children("code", "3", depth=1)
    rows = list(zip(ch["child"].to_pylist(), ch["n"].to_pylist(),
                    ch["has_children"].to_pylist()))
    # '30' subtree holds 30,300,300 (3 docs, deeper values exist); '31' leaf
    assert rows == [("30", 3, True), ("31", 1, False)]
    ch2 = eng.prefix_children("code", "30", depth=1)
    assert list(zip(ch2["child"].to_pylist(), ch2["n"].to_pylist(),
                    ch2["has_children"].to_pylist())) == [("300", 2, False)]
    # root level: NULL code never surfaces; counts conserve (7 non-null)
    root = eng.prefix_children("code", "", depth=1)
    assert root["child"].to_pylist() == ["3", "4"]
    assert sum(root["n"].to_pylist()) == 7
    assert eng.prefix_exact_count("code", "") == 0


def test_ts_stat_endpoint(server, engine):
    status, body = _get(server, "/ts_stat?limit=5")
    assert status == 200
    assert len(body["stats"]) == 5
    rows = [(s["nentry"], s["ndoc"]) for s in body["stats"]]
    assert rows == sorted(rows, reverse=True)
    # parity with the engine surface
    t = engine.ts_stat(5)
    assert [s["word"] for s in body["stats"]] == t["word"].to_pylist()
    # discoverable from the root feed
    _, feed = _get(server, "/")
    assert any(link["rel"] == "ts_stat" for link in feed["links"])
