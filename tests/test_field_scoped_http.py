"""Conformance tests for the review-fix batch: field-scoped fuzzy/contains
through the HTTP facade, ILIKE case-insensitivity, and routing of patterns
the single-token index can't represent.

Regressions covered (all previously failing):
  * contains_<field_col> raised HTTP 500 (FilterSpec on a column the doc
    store never materializes);
  * field-scoped fuzzy re-parsed expansions through the query language —
    a dictionary term 'or' was consumed as the OR operator;
  * contains verify / full scan and the meta-column substr filter were
    case-SENSITIVE while the reference is ILIKE;
  * a punctuated single token ('foo-bar') was routed to the indexed
    single-token path, which can never match it;
  * parse_pagination discarded a valid page when the limit was invalid.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from project_gutenberg_full_text_search_ray.pipelines.http_api import (
    SearchAPI, parse_pagination)


@pytest.fixture(scope="module")
def fielded(ray_session, tmp_path_factory):
    """Engine over a MIXED-CASE corpus with an indexed 'title' field whose
    vocabulary is disjoint from the body's in places ('report' only ever
    appears in titles) — exercises the field-keyspace expansion paths."""
    from project_gutenberg_full_text_search_ray import FullTextSearchEngine, build_index
    from project_gutenberg_full_text_search_ray.corpus import CorpusSpec

    rows = [
        {"doc_id": 0, "body": "Quick Brown Fox jumps high", "title": "Alpha Report"},
        {"doc_id": 1, "body": "quick brown cow grazes", "title": "summary notes"},
        {"doc_id": 2, "body": "foo-bar baz qux", "title": "Report Data"},
        {"doc_id": 3, "body": "orange orchard grows", "title": "ore and or data"},
        {"doc_id": 4, "body": "plain words only here", "title": "beta report data"},
    ]
    t = pa.table({k: [r[k] for r in rows] for k in ("doc_id", "body", "title")})
    d = tmp_path_factory.mktemp("fielded_http")
    src = str(d / "docs.parquet")
    pq.write_table(t, src)
    spec = CorpusSpec(("doc_id",), "body", (), "fielded", field_cols=("title",))
    idx = str(d / "idx")
    build_index(src, spec, idx, docs_per_segment=2)
    eng = FullTextSearchEngine(idx)
    return eng, SearchAPI(eng)


def _ids(feed):
    return sorted(r["doc_id"] for r in feed["results"])


def test_contains_field_col_single_token(fielded):
    """contains_<field_col>, single-token: indexed path over the FIELD's own
    keyspace ('report' never occurs in any body), case-insensitive."""
    eng, api = fielded
    status, feed = api.handle("/search", {"field": "contains_title", "query": "report"})
    assert status == 200
    assert _ids(feed) == [0, 2, 4]          # incl. capitalized 'Report' titles


def test_contains_field_col_multi_token(fielded):
    """contains_<field_col>, multi-token: phrase candidates in the field
    keyspace, literal verify against the title column of the source."""
    eng, api = fielded
    status, feed = api.handle("/search", {"field": "contains_title", "query": "report data"})
    assert status == 200
    assert _ids(feed) == [2, 4]             # 'Report Data' + 'beta report data'
    # substring crossing a token boundary mid-word: 'ta' edge fragments
    status2, feed2 = api.handle("/search", {"field": "contains_title", "query": "t data"})
    assert status2 == 200
    assert _ids(feed2) == [2, 4]            # 'Report Data', 'report data'


def test_fuzzy_field_scoped_and_or_collision(fielded):
    """fuzzy_<field_col>: expansions run as field-scoped posting keys; a
    dictionary term 'or' (query-language operator) must survive as a term."""
    eng, api = fielded
    status, feed = api.handle("/search", {"field": "fuzzy_title", "query": "reprot"})
    assert status == 200
    assert _ids(feed) == [0, 2, 4]          # 'reprot' ~ 'report' (title-scoped)
    # 'ore' expands to {'ore','or'} in the title keyspace; doc 3's title has
    # both — the 'or' expansion must match as a TERM, not parse as OR
    status2, feed2 = api.handle("/search", {"field": "fuzzy_title", "query": "ore"})
    assert status2 == 200
    assert 3 in _ids(feed2)


def test_contains_whole_doc_case_insensitive(fielded):
    """ILIKE parity: multi-word contains matches capitalized source text."""
    eng, api = fielded
    status, feed = api.handle("/search", {"query": "quick brown", "field": "contains_keyword"})
    assert status == 200
    assert _ids(feed) == [0, 1]             # 'Quick Brown' + 'quick brown'
    # and the query side may be capitalized too
    status2, feed2 = api.handle("/search", {"query": "QUICK BROWN", "field": "contains_keyword"})
    assert status2 == 200
    assert _ids(feed2) == [0, 1]


def test_contains_punctuated_single_token_routes_to_multi(fielded):
    """'foo-bar' tokenizes to two terms — must route through contains_multi
    (phrase candidates + literal verify), not the single-token index."""
    eng, api = fielded
    status, feed = api.handle("/search", {"query": "foo-bar", "field": "contains_keyword"})
    assert status == 200
    assert _ids(feed) == [2]
    assert not SearchAPI._single_token_indexable(eng, "foo-bar")
    assert SearchAPI._single_token_indexable(eng, "Fox")


def test_meta_col_substr_filter_case_insensitive(engine):
    """contains_<meta col> (stored column substr filter) is ILIKE: pattern
    case must not matter."""
    lo = engine.execute(engine.query().contains("role", "assist")[1, 100])
    hi = engine.execute(engine.query().contains("role", "ASSIST")[1, 100])
    assert hi.total == lo.total > 0


def test_parse_pagination_independent_params():
    assert parse_pagination(3, "abc") == (3, 28)
    assert parse_pagination("abc", 7) == (1, 7)


def test_cli_multiword_contains_and_fuzzy(fielded, tmp_path, monkeypatch, capsys):
    """CLI routing parity with the HTTP facade: multi-word contains verifies
    literally (not silent 0), multi-word fuzzy expands per word."""
    import json

    from project_gutenberg_full_text_search_ray import cli

    eng, _ = fielded
    rc = cli.main(["search", eng.index_dir, "quick brown", "--type", "contains"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total"] == 2
    rc2 = cli.main(["search", eng.index_dir, "quick brown", "--type", "contains",
                    "--count-only"])
    assert rc2 == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["total"] == 2
    rc3 = cli.main(["search", eng.index_dir, "qick brwn", "--type", "fuzzy"])
    assert rc3 == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["total"] >= 2                # per-word expansion finds quick+brown
