"""Conformance sweep vs the brute-force oracle — the analog of the reference's
query sweep (/root/reference/search/test.py) turned into rank-identity
assertions (SURVEY.md §5): top-k doc ids identical, scores approx-equal,
totals exact, across FTS shapes, filters, orderings, pagination, crosswalks.
"""

import pyarrow as pa
import pytest

from project_gutenberg_full_text_search_ray import RANDOM, RELEVANCE, Crosswalk, FilterSpec


def run_both(engine, oracle, *, texts=None, filters=None, order=("score",), page=1, size=28):
    q = engine.query()
    for t in texts or []:
        q = q.search(t)
    for f in filters or []:
        q = q.where(FilterSpec(*f))
    if order[0] == "score":
        q = q.order_by(RELEVANCE)
    elif order[0] == "random":
        q = q.order_by(RANDOM, seed=order[1])
    else:
        q = q.order_by(order[1], descending=order[2])
    q = q[page, size]
    res = engine.execute(q)
    exp = oracle.search(query_texts=texts, filters=filters, order=order, page=page, page_size=size)
    return res, exp


def assert_match(res, exp, id_cols=("conv_id", "turn_idx"), check_scores=True):
    assert res.total == exp.total
    got_ids = list(zip(*[res.table[c].to_pylist() for c in id_cols])) if res.table.num_rows else []
    exp_ids = [tuple(r[c] for c in id_cols) for r in exp.rows]
    assert got_ids == exp_ids
    if check_scores and res.table.num_rows:
        got_scores = res.table["score"].to_pylist()
        exp_scores = [r["score"] for r in exp.rows]
        assert got_scores == pytest.approx(exp_scores, rel=1e-12, abs=1e-12)


# ---- FTS shapes (reference test.py:49-55; syntax README.md:149-164)
FTS_QUERIES = [
    ["the"],
    ["w00001"],
    ["w00001 w00002"],              # implicit AND
    ["w00001 or w00002"],           # OR
    ["the -w00001"],                # NOT
    ['"to be or not to be"'],       # planted phrase
    ['"quick brown fox"'],
    ["w00003 or w00004 -w00001"],
    ["the quick or w00007"],
    ["zzz_nonexistent_term"],       # no hits
    ["w00001 zzz_nonexistent_term"],  # AND with empty leg
    ['"the quick" w00002 or w00005'],
    # tsquery FOLLOWED-BY distance (<N>; <-> == <1>): the planted phrases
    # pin exact-distance semantics — 'quick brown fox' matches at <2>,
    # must NOT match at <3>; '<->' is rank-identical to the quoted phrase
    ["quick <2> fox"],
    ["quick <3> fox"],              # wrong distance — no hits
    ["to <3> not"],                 # 'to be or not' — distance 3
    ["the <-> quick or w00005"],
]


@pytest.mark.parametrize("texts", FTS_QUERIES, ids=[str(t) for t in FTS_QUERIES])
def test_fts_rank_identity(engine, oracle, texts):
    res, exp = run_both(engine, oracle, texts=texts, size=25)
    assert_match(res, exp)


def test_multi_search_clauses_and(engine, oracle):
    # chained .search() calls AND (reference build() :302, test.py:168-185)
    res, exp = run_both(engine, oracle, texts=["the", "w00002 or w00003"], size=25)
    assert_match(res, exp)


# ---- filters (F1–F16 analogs, reference test.py:119-162)
FILTER_CASES = [
    ([("role", "==", "user")], ["the"]),
    ([("role", "!=", "assistant")], ["the"]),
    ([("role", "in", ["user", "tool"])], ["w00001"]),
    ([("turn_idx", ">=", 4)], ["the"]),
    ([("turn_idx", "between", (2, 5))], ["w00002"]),
    ([("tool", "isnull", None)], ["the"]),
    ([("tool", "notnull", None)], ["the"]),
    ([("tool", "==", "bash")], None),
    ([("conv_id", "==", "conv-00000000")], None),
    ([("conv_id", "startswith", "conv-0000001")], None),
    ([("ts", ">=", 1767312000000000)], ["the"]),  # 2026-01-02
    # list-valued ops on a timestamp column (oracle must coerce like scalars)
    ([("ts", "between", (1767312000000000, 1767571200000000))], ["the"]),
    ([("role", "==", "user"), ("turn_idx", "<=", 3), ("tool", "isnull", None)], ["the"]),
    # mixed-case substr: engine kernel is ILIKE (ignore_case=True)
    ([("role", "substr", "SSIST")], ["the"]),
]


@pytest.mark.parametrize("filters,texts", FILTER_CASES, ids=[str(f) for f, _ in FILTER_CASES])
def test_filters(engine, oracle, filters, texts):
    # normalize filter tuples: ops without value use None placeholder
    fspecs = [(c, op, v) for (c, op, v) in filters]
    res, exp = run_both(engine, oracle, texts=texts, filters=fspecs, size=30)
    assert_match(res, exp, check_scores=texts is not None)


def test_field_scoped_search(engine, oracle):
    # field-scoped search == search + scope-column equality (SURVEY §2.2 P1 map)
    q = engine.query().search("the", field_filter=("role", "assistant"))[1, 20]
    res = engine.execute(q)
    exp = oracle.search(["the"], filters=[("role", "==", "assistant")], page_size=20)
    assert_match(res, exp)


# ---- orderings (O1–O3, reference test.py:203-215)
ORDERINGS = [
    ("column", "ts", True),
    ("column", "ts", False),
    ("column", "turn_idx", True),
    ("column", "tool", False),   # has NULLs → NULLS LAST both directions
    ("column", "dl", True),
    ("random", 7),
    ("random", 42),
]


@pytest.mark.parametrize("order", ORDERINGS, ids=[str(o) for o in ORDERINGS])
def test_orderings(engine, oracle, order):
    res, exp = run_both(engine, oracle, texts=["the"], order=order, size=30)
    assert_match(res, exp, check_scores=False)


def test_order_by_column_no_search(engine, oracle):
    res, exp = run_both(engine, oracle, order=("column", "ts", False), size=30)
    assert_match(res, exp, check_scores=False)


# ---- pagination (O4, reference test.py:278-280, clamps :369-372)
@pytest.mark.parametrize("page", [1, 2, 3, 9999])
def test_pagination(engine, oracle, page):
    res, exp = run_both(engine, oracle, texts=["the"], page=page, size=10)
    assert_match(res, exp)
    assert res.page == min(page, max(1, -(-exp.total // 10)))


def test_page_size_clamped_to_100(engine):
    q = engine.query()[1, 5000]
    assert q.page_size == 100


# ---- count-only (A1, reference test.py:286-289)
def test_count_only(engine, oracle):
    q = engine.query().search("the")
    exp = oracle.search(["the"])
    assert engine.count(q) == exp.total


def test_count_zero(engine):
    assert engine.count(engine.query().search("zzz_nonexistent_term")) == 0


# ---- crosswalks (C1–C5, reference test.py:244-272, 297-310)
def test_crosswalk_full_shape(engine):
    r = engine.execute(engine.query(Crosswalk.FULL).search("the")[1, 3])
    assert set(r.table.column_names) == {"conv_id", "turn_idx", "role", "tool", "ts", "dl", "score"}


def test_crosswalk_mini_shape(engine):
    r = engine.execute(engine.query(Crosswalk.MINI).search("the")[1, 3])
    assert r.table.column_names == ["id0", "id1", "score"]


def test_crosswalk_nested_shape(engine):
    r = engine.execute(engine.query(Crosswalk.NESTED).search("the")[1, 3])
    assert "payload" in r.table.column_names
    payload_type = r.table.schema.field("payload").type
    assert pa.types.is_struct(payload_type)


def test_crosswalk_custom(engine):
    def upper_role(t: pa.Table, spec) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"conv": t["conv_id"], "ROLE": pc.utf8_upper(t["role"])})

    engine.set_custom_transformer(upper_role)
    r = engine.execute(engine.query(Crosswalk.CUSTOM).search("the")[1, 3])
    assert r.table.column_names == ["conv", "ROLE"]
    assert all(s == s.upper() for s in r.table["ROLE"].to_pylist())


def test_maxscore_equals_exhaustive(engine):
    """MaxScore pruning must be invisible: identical (ords, scores) to
    exhaustive scoring for a spread of query shapes and k values."""
    import numpy as np

    from project_gutenberg_full_text_search_ray.stages.segment_search import (
        evaluate_query,
        load_postings,
        score_docs,
        topk_maxscore,
    )
    import pyarrow.parquet as pq

    sd = engine.seg_dirs[engine.seg_ids[0]]
    docs = pq.read_table(f"{sd}/docs.parquet")
    dl = docs["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
    for qs in ["the", "the w00001 or w00002 w00003", "w00001 or the or w00005", "w00042"]:
        q = engine.query().search(qs)
        plan = engine.build_plan(q, 10)
        terms = sorted({t for p in plan.queries for t in p.all_terms()})
        postings = load_postings(f"{sd}/postings.parquet", terms)
        matched = evaluate_query(postings, plan.queries[0], docs.num_rows)
        pos = [t for p in plan.queries for t in p.positive_terms()]
        for k in (1, 5, 50):
            sel, sc = topk_maxscore(postings, matched, pos, plan.idf, dl, plan.avgdl, k)
            full = score_docs(postings, matched, pos, plan.idf, dl, plan.avgdl)
            order = np.lexsort((matched, -full))[:k]
            assert np.array_equal(sel, matched[order]), qs
            assert np.array_equal(sc, full[order]), qs


def test_segment_pruning_point_lookup(engine, oracle):
    """F1 point lookup prunes to a single segment on an id-clustered corpus
    — and still returns exactly the oracle's rows."""
    pruned = engine.prune_segments([FilterSpec("conv_id", "==", "conv-00000005")])
    assert len(pruned) <= max(1, len(engine.seg_ids) // 2)
    res, exp = run_both(engine, oracle, filters=[("conv_id", "==", "conv-00000005")],
                        order=("column", "turn_idx", False), size=30)
    assert_match(res, exp, check_scores=False)
    # fully-out-of-range lookup: prunes everything, returns empty
    assert engine.prune_segments([FilterSpec("conv_id", "==", "zzz")]) == []
    r = engine.execute(engine.query().eq("conv_id", "zzz")[1, 10])
    assert r.total == 0
