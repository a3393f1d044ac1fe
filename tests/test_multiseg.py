"""Multi-segment engine: the distributed fan-out merge path and the warmed
actor-pool service must both be rank-identical to the oracle."""

import pytest

from project_gutenberg_full_text_search_ray import RELEVANCE, FilterSpec

CASES = [
    (["the"], None),
    (['"to be or not to be"'], None),
    (["w00001 or w00002"], None),
    (["the -w00001"], None),
    (["the"], [("role", "==", "user")]),
    (["w00002 w00003"], None),
]


@pytest.mark.parametrize("texts,filters", CASES, ids=[str(c[0]) for c in CASES])
def test_ray_fanout_rank_identity(engine_multi, oracle, texts, filters):
    q = engine_multi.query()
    for t in texts:
        q = q.search(t)
    for f in filters or []:
        q = q.where(FilterSpec(*f))
    q = q.order_by(RELEVANCE)[1, 25]
    res = engine_multi.execute(q)
    exp = oracle.search(texts, filters=filters, page_size=25)
    assert res.total == exp.total
    got = list(zip(res.table["conv_id"].to_pylist(), res.table["turn_idx"].to_pylist()))
    assert got == [(r["conv_id"], r["turn_idx"]) for r in exp.rows]
    assert res.table["score"].to_pylist() == pytest.approx(
        [r["score"] for r in exp.rows], rel=1e-12, abs=1e-12
    )


def test_search_service_matches_engine(engine_multi, oracle):
    from project_gutenberg_full_text_search_ray.pipelines.serving import SearchService

    svc = SearchService(engine_multi, n_workers=3)
    try:
        for qs in ["the quick brown fox", '"to be or not to be"', "w00001 or w00002 -the"]:
            q1 = engine_multi.query().search(qs)[1, 20]
            r_engine = engine_multi.execute(q1)
            r_svc = svc.execute(engine_multi.query().search(qs)[1, 20])
            assert r_svc.total == r_engine.total
            assert r_svc.table.equals(r_engine.table)
            assert svc.count(engine_multi.query().search(qs)) == r_engine.total
    finally:
        svc.shutdown()
