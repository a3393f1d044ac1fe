"""Randomized (seeded) query fuzzing vs the brute-force oracle — hundreds of
generated query/filter/ordering/pagination combinations must all be
rank-identical.  Deterministic RNG so failures reproduce."""

import numpy as np
import pytest

from project_gutenberg_full_text_search_ray import RANDOM, RELEVANCE, FilterSpec

VOCAB = ["the", "and", "of", "to", "a", "in"] + [f"w{k:05d}" for k in range(0, 40)]
PHRASES = ['"to be or not to be"', '"quick brown fox"', '"ray data streaming"']


def _gen_query(rng) -> str:
    parts = []
    for _ in range(rng.integers(1, 4)):
        r = rng.random()
        if r < 0.15:
            parts.append(PHRASES[rng.integers(0, len(PHRASES))])
        elif r < 0.30:
            parts.append("-" + VOCAB[rng.integers(0, len(VOCAB))])
        elif r < 0.45:
            parts.append("or")
        else:
            parts.append(VOCAB[rng.integers(0, len(VOCAB))])
    return " ".join(parts)


def _gen_filters(rng):
    out = []
    if rng.random() < 0.4:
        out.append(("role", "==", ["user", "assistant", "tool", "system"][rng.integers(0, 4)]))
    if rng.random() < 0.3:
        lo = int(rng.integers(0, 6))
        out.append(("turn_idx", "between", (lo, lo + int(rng.integers(1, 4)))))
    if rng.random() < 0.2:
        out.append(("tool", "isnull", None))
    if rng.random() < 0.2:
        # mixed-case substr: engine kernel is ILIKE (match_substring
        # ignore_case) and the oracle must agree
        out.append(("role", "substr", ["SsIs", "ser", "OOL", "yst"][rng.integers(0, 4)]))
    if rng.random() < 0.2:
        out.append(("conv_id", "startswith", f"conv-0000000{int(rng.integers(0, 10))}"))
    if rng.random() < 0.2:
        pool = ["user", "assistant", "tool", "system"]
        k = int(rng.integers(1, 4))
        vals = [pool[j] for j in rng.choice(len(pool), size=k, replace=False)]
        out.append(("role", "in" if rng.random() < 0.5 else "not_in", vals))
    if rng.random() < 0.15:
        # list-valued op on the timestamp column (µs ints vs datetime col)
        lo = 1767225600000000 + int(rng.integers(0, 3)) * 86_400_000_000
        out.append(("ts", "between", (lo, lo + 2 * 86_400_000_000)))
    return out


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_queries_rank_identical(engine, oracle, seed):
    rng = np.random.default_rng(1000 + seed)
    for i in range(25):
        qtext = _gen_query(rng)
        filters = _gen_filters(rng)
        page = int(rng.integers(1, 4))
        size = int(rng.integers(5, 40))
        order_pick = rng.random()

        q = engine.query().search(qtext)
        for f in filters:
            q = q.where(FilterSpec(*f))
        if order_pick < 0.6:
            q = q.order_by(RELEVANCE)
            order = ("score",)
        elif order_pick < 0.8:
            q = q.order_by("ts", descending=bool(rng.integers(0, 2)))
            order = ("column", "ts", q.order.descending)
        else:
            q = q.order_by(RANDOM, seed=int(rng.integers(0, 100)))
            order = ("random", q.order.seed)
        q = q[page, size]

        res = engine.execute(q)
        exp = oracle.search([qtext] if qtext.strip() else None, filters=filters,
                            order=order, page=page, page_size=size)
        ctx = f"seed={seed} i={i} q={qtext!r} f={filters} o={order} p={page}/{size}"
        assert res.total == exp.total, ctx
        got = list(zip(res.table["conv_id"].to_pylist(), res.table["turn_idx"].to_pylist()))
        assert got == [(r["conv_id"], r["turn_idx"]) for r in exp.rows], ctx
        if order[0] == "score" and res.table.num_rows:
            assert res.table["score"].to_pylist() == pytest.approx(
                [r["score"] for r in exp.rows], rel=1e-12, abs=1e-12
            ), ctx


def test_fuzz_multiseg_ray_path(engine_multi, oracle):
    """Same fuzzing through the multi-segment ray fan-out (MaxScore + zone
    maps + merge all active)."""
    rng = np.random.default_rng(4242)
    for i in range(18):
        qtext = _gen_query(rng)
        filters = _gen_filters(rng)
        size = int(rng.integers(5, 30))
        q = engine_multi.query().search(qtext)
        for f in filters:
            q = q.where(FilterSpec(*f))
        q = q.order_by(RELEVANCE)[1, size]
        res = engine_multi.execute(q)
        exp = oracle.search([qtext], filters=filters, page_size=size)
        ctx = f"i={i} q={qtext!r} f={filters} size={size}"
        assert res.total == exp.total, ctx
        got = list(zip(res.table["conv_id"].to_pylist(), res.table["turn_idx"].to_pylist()))
        assert got == [(r["conv_id"], r["turn_idx"]) for r in exp.rows], ctx


def test_fuzz_count_matches_execute_total(engine, oracle):
    """count(q) must equal execute(q).total for fuzzed query+filter combos
    (the count path plans k=1 — totals must not depend on k)."""
    rng = np.random.default_rng(777)
    for i in range(20):
        qtext = _gen_query(rng)
        filters = _gen_filters(rng)
        q = engine.query().search(qtext)
        for f in filters:
            q = q.where(FilterSpec(*f))
        exp = oracle.search([qtext], filters=filters, page_size=10)
        ctx = f"i={i} q={qtext!r} f={filters}"
        assert engine.count(q) == exp.total, ctx
