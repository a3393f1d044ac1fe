"""BM25 scoring math — the single source of truth for ranking.

Replaces the reference's ``ts_rank_cd(tsvec, query) DESC`` ordering
(/root/reference/search/full_text_search.py:275-295) with classic BM25 per the
north star.  Every implementation (segment searcher, brute-force pytest
oracle, DuckDB oracle SQL) uses EXACTLY this formula so top-k is
rank-identical:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,q)  = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

with k1 = 1.2, b = 0.75, fp64 throughout, summation over the query's unique
positive terms in sorted-term order (fixed order ⇒ reproducible fp sums).
Tie-break is always (score DESC, doc identity ASC) — the reference's
``downloads DESC`` secondary (full_text_search.py:277-279) becomes an explicit
total order on doc identity.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75
SCORE_SCALE = 10_000  # driver-facing scores are floor(score*1e4 + 0.5) BIGINTs


def idf(n_docs: float, df: float) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """The idf-independent factor tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) (fp64)."""
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    denom = tf + K1 * (1.0 - B + B * (dl / avgdl))
    return tf * (K1 + 1.0) / denom


def scale_scores(scores: np.ndarray) -> np.ndarray:
    """fp64 score → BIGINT at 1e-4 resolution (identical op in oracle SQL:
    CAST(floor(score*10000 + 0.5) AS BIGINT))."""
    return np.floor(scores * SCORE_SCALE + 0.5).astype(np.int64)


def bm25_sql_expr(tf: str, df: str, dl: str, n: str, avgdl: str) -> str:
    """DuckDB SQL expression for one term's BM25 contribution (same formula)."""
    return (
        f"ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
        f"({tf} * ({K1} + 1)) / ({tf} + {K1} * (1 - {B} + {B} * {dl} / {avgdl}))"
    )
