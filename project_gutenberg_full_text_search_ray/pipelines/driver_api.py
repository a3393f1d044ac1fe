"""Driver-contract queries: Ray pipelines + matching DuckDB oracle SQL.

Each public query function takes ``sf_dir`` (a testdata directory) and returns
a ``pyarrow.Table`` whose column NAMES and VALUES exactly match the paired SQL
in ``ORACLE_SQL`` (run by the driver on the same parquet, SURVEY.md §5).

Determinism rules shared by both sides:
  * scores are emitted as BIGINT ``floor(score * 10000 + 0.5)`` (fp64 noise at
    the 1e-12 level cannot flip a 1e-4-resolution integer except on exact
    boundaries);
  * every ORDER BY ends with the doc identity, so LIMIT cuts identically;
  * the same analyzer-v1 tokenizer on both sides (regexp split, see
    functions/analyzer.py).

Indexes built by these functions are cached under /tmp keyed by the input
fingerprint — re-entry skips the build via the lineage manifests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..corpus import DOCUMENTS_SPEC
from ..crosswalks import Crosswalk
from ..functions.analyzer import TOKEN_SPLIT_PATTERN
from ..functions.bm25 import B, K1, SCORE_SCALE
from ..pipelines.build import build_index
from ..pipelines.search import RANDOM, FullTextSearchEngine
from ..stages.segment_search import FilterSpec
from ..state.manifest import parquet_input_fingerprint

INDEX_CACHE_ROOT = "/tmp/pgfts_indices"
_ENGINES: dict[str, FullTextSearchEngine] = {}


def ensure_documents_index(sf_dir: str) -> FullTextSearchEngine:
    """Build-or-reuse the inverted index over ``{sf_dir}/documents.parquet``."""
    path = os.path.join(sf_dir, "documents.parquet")
    fp = parquet_input_fingerprint([path])
    index_dir = os.path.join(INDEX_CACHE_ROOT, f"documents_{fp}")
    eng = _ENGINES.get(index_dir)
    if eng is None:
        build_index(path, DOCUMENTS_SPEC, index_dir, docs_per_segment=4096)
        eng = FullTextSearchEngine(index_dir)
        _ENGINES[index_dir] = eng
    return eng


def _scaled(scores: pa.Array | list[float]) -> pa.Array:
    arr = np.asarray(scores, dtype=np.float64)
    return pa.array(np.floor(arr * SCORE_SCALE + 0.5).astype(np.int64))


def _topk(sf_dir: str, *, text: str | None = None, texts: list[str] | None = None,
          filters: list[FilterSpec] | None = None, k: int = 20, offset: int = 0) -> pa.Table:
    eng = ensure_documents_index(sf_dir)
    q = eng.query()
    for t in texts if texts is not None else ([text] if text else []):
        q = q.search(t)
    for f in filters or []:
        q = q.where(f)
    top = eng.top_docs(q, offset + k).slice(offset, k)
    return pa.table({"doc_id": top["doc_id"], "score": _scaled(top["score"].to_pylist())})


# --------------------------------------------------------------------------
# SQL building blocks (DuckDB dialect, pre-registered view ``documents``)
# --------------------------------------------------------------------------
_TOK = (
    "tok AS (SELECT doc_id, t.term AS term FROM documents, "
    f"UNNEST(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_PATTERN}')) AS t(term) "
    "WHERE t.term <> '')"
)
_DL = "dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id)"
_STATS = (
    "stats AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n, "
    "(SELECT CAST(COALESCE(sum(dl),0) AS DOUBLE) FROM dl) / "
    "(SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl)"
)


def _terms_sql(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def _bm25_cte(terms: list[str]) -> str:
    tl = _terms_sql(terms)
    return (
        f"WITH {_TOK}, {_DL}, {_STATS}, "
        f"tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok "
        f"WHERE term IN ({tl}) GROUP BY doc_id, term), "
        f"df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok "
        f"WHERE term IN ({tl}) GROUP BY term), "
        f"scored AS (SELECT tf.doc_id, "
        f"sum(ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5)) * (tf.tf * ({K1} + 1)) / "
        f"(tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS score_raw, "
        f"count(DISTINCT tf.term) AS nmatched "
        f"FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN stats "
        f"GROUP BY tf.doc_id)"
    )


def _bm25_select(where: str = "", k: int = 20, offset: int = 0) -> str:
    return (
        f" SELECT doc_id, CAST(floor(score_raw * {SCORE_SCALE} + 0.5) AS BIGINT) AS score "
        f"FROM scored {where} ORDER BY score_raw DESC, doc_id LIMIT {k} OFFSET {offset}"
    )


# --------------------------------------------------------------------------
# Search queries (P1/P4/P6, O1/O4, A1 analogs) over the documents corpus
# --------------------------------------------------------------------------
def q_fts_term(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table")


def q_fts_and(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table scan")


def q_fts_or(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table or vector")


def q_fts_not(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table -vector")


def q_fts_phrase(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text='"table scan"')


def q_fts_multi_clause(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, texts=["table", "row or value"])


def q_fts_filter_lang(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table", filters=[FilterSpec("lang", "==", "en")])


def q_fts_filter_nchars(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table", filters=[FilterSpec("n_chars", "between", (200, 400))])


def q_fts_filter_combo(sf_dir: str) -> pa.Table:
    return _topk(
        sf_dir,
        text="table",
        filters=[FilterSpec("lang", "in", ["en", "de"]), FilterSpec("n_chars", ">=", 150)],
    )


def q_fts_ids_in(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table", filters=[FilterSpec("doc_id", "in", list(range(0, 200, 3)))])


def q_fts_pagination(sf_dir: str) -> pa.Table:
    return _topk(sf_dir, text="table", k=10, offset=10)


def q_count_matches(sf_dir: str) -> pa.Table:
    eng = ensure_documents_index(sf_dir)
    q = eng.query().search("table scan")
    return pa.table({"total": pa.array([eng.count(q)], type=pa.int64())})


def q_order_by_nchars(sf_dir: str) -> pa.Table:
    eng = ensure_documents_index(sf_dir)
    q = eng.query().where(FilterSpec("lang", "==", "en")).order_by("n_chars", descending=True)
    top = eng.top_docs(q, 50)
    return pa.table({"doc_id": top["doc_id"], "n_chars": top["n_chars"]})


def q_order_random(sf_dir: str) -> pa.Table:
    eng = ensure_documents_index(sf_dir)
    q = eng.query().where(FilterSpec("source", "==", "src2")).order_by(RANDOM, seed=42)
    top = eng.top_docs(q, 20)
    return pa.table({"doc_id": top["doc_id"]})


def q_facet_top_sources(sf_dir: str) -> pa.Table:
    """A7 analog: facet over the top-100 matched docs (explicitly approximate
    by sample cap, like reference full_text_search.py:446-494)."""
    eng = ensure_documents_index(sf_dir)
    top = eng.top_docs(eng.query().search("table"), 100)
    agg = top.group_by("source").aggregate([("doc_id", "count")])
    agg = agg.rename_columns(["source", "n"])
    idx = pc.sort_indices(agg, sort_keys=[("n", "descending"), ("source", "ascending")])
    out = agg.take(idx).slice(0, 5)
    return pa.table({"source": out["source"], "n": out["n"].cast(pa.int64())})


def q_crosswalk_mini(sf_dir: str) -> pa.Table:
    eng = ensure_documents_index(sf_dir)
    r = eng.execute(eng.query(Crosswalk.MINI).search("table")[1, 10])
    return pa.table({"id": r.table["id"], "score": _scaled(r.table["score"].to_pylist())})


def q_dict_df_top(sf_dir: str) -> pa.Table:
    """S5/A9 analog: the index dictionary's hottest terms by df."""
    eng = ensure_documents_index(sf_dir)
    t = pq.read_table(os.path.join(eng.index_dir, "dict"), columns=["term", "df"])
    idx = pc.sort_indices(t, sort_keys=[("df", "descending"), ("term", "ascending")])
    out = t.take(idx).slice(0, 20)
    return pa.table({"term": out["term"], "df": out["df"].cast(pa.int64())})


def q_corpus_stats(sf_dir: str) -> pa.Table:
    eng = ensure_documents_index(sf_dir)
    return pa.table(
        {
            "n_docs": pa.array([eng.n_docs], type=pa.int64()),
            "total_tokens": pa.array([int(eng.manifest["total_tokens"])], type=pa.int64()),
            "avgdl": _scaled([eng.manifest["avgdl"]]),
        }
    )


ORACLE_SQL: dict[str, str] = {
    "fts_term": _bm25_cte(["table"]) + _bm25_select(),
    "fts_and": _bm25_cte(["table", "scan"]) + _bm25_select("WHERE nmatched = 2"),
    "fts_or": _bm25_cte(["table", "vector"]) + _bm25_select(),
    "fts_not": _bm25_cte(["table"])
    + _bm25_select("WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'vector')"),
    "fts_phrase": (
        f"WITH {_TOK}, {_DL}, {_STATS}, "
        "ptok AS (SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos "
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), "
        f"'{TOKEN_SPLIT_PATTERN}'), x -> x <> '') AS arr FROM documents)), "
        "phrase_docs AS (SELECT DISTINCT a.doc_id FROM ptok a JOIN ptok b "
        "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "WHERE a.term = 'table' AND b.term = 'scan'), "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok "
        "WHERE term IN ('table','scan') GROUP BY doc_id, term), "
        "df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tok "
        "WHERE term IN ('table','scan') GROUP BY term), "
        "scored AS (SELECT tf.doc_id, "
        f"sum(ln(1 + (stats.n - df.df + 0.5)/(df.df + 0.5)) * (tf.tf * ({K1} + 1)) / "
        f"(tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) AS score_raw "
        "FROM tf JOIN df USING(term) JOIN dl USING(doc_id) CROSS JOIN stats "
        "WHERE tf.doc_id IN (SELECT doc_id FROM phrase_docs) GROUP BY tf.doc_id)"
        + _bm25_select()
    ),
    "fts_multi_clause": _bm25_cte(["table", "row", "value"])
    + _bm25_select(
        "WHERE doc_id IN (SELECT doc_id FROM tok WHERE term = 'table') "
        "AND doc_id IN (SELECT doc_id FROM tok WHERE term IN ('row','value'))"
    ),
    "fts_filter_lang": _bm25_cte(["table"])
    + _bm25_select("WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"),
    "fts_filter_nchars": _bm25_cte(["table"])
    + _bm25_select("WHERE doc_id IN (SELECT doc_id FROM documents WHERE n_chars BETWEEN 200 AND 400)"),
    "fts_filter_combo": _bm25_cte(["table"])
    + _bm25_select(
        "WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang IN ('en','de') AND n_chars >= 150)"
    ),
    "fts_ids_in": _bm25_cte(["table"])
    + _bm25_select(
        "WHERE doc_id IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0 AND doc_id < 200)"
    ),
    "fts_pagination": _bm25_cte(["table"]) + _bm25_select(k=10, offset=10),
    "count_matches": _bm25_cte(["table", "scan"])
    + " SELECT CAST(count(*) AS BIGINT) AS total FROM scored WHERE nmatched = 2",
    "order_by_nchars": (
        "SELECT doc_id, n_chars FROM documents WHERE lang = 'en' "
        "ORDER BY n_chars DESC, doc_id LIMIT 50"
    ),
    "order_random": (
        "SELECT doc_id FROM documents WHERE source = 'src2' "
        "ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)) LIMIT 20"
    ),
    "facet_top_sources": _bm25_cte(["table"])
    + (
        ", top_docs AS (SELECT doc_id FROM scored ORDER BY score_raw DESC, doc_id LIMIT 100) "
        "SELECT d.source AS source, CAST(count(*) AS BIGINT) AS n FROM top_docs t "
        "JOIN documents d USING(doc_id) GROUP BY d.source ORDER BY n DESC, source LIMIT 5"
    ),
    "crosswalk_mini": _bm25_cte(["table"])
    + (
        f" SELECT doc_id AS id, CAST(floor(score_raw * {SCORE_SCALE} + 0.5) AS BIGINT) AS score "
        "FROM scored ORDER BY score_raw DESC, doc_id LIMIT 10"
    ),
    "dict_df_top": (
        f"WITH {_TOK} SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok "
        "GROUP BY term ORDER BY df DESC, term LIMIT 20"
    ),
    "corpus_stats": (
        f"WITH {_TOK}, {_DL} SELECT "
        "(SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs, "
        "(SELECT CAST(COALESCE(sum(dl),0) AS BIGINT) FROM dl) AS total_tokens, "
        f"CAST(floor((SELECT CAST(COALESCE(sum(dl),0) AS DOUBLE) FROM dl) / "
        f"(SELECT CAST(count(*) AS DOUBLE) FROM documents) * {SCORE_SCALE} + 0.5) AS BIGINT) AS avgdl"
    ),
}

QUERIES = {
    "fts_term": q_fts_term,
    "fts_and": q_fts_and,
    "fts_or": q_fts_or,
    "fts_not": q_fts_not,
    "fts_phrase": q_fts_phrase,
    "fts_multi_clause": q_fts_multi_clause,
    "fts_filter_lang": q_fts_filter_lang,
    "fts_filter_nchars": q_fts_filter_nchars,
    "fts_filter_combo": q_fts_filter_combo,
    "fts_ids_in": q_fts_ids_in,
    "fts_pagination": q_fts_pagination,
    "count_matches": q_count_matches,
    "order_by_nchars": q_order_by_nchars,
    "order_random": q_order_random,
    "facet_top_sources": q_facet_top_sources,
    "crosswalk_mini": q_crosswalk_mini,
    "dict_df_top": q_dict_df_top,
    "corpus_stats": q_corpus_stats,
}
