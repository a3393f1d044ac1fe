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

# --------------------------------------------------------------------------
# Training-data-pipeline extras: dedup / similarity / text analysis /
# multimodal / scans (first-class operators beyond the reference)
# --------------------------------------------------------------------------
def _docs_ds(sf_dir: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def q_export_matches(sf_dir: str) -> pa.Table:
    """Export mode (matches_dataset): EVERY doc matching a boolean query +
    filter, streamed as a Dataset — here collected to (doc_id, score) for the
    oracle compare (order-insensitive)."""
    eng = ensure_documents_index(sf_dir)
    q = eng.query().search("table -vector").eq("lang", "en")
    df = eng.matches_dataset(q).to_pandas().sort_values("doc_id")
    return pa.table({"doc_id": pa.array(df["doc_id"], type=pa.int64()),
                     "score": _scaled(df["score"].tolist())})


def q_token_estimates(sf_dir: str) -> pa.Table:
    """Token counting three ways (task brief: whitespace + BPE-ish): exact
    analyzer tokens, whitespace split, and the chars/4 BPE-count heuristic —
    all integer, all vectorized."""
    def est(batch: pa.Table) -> pa.Table:
        from ..functions.analyzer import DEFAULT_ANALYZER

        _, di, _ = DEFAULT_ANALYZER.tokenize_column(batch["text"])
        exact = np.bincount(di, minlength=batch.num_rows).astype(np.int64)
        ws = pc.list_value_length(pc.split_pattern(pc.coalesce(batch["text"], pa.scalar("")), " "))
        chars = pc.utf8_length(pc.coalesce(batch["text"], pa.scalar("")))
        bpe = pc.cast(pc.ceil(pc.divide(pc.cast(chars, pa.float64()), 4.0)), pa.int64())
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(exact),
            "n_ws_tokens": ws.cast(pa.int64()) if not isinstance(ws, pa.ChunkedArray) else ws.combine_chunks().cast(pa.int64()),
            "n_bpe_est": bpe if not isinstance(bpe, pa.ChunkedArray) else bpe.combine_chunks(),
        })

    t = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(lambda b: b.filter(pc.less(b["doc_id"], 100)), batch_format="pyarrow")
        .map_batches(est, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table({
        "doc_id": pa.array(t["doc_id"], type=pa.int64()),
        "n_tokens": pa.array(t["n_tokens"], type=pa.int64()),
        "n_ws_tokens": pa.array(t["n_ws_tokens"], type=pa.int64()),
        "n_bpe_est": pa.array(t["n_bpe_est"], type=pa.int64()),
    })


def q_dedup_exact(sf_dir: str) -> pa.Table:
    from ..stages.dedup import exact_dedup

    out = exact_dedup(_docs_ds(sf_dir, ["doc_id", "text"]), "doc_id", "text").to_pandas()
    out = out.sort_values("keep_id").reset_index(drop=True)
    return pa.table({"keep_id": pa.array(out["keep_id"], type=pa.int64()),
                     "n_dups": pa.array(out["n_dups"], type=pa.int64())})


def q_dedup_prefix10(sf_dir: str) -> pa.Table:
    """Exact dedup on a normalized key (first 10 analyzer tokens) — the
    'canonicalize then hash-dedup' pattern."""
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..stages.dedup import exact_dedup

    def add_prefix(batch: pa.Table) -> pa.Table:
        terms, di, _ = DEFAULT_ANALYZER.tokenize_column(batch["text"])
        prefixes = []
        n = batch.num_rows
        bounds = np.searchsorted(di, np.arange(n + 1))
        for i in range(n):
            toks = terms[bounds[i] : min(bounds[i] + 10, bounds[i + 1])]
            prefixes.append(" ".join(toks))
        return batch.append_column("prefix10", pa.array(prefixes, type=pa.string()))

    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(add_prefix, batch_format="pyarrow")
    out = exact_dedup(ds, "doc_id", "prefix10").to_pandas().sort_values("keep_id").reset_index(drop=True)
    return pa.table({"keep_id": pa.array(out["keep_id"], type=pa.int64()),
                     "n_dups": pa.array(out["n_dups"], type=pa.int64())})


def q_token_counts(sf_dir: str) -> pa.Table:
    from ..functions.analyzer import DEFAULT_ANALYZER

    def count_tokens(batch: pa.Table) -> pa.Table:
        _, di, _ = DEFAULT_ANALYZER.tokenize_column(batch["text"])
        n = np.bincount(di, minlength=batch.num_rows).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n)})

    t = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(lambda b: b.filter(pc.less(b["doc_id"], 100)), batch_format="pyarrow")
        .map_batches(count_tokens, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table({"doc_id": pa.array(t["doc_id"], type=pa.int64()),
                     "n_tokens": pa.array(t["n_tokens"], type=pa.int64())})


def q_quality_scores(sf_dir: str) -> pa.Table:
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..functions.textstats import quality_metrics

    def score(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "n_tokens": [], "distinct_terms": [], "stop_hits": []}
        for did, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            m = quality_metrics(DEFAULT_ANALYZER.tokenize(txt or ""), txt or "")
            rows["doc_id"].append(did)
            rows["n_tokens"].append(m["n_tokens"])
            rows["distinct_terms"].append(m["distinct_terms"])
            rows["stop_hits"].append(m["stop_hits"])
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in rows.items()})

    t = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(lambda b: b.filter(pc.less(b["doc_id"], 100)), batch_format="pyarrow")
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(t, preserve_index=False)


def q_contains_scan(sf_dir: str) -> pa.Table:
    """P3 CONTAINS analog: naive vectorized substring scan over the corpus
    (the trigram-index-assisted path is phase 2; this is the documented
    fallback, reference full_text_search.py:144-146)."""
    ds = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: b.filter(pc.match_substring(b["text"], "window merge")), batch_format="pyarrow"
    )
    t = ds.to_pandas().sort_values("doc_id")
    return pa.table({"doc_id": pa.array(t["doc_id"], type=pa.int64())})


def q_events_type_counts(sf_dir: str) -> pa.Table:
    """Generic filter+aggregate over the events table (F8/A8 analog):
    partial per-batch counts → tiny groupby (combiner pattern)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "event_id"])
    cutoff = pa.scalar(np.datetime64("2024-01-15T00:00:00", "us"))
    ds = ds.map_batches(lambda b: b.filter(pc.greater_equal(b["ts"], cutoff)), batch_format="pyarrow")
    agg = ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    agg = agg.sort_values(["event_type"]).reset_index(drop=True)
    return pa.table({"event_type": pa.array(agg["event_type"]), "n": pa.array(agg["n"], type=pa.int64())})


def q_ann_cosine_topk(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-k vs the vec_id=0 embedding (exact baseline)."""
    import ray.data as rd
    from ..stages.similarity import brute_force_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q_vec = pq.read_table(emb_path, filters=[("vec_id", "==", 0)])["embedding"].to_pylist()[0]
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, "embedding", "vec_id", np.asarray([q_vec]), k=10, exclude_ids={0})
    return pa.table({"vec_id": out["vec_id"], "cos_i4": out["cos_i4"]})


def q_embed_neardup_pairs(sf_dir: str) -> pa.Table:
    import ray.data as rd
    from ..stages.dedup import embedding_neardup_pairs

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.45)


def q_ann_lsh_topk(sf_dir: str) -> pa.Table:
    """LSH-bucketed ANN (approximate scale path) — rows-only check; recall vs
    the exact baseline is asserted in pytest."""
    import ray.data as rd
    from ..stages.similarity import lsh_bucket_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q_vec = pq.read_table(emb_path, filters=[("vec_id", "==", 0)])["embedding"].to_pylist()[0]
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    return lsh_bucket_topk(ds, "embedding", "vec_id", np.asarray([q_vec]), k=10, exclude_ids={0})


def q_ann_ivf_topk(sf_dir: str) -> pa.Table:
    """IVF ANN (coarse k-means lists + probe) — rows-only check; recall vs
    the exact baseline asserted in pytest."""
    import ray.data as rd
    from ..stages.similarity import ivf_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q_vec = pq.read_table(emb_path, filters=[("vec_id", "==", 0)])["embedding"].to_pylist()[0]
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    return ivf_topk(ds, "embedding", "vec_id", np.asarray([q_vec]), k=10, exclude_ids={0})


def q_window_counts(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate over the events stream table (daily
    windows): derive the window key vectorized, then one groupby — the
    batch expression of a streaming window (SURVEY §2.8 note)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"])

    def add_day(batch: pa.Table) -> pa.Table:
        days = pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us"))
        return batch.append_column("day", days)

    agg = (
        ds.map_batches(add_day, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "day": pa.array(agg["day"]).cast(pa.timestamp("us")),
            "event_type": pa.array(agg["event_type"]),
            "n": pa.array(agg["n"], type=pa.int64()),
        }
    )


def q_ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """EXACT n-gram-Jaccard near-dup pairs (shingle-hash bucket candidates +
    in-bucket verification) — rows-only; exactness asserted in pytest."""
    from ..stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs_ds(sf_dir, ["doc_id", "text"]), "text", "doc_id",
                              threshold=0.3).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_minhash_neardup(sf_dir: str) -> pa.Table:
    from ..stages.dedup import minhash_lsh_pairs

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    out = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.3).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_simhash_pairs(sf_dir: str) -> pa.Table:
    from ..stages.dedup import simhash_pairs

    ds = _docs_ds(sf_dir, ["doc_id", "text"])
    out = simhash_pairs(ds, "text", "doc_id", max_hamming=12).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_langid(sf_dir: str) -> pa.Table:
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..functions.textstats import predict_language

    def pred(batch: pa.Table) -> pa.Table:
        preds = [predict_language(DEFAULT_ANALYZER.tokenize(t or "")) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "pred_lang": pa.array(preds)})

    t = _docs_ds(sf_dir, ["doc_id", "text"]).map_batches(pred, batch_format="pyarrow").to_pandas()
    agg = t.groupby("pred_lang").size().reset_index(name="n").sort_values("pred_lang")
    return pa.table({"pred_lang": pa.array(agg["pred_lang"]), "n": pa.array(agg["n"], type=pa.int64())})


def q_fingerprints(sf_dir: str) -> pa.Table:
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..functions.textstats import rolling_fingerprints, winnow

    def fp(batch: pa.Table) -> pa.Table:
        ids, nfp = [], []
        for did, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = winnow(rolling_fingerprints(DEFAULT_ANALYZER.tokenize(txt or "")))
            ids.append(did)
            nfp.append(len(sig))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "n_fingerprints": pa.array(nfp, type=pa.int64())})

    t = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(lambda b: b.filter(pc.less(b["doc_id"], 50)), batch_format="pyarrow")
        .map_batches(fp, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(t, preserve_index=False)


def q_fuzzy_search(sf_dir: str) -> pa.Table:
    """P2 FUZZY analog via the trigram index (stages/trigram.py): the
    misspelled query term expands to dictionary terms by word_similarity and
    runs as an OR-search — no vocabulary scan, no corpus scan."""
    eng = ensure_documents_index(sf_dir)
    q = eng.query().search_fuzzy("tabel")  # misspelling of 'table'
    top = eng.top_docs(q, 20)
    return pa.table({"doc_id": top["doc_id"], "score": _scaled(top["score"].to_pylist())})


def q_contains_indexed(sf_dir: str) -> pa.Table:
    """P3 CONTAINS via the trigram index: single-token substring expands to
    the dictionary terms containing it (trigram candidates + exact verify),
    then posting-list OR — equivalent to the naive scan but index-assisted
    (pytest asserts equivalence on the matched doc set)."""
    eng = ensure_documents_index(sf_dir)
    q = eng.query().search_contains("able")
    top = eng.top_docs(q, 500)
    ids = sorted(top["doc_id"].to_pylist())
    return pa.table({"doc_id": pa.array(ids, type=pa.int64())})


def q_multimodal_decode(sf_dir: str) -> pa.Table:
    """Multimodal plumbing: binary payload column → actor-pool decode stage →
    feature vectors (deterministic fake kernel; see stages/multimodal.py)."""
    import ray.data as rd
    from ..stages.multimodal import DecodeImageStage, synth_media_table

    media = synth_media_table(64)
    ds = rd.from_arrow(media)
    out = ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"dim": 16}, batch_format="pyarrow",
        concurrency=2, batch_size=16,
    ).to_pandas().sort_values("media_id")
    feat0 = [int(np.floor(f[0] * 10000 + 0.5)) for f in out["features"]]
    return pa.table({"media_id": pa.array(out["media_id"], type=pa.int64()),
                     "feat0_i4": pa.array(feat0, type=pa.int64())})


def q_transcripts_flagship(sf_dir: str) -> pa.Table:
    """North-rule flagship on the transcript corpus (deterministic fixture
    scaled by sf): build index → phrase+boolean search → top-k. Rows-only
    driver check; rank-identity is asserted against the brute-force oracle in
    pytest (tests/test_search_oracle.py)."""
    from ..corpus import TRANSCRIPTS_SPEC
    from ..sources.transcripts import transcripts_parquet

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_convs = max(50, n_docs)  # sf0.01 → 500 convs × 8 turns = 4k docs
    path = transcripts_parquet(n_convs=n_convs, turns_per_conv=8, seed=42)
    fp = parquet_input_fingerprint([path])
    index_dir = os.path.join(INDEX_CACHE_ROOT, f"transcripts_{fp}")
    build_index(path, TRANSCRIPTS_SPEC, index_dir, docs_per_segment=2048)
    eng = _ENGINES.get(index_dir)
    if eng is None:
        eng = FullTextSearchEngine(index_dir)
        _ENGINES[index_dir] = eng
    q = eng.query().search('"quick brown fox" or ray').eq("role", "user")
    top = eng.top_docs(q, 50)
    return pa.table({"conv_id": top["conv_id"], "turn_idx": top["turn_idx"],
                     "score": _scaled(top["score"].to_pylist())})


def q_facet_lang_counts(sf_dir: str) -> pa.Table:
    """A5/A8 analog: full-corpus categorical counts in ONE groupby pass (the
    reference loops N count queries, opds.py:706-714)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = _docs_ds(sf_dir, ["lang"])
    agg = ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas().sort_values("lang")
    return pa.table({"lang": pa.array(agg["lang"]), "n": pa.array(agg["n"], type=pa.int64())})


def q_sample_per_source(sf_dir: str) -> pa.Table:
    """O6 analog (per-shelf seeded random sample, opds.py:543-561): 3 docs
    per source by seeded md5 order — groupby.map_groups with a deterministic
    in-group sort."""
    import hashlib

    import pandas as pd

    def take3(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["doc_id"].map(lambda d: hashlib.md5(f"42|{d}".encode()).hexdigest())
        g = g.assign(__k=keys).sort_values(["__k", "doc_id"]).head(3)
        return g[["source", "doc_id"]]

    out = (
        _docs_ds(sf_dir, ["source", "doc_id"])
        .groupby("source")
        .map_groups(take3, batch_format="pandas")
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    return pa.table({"source": pa.array(out["source"]), "doc_id": pa.array(out["doc_id"], type=pa.int64())})


def q_regex_normalize(sf_dir: str) -> pa.Table:
    """N1/N2 analog (MARC-subfield strip / text normalizer,
    helpers.py:33-53): vectorized regexp replace via pyarrow.compute — both
    Arrow and DuckDB compile RE2, so the oracle is exact."""
    def norm(batch: pa.Table) -> pa.Table:
        out = pc.replace_substring_regex(batch["text"], r"\b(table|row)\b", "X")
        return pa.table({"doc_id": batch["doc_id"], "norm_text": out})

    t = (
        _docs_ds(sf_dir, ["doc_id", "text"])
        .map_batches(lambda b: b.filter(pc.less(b["doc_id"], 50)), batch_format="pyarrow")
        .map_batches(norm, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table({"doc_id": pa.array(t["doc_id"], type=pa.int64()), "norm_text": pa.array(t["norm_text"])})


def q_dedup_components(sf_dir: str) -> pa.Table:
    """Near-dup clusters: MinHash-LSH pairs → connected components → (id, rep).
    Rows-only driver check; component semantics pinned in pytest."""
    from ..stages.dedup import connected_components, minhash_lsh_pairs

    pairs_ds = minhash_lsh_pairs(_docs_ds(sf_dir, ["doc_id", "text"]), "text", "doc_id", threshold=0.3)
    pairs = pa.Table.from_pandas(pairs_ds.to_pandas(), preserve_index=False)
    return connected_components(pairs)


def q_user_rollup(sf_dir: str) -> pa.Table:
    """A2/A3 analog (per-book STRING_AGG / MAX-MIN rollups,
    mv_books_dc.sql:42-125): per-user rollup over events with an ordered
    string aggregate and min/max — groupby.map_groups with in-group sort."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_id", "event_type"]
    ).map_batches(lambda b: b.filter(pc.less(b["user_id"], 30)), batch_format="pyarrow")

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [len(g)],
                "first_event": [int(g["event_id"].min())],
                "last_event": [int(g["event_id"].max())],
                "type_seq": [",".join(g["event_type"].head(5))],
            }
        )

    out = ds.groupby("user_id").map_groups(rollup, batch_format="pandas").to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"], type=pa.int64()),
            "n_events": pa.array(out["n_events"], type=pa.int64()),
            "first_event": pa.array(out["first_event"], type=pa.int64()),
            "last_event": pa.array(out["last_event"], type=pa.int64()),
            "type_seq": pa.array(out["type_seq"]),
        }
    )


# small dimension table for the broadcast join (J1/J2 analog) — inline, like
# the reference's enum vocabularies (constants.py:18-30)
EVENT_CATEGORY = {"click": "ui", "view": "ui", "purchase": "commerce", "signup": "account",
                  "login": "account", "logout": "account", "error": "ops", "search": "ui"}


def q_broadcast_join_categories(sf_dir: str) -> pa.Table:
    """J1/J2 analog: broadcast a small dim (ray.put once, lookup per batch —
    no shuffle) and aggregate by the joined category."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    dim_ref = ray.put(EVENT_CATEGORY)

    def add_category(batch: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        cats = [dim.get(t, "other") for t in batch["event_type"].to_pylist()]
        return batch.append_column("category", pa.array(cats, type=pa.string()))

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type"])
    agg = (
        ds.map_batches(add_category, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("category")
    )
    return pa.table({"category": pa.array(agg["category"]), "n": pa.array(agg["n"], type=pa.int64())})


_PTOK_SQL = (
    "SELECT doc_id, list_filter(regexp_split_to_array(lower(text), "
    f"'{TOKEN_SPLIT_PATTERN}'), x -> x <> '') AS arr FROM documents"
)

ORACLE_SQL_EXTRAS: dict[str, str] = {
    "dedup_exact": (
        "SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups "
        "FROM documents GROUP BY text ORDER BY keep_id"
    ),
    "dedup_prefix10": (
        f"SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups "
        f"FROM (SELECT doc_id, array_to_string((list_filter(regexp_split_to_array(lower(text), "
        f"'{TOKEN_SPLIT_PATTERN}'), x -> x <> ''))[1:10], ' ') AS p FROM documents) "
        "GROUP BY p ORDER BY keep_id"
    ),
    "token_counts": (
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(len(list_filter(regexp_split_to_array("
        f"lower(text), '{TOKEN_SPLIT_PATTERN}'), x -> x <> '')) AS BIGINT) AS n_tokens "
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id"
    ),
    "quality_scores": (
        f"WITH base AS ({_PTOK_SQL}), t AS (SELECT doc_id, unnest(arr) AS term FROM base) "
        "SELECT CAST(b.doc_id AS BIGINT) AS doc_id, CAST(len(b.arr) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(s.d, 0) AS BIGINT) AS distinct_terms, CAST(COALESCE(s.sh, 0) AS BIGINT) AS stop_hits "
        "FROM base b LEFT JOIN (SELECT doc_id, count(DISTINCT term) AS d, "
        "count(*) FILTER (term IN ('the','and','of','to','in','is','it','that','was','for')) AS sh "
        "FROM t GROUP BY doc_id) s USING(doc_id) WHERE b.doc_id < 100 ORDER BY doc_id"
    ),
    "contains_scan": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents "
        "WHERE contains(text, 'window merge') ORDER BY doc_id"
    ),
    "events_type_counts": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY event_type ORDER BY event_type"
    ),
    "ann_cosine_topk": (
        "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
        "SELECT CAST(e.vec_id AS BIGINT) AS vec_id, "
        "CAST(floor(list_cosine_similarity(e.embedding, q.qv) * 10000 + 0.5) AS BIGINT) AS cos_i4 "
        "FROM embeddings e, q WHERE e.vec_id <> 0 "
        "ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id LIMIT 10"
    ),
    "facet_lang_counts": (
        "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang ORDER BY lang"
    ),
    "sample_per_source": (
        "SELECT source, CAST(doc_id AS BIGINT) AS doc_id FROM ("
        "SELECT source, doc_id, row_number() OVER (PARTITION BY source "
        "ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) "
        "WHERE rn <= 3 ORDER BY source, doc_id"
    ),
    "regex_normalize": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "regexp_replace(text, '\\b(table|row)\\b', 'X', 'g') AS norm_text "
        "FROM documents WHERE doc_id < 50 ORDER BY doc_id"
    ),
    "user_rollup": (
        "SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(min(event_id) AS BIGINT) AS first_event, CAST(max(event_id) AS BIGINT) AS last_event, "
        "string_agg(event_type, ',' ORDER BY event_id) FILTER (rn <= 5) AS type_seq "
        "FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn "
        "FROM events WHERE user_id < 30) GROUP BY user_id ORDER BY user_id"
    ),
    "broadcast_join_categories": (
        "SELECT CASE event_type WHEN 'click' THEN 'ui' WHEN 'view' THEN 'ui' WHEN 'purchase' THEN 'commerce' WHEN 'signup' THEN 'account' WHEN 'login' THEN 'account' WHEN 'logout' THEN 'account' WHEN 'error' THEN 'ops' WHEN 'search' THEN 'ui' ELSE 'other' END AS category, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY category ORDER BY category"
    ),
    "window_counts": (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY day, event_type "
        "ORDER BY day, event_type"
    ),
    "export_matches": _bm25_cte(["table"]) + (
        " SELECT doc_id, CAST(floor(score_raw * 10000 + 0.5) AS BIGINT) AS score FROM scored"
        " WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'vector')"
        " AND doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"
        " ORDER BY doc_id"
    ),
    "token_estimates": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens, "
        "CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_bpe_est "
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id"
    ),
    "embed_neardup_pairs": (
        "SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b, "
        "CAST(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5) AS BIGINT) AS cos_i4 "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45 ORDER BY id_a, id_b"
    ),
}

QUERIES_EXTRAS = {
    "export_matches": q_export_matches,
    "dedup_exact": q_dedup_exact,
    "dedup_prefix10": q_dedup_prefix10,
    "token_counts": q_token_counts,
    "token_estimates": q_token_estimates,
    "quality_scores": q_quality_scores,
    "contains_scan": q_contains_scan,
    "events_type_counts": q_events_type_counts,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embed_neardup_pairs": q_embed_neardup_pairs,
    "facet_lang_counts": q_facet_lang_counts,
    "sample_per_source": q_sample_per_source,
    "regex_normalize": q_regex_normalize,
    "dedup_components": q_dedup_components,
    "user_rollup": q_user_rollup,
    "broadcast_join_categories": q_broadcast_join_categories,
    "window_counts": q_window_counts,
    # rows-only (no SQL-expressible oracle; semantics asserted in pytest)
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "minhash_neardup": q_minhash_neardup,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_pairs": q_simhash_pairs,
    "langid_counts": q_langid,
    "fingerprints": q_fingerprints,
    "fuzzy_search": q_fuzzy_search,
    "contains_indexed": q_contains_indexed,
    "multimodal_decode": q_multimodal_decode,
    "transcripts_flagship": q_transcripts_flagship,
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
QUERIES.update(QUERIES_EXTRAS)
ORACLE_SQL.update(ORACLE_SQL_EXTRAS)
