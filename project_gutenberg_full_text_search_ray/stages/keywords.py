"""TF-IDF keyword extraction — the top-k most characteristic terms per
document, the classic IR signal (doc tagging, near-dup triage, topic
sketches) the rest of the dedup/quality family consumes downstream.

Determinism/oracle contract (the ``lm_surprisal_scores`` discipline):
each term's idf quantizes ONCE to an integer — ``idf_q(t) =
floor(log2(N / df_t) · quant + 0.5)`` over exact integer corpus counts
(N = documents, df = documents containing the term) — and per-(doc,
term) scores are exact ``tf · idf_q`` int64 products, so block geometry
cannot move a score and a DuckDB twin (driver query ``tfidf_top_terms``)
recomputes the identical table.  Selection order is (score DESC, term
ASC) — fully deterministic.

Shape: pass 1 computes df with the vocabulary combiner (per-batch
distinct-(doc, term) → term counts; the exchange carries (term, df),
never text) plus the document count; the sorted (term → idf_q) table
broadcasts once via ``ray.put`` (vocabulary-sized, the CCNet/LM
deployment pattern — ``vocab_cap`` fails loudly instead of broadcasting
an unbounded table).  Pass 2 scores each batch with one tokenize + one
integer lexsort (term ranks ARE lexicographic order because the vocab
is sorted) + run-boundary tf counting + a vectorized per-doc rank
filter — shuffle-free, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer
from ..functions.arrowutil import table_refs


def tfidf_top_terms(
    ds: rd.Dataset, text_col: str, id_col: str, *,
    k: int = 5, quant: int = 1024, vocab_cap: int = 5_000_000,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> rd.Dataset:
    """Per-document top-``k`` TF-IDF terms: ``(id, term, tf, score_q)``
    with ``score_q = tf · floor(log2(N/df)·quant + 0.5)``, ordered by
    (score DESC, term ASC) within each document.  Token-less documents
    emit no rows (SQL GROUP BY semantics).  Terms present in every
    document get idf 0 and can still surface when a document has no
    rarer term — exactly like the SQL twin."""
    import pyarrow.compute as pc

    sch = ds.schema().base_schema
    id_type = sch.field(id_col).type
    out_schema = pa.schema([(id_col, id_type), ("term", pa.string()),
                            ("tf", pa.int64()), ("score_q", pa.int64())])

    # ---- pass 1: document frequency + document count (combiner)
    def df_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], type=pa.string()),
                          "df": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # doc-count marker row under a sentinel key no analyzer token can
        # be ("\x00" is outside [a-z0-9]) — a NULL key would hit Ray's
        # sort-shuffle None-vs-str comparison at high parallelism
        nrow = pa.table({"term": pa.array(["\x00n"], type=pa.string()),
                         "df": pa.array([0], type=pa.int64()),
                         "n": pa.array([b.num_rows], type=pa.int64())})
        if pa.types.is_null(texts.type):
            return nrow
        terms, doc_index, _ = analyzer.tokenize_column(texts)
        if len(terms) == 0:
            return nrow
        # distinct (doc, term): sort by term then doc, count run starts
        # whose (term, doc) differs from the previous — vectorized
        order = np.lexsort((doc_index, terms))
        ts, ds_ = terms[order], doc_index[order]
        new = np.r_[True, (ts[1:] != ts[:-1]) | (ds_[1:] != ds_[:-1])]
        ut, df = np.unique(ts[new], return_counts=True)
        return pa.concat_tables([pa.table({
            "term": pa.array(ut, type=pa.string()),
            "df": pa.array(df.astype(np.int64)),
            "n": pa.array(np.zeros(len(ut), dtype=np.int64))}), nrow])

    from ray.data.aggregate import Sum

    agg = (ds.select_columns([text_col])
           .map_batches(df_partial, batch_format="pyarrow")
           .groupby("term").aggregate(Sum("df", alias_name="df"),
                                      Sum("n", alias_name="n")))
    tabs = [t for t in ray.get(table_refs(agg))
            if t.num_rows and "df" in t.column_names]
    if not tabs:
        return rd.from_arrow(out_schema.empty_table())
    stats = pa.concat_tables([t.select(["term", "df", "n"]) for t in tabs])
    null_mask = pc.equal(stats["term"], "\x00n")
    n_docs = int(pc.sum(pc.if_else(null_mask, stats["n"],
                                   pa.scalar(0, type=pa.int64()))).as_py()
                 or 0)
    vocab = stats.filter(pc.invert(null_mask))
    if vocab.num_rows > vocab_cap:
        raise ValueError(
            f"tfidf_top_terms: vocabulary {vocab.num_rows} exceeds "
            f"vocab_cap={vocab_cap} — prune the analyzer or raise the cap")
    if vocab.num_rows == 0 or n_docs == 0:
        return rd.from_arrow(out_schema.empty_table())
    vterm = np.asarray(vocab["term"].to_pylist(), dtype=object)
    vdf = vocab["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vterm, kind="stable")
    vterm, vdf = vterm[order], vdf[order]
    # ONE quantization per distinct term (N, df exact ints; the float64
    # expression shape matches the DuckDB twin term for term)
    idf_q = np.floor(np.log2(np.float64(n_docs) / vdf.astype(np.float64))
                     * quant + 0.5).astype(np.int64)
    vref = ray.put((vterm, idf_q))

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            return out_schema.empty_table()
        terms, doc_index, _ = analyzer.tokenize_column(texts)
        if len(terms) == 0:
            return out_schema.empty_table()
        vt, vq = ray.get(vref)
        rank = np.searchsorted(vt, terms)
        rank[rank == len(vt)] = 0
        if not (vt[rank] == terms).all():
            raise KeyError(
                "tfidf_top_terms: token absent from the trained vocabulary "
                "— scoring a different dataset than pass 1 read?")
        # tf per (doc, term-rank): one integer lexsort + run boundaries
        order = np.lexsort((rank, doc_index))
        d_s, r_s = doc_index[order], rank[order]
        new = np.r_[True, (d_s[1:] != d_s[:-1]) | (r_s[1:] != r_s[:-1])]
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(d_s))).astype(np.int64)
        doc_u, rank_u = d_s[starts], r_s[starts]
        sc = tf * vq[rank_u]
        # per-doc top-k under (score DESC, term ASC): term rank IS
        # lexicographic order (vocab sorted), so all sort keys are ints
        sel = np.lexsort((rank_u, -sc, doc_u))
        d2 = doc_u[sel]
        run = np.r_[True, d2[1:] != d2[:-1]]
        run_starts = np.flatnonzero(run)
        run_len = np.diff(np.append(run_starts, len(d2)))
        pos = np.arange(len(d2)) - np.repeat(run_starts, run_len)
        keep = sel[pos < k]
        keep = keep[np.argsort(doc_u[keep], kind="stable")]
        ids = b[id_col].take(pa.array(doc_u[keep]))
        return pa.table({id_col: ids,
                         "term": pa.array(vt[rank_u[keep]],
                                          type=pa.string()),
                         "tf": pa.array(tf[keep]),
                         "score_q": pa.array(sc[keep])})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def collocations_pmi(
    ds: rd.Dataset, text_col: str, *,
    k: int = 50, min_count: int = 5, quant: int = 1024,
    vocab_cap: int = 5_000_000,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> pa.Table:
    """Corpus-level collocation extraction: the top-``k`` adjacent-token
    bigrams by quantized pointwise mutual information — the classic
    phrase-mining signal (multi-word expressions for tokenizer vocab
    curation, boilerplate phrase triage, topic labels).

    Determinism/oracle contract (the ``tfidf_top_terms`` discipline):
    every count is an exact corpus integer — ``c(xy)`` adjacent-pair
    occurrences, ``c(x)``/``c(y)`` unigram occurrences, ``T`` total
    tokens, ``P`` total adjacent pairs — and each surviving bigram
    quantizes ONCE:

        score_q = floor(log2(((c_xy·T)·T) / ((P·c_x)·c_y)) · quant + 0.5)

    with the float64 expression shape (parenthesization included)
    replicated term for term by the DuckDB twin (driver query
    ``collocations_pmi``), so block geometry cannot move a score.
    "Adjacent" means consecutive in the analyzed token stream of one
    document (the same filtered stream the n-gram Jaccard shingles use).
    Selection order is (score_q DESC, w1 ASC, w2 ASC); only pairs with
    ``c(xy) >= min_count`` are scored (PMI is noise below a support
    floor — Church & Hanks 1990's standard guard).

    Shape: ONE combiner pass emits per-batch partial counts for unigrams
    (key = term), bigrams (key = ``w1␟w2`` — the unit separator cannot
    appear in an analyzer token, so the key spaces are disjoint by
    construction) and the two totals (``\\x00T``/``\\x00P`` sentinel
    keys); one distinct-key-sized ``groupby().sum()`` is the only
    exchange, materialized once so the two consumers below don't re-run
    it.  The unigram table broadcasts via ``ray.put`` (``vocab_cap``
    fails loudly instead of shipping an unbounded table); bigram blocks
    are scored WHERE THEY SIT — each aggregate block contributes at most
    ``k`` candidates (post-groupby every key is globally unique, so a
    per-block head is an exact global top-k partial) and the driver
    folds candidates only, never the bigram table.  At 100 TB the
    distinct-bigram aggregate is the working set — it stays in the
    object store; for a bounded-memory approximation over heavy-tailed
    corpora route through ``sketches.heavy_hitters`` first.
    """
    import pyarrow.compute as pc

    SEP = "\x1f"
    part_schema = pa.schema([("key", pa.string()), ("cnt", pa.int64())])
    out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("pair_count", pa.int64()),
                            ("score_q", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            return part_schema.empty_table()
        terms, doc_index, _ = analyzer.tokenize_column_arrow(texts)
        n_tok = len(terms)
        totals = pa.table({"key": pa.array(["\x00T", "\x00P"]),
                           "cnt": pa.array([n_tok, 0], type=pa.int64())})
        if n_tok == 0:
            return totals.cast(part_schema)
        uni = pc.value_counts(terms)
        parts = [pa.table({"key": uni.field("values"),
                           "cnt": uni.field("counts")})]
        adj = doc_index[1:] == doc_index[:-1]
        n_pairs = int(adj.sum())
        totals = pa.table({"key": pa.array(["\x00T", "\x00P"]),
                           "cnt": pa.array([n_tok, n_pairs],
                                           type=pa.int64())})
        if n_pairs:
            mask = pa.array(adj)
            w1 = terms.slice(0, n_tok - 1).filter(mask)
            w2 = terms.slice(1, n_tok - 1).filter(mask)
            pairs = pc.binary_join_element_wise(w1, w2, SEP)
            bi = pc.value_counts(pairs)
            parts.append(pa.table({"key": bi.field("values"),
                                   "cnt": bi.field("counts")}))
        parts.append(totals)
        return pa.concat_tables([p.cast(part_schema) for p in parts])

    from ray.data.aggregate import Sum

    agg = (ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("key").aggregate(Sum("cnt", alias_name="cnt"))
           .materialize())  # distinct unigrams+bigrams, NOT the corpus

    # ---- pass A (tiny): totals + the unigram vocabulary to broadcast
    def uni_part(b: pa.Table) -> pa.Table:
        keys = b["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keep = pc.invert(pc.match_substring(keys, SEP))
        return b.filter(keep).cast(part_schema)

    utabs = [t for t in ray.get(table_refs(
        agg.map_batches(uni_part, batch_format="pyarrow")))
        if t.num_rows and "key" in t.column_names]
    if not utabs:
        return out_schema.empty_table()
    from ..functions.arrowutil import concat_cast

    uni_all = concat_cast(utabs, part_schema)
    sentinel = pc.starts_with(uni_all["key"], "\x00")
    tot = uni_all.filter(sentinel)
    tkeys = tot["key"].to_pylist()
    tcnts = tot["cnt"].to_pylist()
    n_tokens = int(tcnts[tkeys.index("\x00T")]) if "\x00T" in tkeys else 0
    n_pairs = int(tcnts[tkeys.index("\x00P")]) if "\x00P" in tkeys else 0
    vocab = uni_all.filter(pc.invert(sentinel))
    if vocab.num_rows > vocab_cap:
        raise ValueError(
            f"collocations_pmi: vocabulary {vocab.num_rows} exceeds "
            f"vocab_cap={vocab_cap} — prune the analyzer or raise the cap")
    if vocab.num_rows == 0 or n_pairs == 0:
        return out_schema.empty_table()
    vterm = np.asarray(vocab["key"].to_pylist(), dtype=object)
    vcnt = vocab["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vterm, kind="stable")
    vterm, vcnt = vterm[order], vcnt[order]
    vref = ray.put((vterm, vcnt))
    t_d = np.float64(n_tokens)
    p_d = np.float64(n_pairs)

    def _head(t: pa.Table) -> pa.Table:
        """Exact top-k under (score_q DESC, w1 ASC, w2 ASC)."""
        idx = np.lexsort((
            np.asarray(t["w2"].to_pylist(), dtype=object),
            np.asarray(t["w1"].to_pylist(), dtype=object),
            -t["score_q"].to_numpy(zero_copy_only=False)))[:k]
        return t.take(pa.array(idx))

    # ---- pass B: score bigram rows where they sit; ≤ k candidates/block
    def score_part(b: pa.Table) -> pa.Table:
        keys = b["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        bg = b.filter(pc.match_substring(keys, SEP))
        if bg.num_rows == 0:
            return out_schema.empty_table()
        c = bg["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = c >= min_count
        if not sel.any():
            return out_schema.empty_table()
        bg = bg.filter(pa.array(sel))
        c = c[sel]
        split = pc.split_pattern(bg["key"], SEP)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        w1 = np.asarray(pc.list_element(split, 0).to_pylist(), dtype=object)
        w2 = np.asarray(pc.list_element(split, 1).to_pylist(), dtype=object)
        vt, vc = ray.get(vref)
        r1 = np.searchsorted(vt, w1)
        r2 = np.searchsorted(vt, w2)
        r1[r1 == len(vt)] = 0
        r2[r2 == len(vt)] = 0
        if not ((vt[r1] == w1).all() and (vt[r2] == w2).all()):
            raise KeyError(
                "collocations_pmi: bigram component absent from the "
                "unigram vocabulary — inconsistent aggregate?")
        # the ONE quantization — parenthesization mirrored by the SQL twin
        num = (c.astype(np.float64) * t_d) * t_d
        den = (p_d * vc[r1].astype(np.float64)) * vc[r2].astype(np.float64)
        score_q = np.floor(np.log2(num / den) * quant + 0.5).astype(np.int64)
        return _head(pa.table({
            "w1": pa.array(w1, type=pa.string()),
            "w2": pa.array(w2, type=pa.string()),
            "pair_count": pa.array(c),
            "score_q": pa.array(score_q)}).cast(out_schema))

    cand = [t for t in ray.get(table_refs(
        agg.map_batches(score_part, batch_format="pyarrow")))
        if t.num_rows and "w1" in t.column_names]
    return _head(concat_cast(cand, out_schema))
