"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick the raw-corpus documents that look most like a
target domain, by importance weights under two bag-of-hashed-n-gram
models.

The published recipe: featurize every document as counts of hashed
unigrams + bigrams (10k buckets in the paper), fit categorical
distributions ``p`` (target) and ``q`` (raw) over the buckets, weight
each raw document by ``log p(doc) − log q(doc) = Σ_features
(log p_b − log q_b)``, then resample.  This implementation keeps the
estimator and replaces the paper's Gumbel-top-k draw with the
deterministic top-k by weight (ties → smallest id) — reproducible
across runs/partitionings, which the probabilistic draw is not; a
seeded-noise variant would bolt onto the same weights column.

Determinism/oracle contract (the ``lm_surprisal_scores`` discipline):
each bucket's two surprisals quantize ONCE to integers —
``qs = floor(−log2((c_b + 1) / (C + B)) · quant + 0.5)`` under add-one
smoothing — and the per-bucket log-ratio is their exact int64
difference ``lrq_b = qs_raw(b) − qs_target(b)`` (positive ⇔ the bucket
is more probable under the target).  Per-document weights are exact
integer sums of ``lrq`` over feature occurrences, so block geometry
cannot move a weight, and a DuckDB twin (driver query ``dsir_select``)
recomputes the identical table from the same FNV-1a + splitmix64
feature hash the split/quota/temperature oracles already share.

Shape (combiner discipline, two streaming passes + a candidates-only
top-k):

- pass 1 over raw and over target: per-batch hashed-bucket
  ``np.bincount`` partials → nonzero ``(bkt, c)`` rows → ONE
  ``groupby(bkt).sum()`` whose exchange is ≤ ``n_buckets`` rows per
  block (the bucket table is the model — fixed size by construction,
  unlike a vocabulary).
- driver: build the ``lrq`` int64 array (``n_buckets`` entries,
  ~64 KiB) once, broadcast via ``ray.put``.
- pass 2 over raw: one tokenize + hash + ``np.bincount(weights=…)``
  per batch — shuffle-free ``(id, n_feats, dsir_wq)``.
- selection: ``grouped_topk`` under a constant group — each block
  contributes ≤ k candidate rows, the driver folds candidates only.

At 100 TB the two corpus passes stream with backpressure, nothing
corpus-sized reaches the driver, and the only broadcast is the fixed
64 KiB bucket table (vs the reference engine's always-resident Postgres
statistics — mv_books_dc.sql builds its stats table once and reuses it
the same way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer
from ..functions.arrowutil import concat_cast, table_refs
from ..functions.textstats import mix64, token_hashes

# feature sum bound: |lrq| ≤ 64·quant (a probability can't be smaller than
# 1/(C+B) ≥ 2⁻⁶⁴ here), so a doc needs > 2⁴⁰ features before an integer-
# valued float64 bincount sum could round — far past any real document.
_BKT_SCHEMA = pa.schema([("bkt", pa.int64()), ("c", pa.int64())])


def hashed_feature_buckets(
    texts: pa.Array | pa.ChunkedArray, n_buckets: int,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket_ids, doc_index) of the hashed unigram+bigram features of a
    string column — ``bucket = splitmix64(FNV-1a64(feature)) % n_buckets``
    with namespaced feature strings ``"u|{t}"`` / ``"b|{t1} {t2}"`` (the
    prefix keeps a unigram from ever colliding with itself as half a
    bigram).  doc_index is nondecreasing; both arrays are empty for empty
    input.  Bigrams never cross document boundaries."""
    terms, doc_index, _ = analyzer.tokenize_column(texts)
    if len(terms) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    uni = np.asarray("u|", dtype=object) + terms
    adj = doc_index[1:] == doc_index[:-1]
    if adj.any():
        big = (np.asarray("b|", dtype=object) + terms[:-1][adj]
               + " " + terms[1:][adj])
        feats = np.concatenate([uni, big])
        didx = np.concatenate([doc_index, doc_index[:-1][adj]])
        # keep doc_index nondecreasing (reduceat/bincount callers rely on
        # per-doc grouping; stable sort preserves u-before-b within a doc)
        order = np.argsort(didx, kind="stable")
        feats, didx = feats[order], didx[order]
    else:
        feats, didx = uni, doc_index
    h = mix64(token_hashes(list(feats)))
    return (h % np.uint64(n_buckets)).astype(np.int64), didx


def _bucket_counts(
    ds: rd.Dataset, text_col: str, n_buckets: int, analyzer: Analyzer,
) -> tuple[np.ndarray, int]:
    """Dense feature-bucket histogram of a corpus: (int64[n_buckets], total
    features).  One streaming pass; the exchange carries ≤ n_buckets
    ``(bkt, c)`` rows per block into one bounded groupby."""
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _BKT_SCHEMA.empty_table()
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            return _BKT_SCHEMA.empty_table()
        bkt, _ = hashed_feature_buckets(texts, n_buckets, analyzer)
        if len(bkt) == 0:
            return _BKT_SCHEMA.empty_table()
        cnt = np.bincount(bkt, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bkt": pa.array(nz, type=pa.int64()),
                         "c": pa.array(cnt[nz], type=pa.int64())})

    agg = (ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("bkt").sum("c"))
    tabs = [t for t in ray.get(table_refs(agg))
            if t.num_rows and "bkt" in t.column_names]
    out = np.zeros(n_buckets, dtype=np.int64)
    if tabs:
        t = pa.concat_tables(
            [x.select(["bkt", "sum(c)"]) for x in tabs])
        out[t["bkt"].to_numpy(zero_copy_only=False)] = \
            t["sum(c)"].to_numpy(zero_copy_only=False)
    return out, int(out.sum())


def dsir_log_ratios(
    raw_counts: np.ndarray, target_counts: np.ndarray, *, quant: int,
) -> np.ndarray:
    """Quantized per-bucket importance log-ratios
    ``lrq_b = qs_raw(b) − qs_target(b)`` with
    ``qs = floor(−log2((c+1)/(C+B)) · quant + 0.5)`` (add-one smoothing;
    B = len(counts)).  Each surprisal rounds ONCE — the float64 expression
    shape the DuckDB twin mirrors term for term."""
    b = len(raw_counts)

    def qs(c: np.ndarray) -> np.ndarray:
        tot = np.float64(int(c.sum()) + b)
        return np.floor(-np.log2((c + 1).astype(np.float64) / tot)
                        * quant + 0.5).astype(np.int64)

    return qs(raw_counts) - qs(target_counts)


def dsir_weights(
    raw: rd.Dataset, target: rd.Dataset, text_col: str, id_col: str, *,
    n_buckets: int = 8192, quant: int = 1024,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> rd.Dataset:
    """Per-document DSIR importance weights of ``raw`` toward ``target``:
    ``(id, n_feats, dsir_wq)`` with ``dsir_wq = Σ_features lrq(bucket)``
    (exact int64; higher ⇒ more target-like).  Token-less documents get
    ``n_feats = 0, dsir_wq = 0``.  Raises if the target has no features —
    an all-smoothing target model would silently rank by raw rarity
    alone."""
    raw_c, _raw_tot = _bucket_counts(raw, text_col, n_buckets, analyzer)
    tgt_c, tgt_tot = _bucket_counts(target, text_col, n_buckets, analyzer)
    if tgt_tot == 0:
        raise ValueError(
            "dsir_weights: target corpus has no features — importance "
            "weights against a pure-smoothing model are meaningless")
    lrq_ref = ray.put(dsir_log_ratios(raw_c, tgt_c, quant=quant))
    sch = raw.schema().base_schema
    id_type = sch.field(id_col).type

    def score(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], type=id_type),
                             "n_feats": pa.array([], type=pa.int64()),
                             "dsir_wq": pa.array([], type=pa.int64())})
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        nfeat = np.zeros(n, dtype=np.int64)
        wq = np.zeros(n, dtype=np.int64)
        if not pa.types.is_null(texts.type):
            bkt, didx = hashed_feature_buckets(texts, n_buckets, analyzer)
            if len(bkt):
                lrq = ray.get(lrq_ref)
                nfeat = np.bincount(didx, minlength=n).astype(np.int64)
                # integer-valued float64 sums are exact here (see module
                # bound note); cast back is lossless
                wq = np.bincount(didx, weights=lrq[bkt].astype(np.float64),
                                 minlength=n).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "n_feats": pa.array(nfeat),
                         "dsir_wq": pa.array(wq)})

    return raw.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def _top_w(t: pa.Table, id_col: str, k: int) -> pa.Table:
    """First ``k`` rows under (dsir_wq DESC, id ASC) — the selection's
    total order; ties at the boundary cut identically everywhere."""
    if t.num_rows <= k:
        return t
    return t.sort_by([("dsir_wq", "descending"),
                      (id_col, "ascending")]).slice(0, k)


def dsir_select(
    raw: rd.Dataset, target: rd.Dataset, text_col: str, id_col: str, *,
    k: int, n_buckets: int = 8192, quant: int = 1024,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> pa.Table:
    """Deterministic DSIR selection: the ``k`` most target-like raw
    documents by ``(dsir_wq DESC, id ASC)``.  Returns
    ``(id, n_feats, dsir_wq)`` sorted by id.  Token-less documents are
    EXCLUDED: their neutral weight 0 would outrank every genuinely
    scored document whenever weights are negative (typical — smoothing
    dilutes a small target model), and an empty document is never what
    "most target-like" means.  Combiner-shaped: each block contributes
    ≤ k candidate rows (one in-block sort+head), the driver folds
    candidates only — the weights dataset never materializes and pass 2
    runs exactly once."""
    import pyarrow.compute as pc

    w = dsir_weights(raw, target, text_col, id_col,
                     n_buckets=n_buckets, quant=quant, analyzer=analyzer)
    out_schema = pa.schema([
        (id_col, raw.schema().base_schema.field(id_col).type),
        ("n_feats", pa.int64()), ("dsir_wq", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        return _top_w(t.filter(pc.greater(t["n_feats"], 0)), id_col, k)

    parts = [t for t in ray.get(table_refs(
        w.map_batches(partial, batch_format="pyarrow"))) if t.num_rows]
    if not parts:
        return out_schema.empty_table()
    folded = _top_w(concat_cast(parts, out_schema), id_col, k)
    return folded.sort_by([(id_col, "ascending")])
