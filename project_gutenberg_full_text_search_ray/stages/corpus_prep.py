"""Corpus-preparation operators for LLM training-data pipelines.

* ``frequent_span_scrub`` — repeated-content (boilerplate) removal in the
  CCNet / RefinedWeb style, at fixed token-window granularity: a doc is cut
  into non-overlapping spans of ``span_tokens`` analyzer tokens, and every
  span whose cross-document frequency reaches ``max_df_frac`` of the corpus
  is dropped; the doc is reassembled from the surviving spans in order.
  Two streaming passes over the corpus:
    1. per-batch partial span df counts (a span counts ONCE per doc) →
       span-vocabulary-sized ``groupby().sum()`` → the small frequent-span
       set is collected and broadcast with ``ray.put``;
    2. one more pass rebuilds each doc from its non-frequent spans.
  The pass-1 exchange carries (span, partial_df) aggregates only — bounded
  by per-batch span vocabulary, never document text; pass 2 is shuffle-free.

* ``pack_sequences`` — token-budget sequence packing ("concat then chunk",
  the standard LLM pre-training packing): docs ordered by id are laid out
  end-to-end and cut into consecutive bins of ``capacity`` tokens; a doc's
  ``pack_id`` is its exclusive running-token-total // capacity.  Distributed
  prefix sum: per-bucket (doc_id // bucket_size) token sums → driver-side
  exclusive prefix over the tiny bucket table → per-bucket vectorized
  cumsum.  Exchanges carry (doc_id, n_tokens) only — never text.

* ``contamination_flags`` — benchmark decontamination: flag documents that
  share ≥ ``min_hits`` distinct k-gram shingles with a (small) benchmark /
  eval set — the n-gram-overlap contamination check LLM training corpora
  run before training.  The benchmark's shingle-hash set is built once on
  the driver (benchmarks are vocabulary-sized), broadcast with ``ray.put``,
  and every batch does ONE vectorized ``np.isin`` over its flat shingle
  stream — completely shuffle-free.

All operators are deterministic and DuckDB-oracled end-to-end
(pipelines/driver_api.py: ``boilerplate_scrub``, ``pack_sequences``,
``contamination_check``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER


def _doc_spans(texts: pa.Array | pa.ChunkedArray, span_tokens: int):
    """Per-row non-overlapping token spans: returns (span_strings ndarray,
    row_index int64 ndarray, window_index int64 ndarray), span-major in
    (row, window) order.  Vectorized tokenize; the span join is one pandas
    groupby-join over the flat token stream."""
    terms, doc_idx, pos = DEFAULT_ANALYZER.tokenize_column(texts)
    if len(terms) == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z
    win = pos.astype(np.int64) // span_tokens
    s = pd.Series(terms, dtype=object)
    joined = s.groupby([doc_idx, win], sort=True).agg(" ".join)
    rows = joined.index.get_level_values(0).to_numpy(dtype=np.int64)
    wins = joined.index.get_level_values(1).to_numpy(dtype=np.int64)
    return joined.to_numpy(dtype=object), rows, wins


def frequent_span_scrub(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    span_tokens: int = 2,
    max_df_frac: float = 0.05,
) -> rd.Dataset:
    """Drop every ``span_tokens``-token span appearing in ≥ ``max_df_frac``
    of docs; return a streaming Dataset of (id, clean_text) for the whole
    input, '' when every span of a doc was frequent (or the doc had no
    tokens).  Nothing corpus-sized touches the driver: the only collected
    intermediate is the frequent-span set, which is bounded by
    1/max_df_frac × spans-per-doc (a span needs df ≥ max_df_frac·N to
    qualify, so at most Σspans/(max_df_frac·N) ≈ spans_per_doc/max_df_frac
    distinct spans can be frequent — small by construction)."""
    n_docs = ds.count()
    min_df = max(1, math.ceil(max_df_frac * n_docs))

    def partial_df(batch: pa.Table) -> pa.Table:
        spans, rows, _ = _doc_spans(batch[text_col], span_tokens)
        if len(spans) == 0:
            return pa.table({"span": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        # a span counts once per doc: distinct (row, span)
        uniq = pd.DataFrame({"r": rows, "s": spans}).drop_duplicates()
        cnt = uniq.groupby("s", sort=False).size()
        return pa.table({"span": pa.array(cnt.index.to_numpy(dtype=object), type=pa.string()),
                         "df": pa.array(cnt.to_numpy(), type=pa.int64())})

    # pass 1 needs only the text: spans are deduped by the per-batch row
    # index from tokenize_column, so the id column never leaves storage here
    df_tbl = (
        ds.select_columns([text_col])
        .map_batches(partial_df, batch_format="pyarrow")
        .groupby("span")
        .sum("df")
    )
    import pyarrow.compute as pc

    hot = df_tbl.map_batches(
        lambda b: b.filter(pc.greater_equal(b["sum(df)"], min_df)).select(["span"]),
        batch_format="pyarrow",
    ).take_all()
    hot_ref = ray.put(frozenset(r["span"] for r in hot))

    def scrub(batch: pa.Table) -> pa.Table:
        frequent = ray.get(hot_ref)
        spans, rows, wins = _doc_spans(batch[text_col], span_tokens)
        out = np.full(batch.num_rows, "", dtype=object)
        if len(spans):
            keep = np.fromiter((s not in frequent for s in spans),
                               dtype=bool, count=len(spans))
            kept = pd.Series(spans[keep], dtype=object)
            if len(kept):
                # spans are already (row, window)-ordered
                joined = kept.groupby(rows[keep], sort=True).agg(" ".join)
                out[joined.index.to_numpy(dtype=np.int64)] = joined.to_numpy(dtype=object)
        return pa.table({id_col: batch[id_col],
                         "clean_text": pa.array(out, type=pa.string())})

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(scrub, batch_format="pyarrow")
    )


def pack_sequences(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    capacity: int = 512,
    bucket_size: int = 256,
) -> rd.Dataset:
    """Streaming Dataset of (id, n_tokens, pack_id): concat-then-chunk
    packing over docs ordered by id — pack_id = exclusive running token
    total // capacity (a doc whose tokens straddle a boundary belongs to the
    bin its first token lands in).  ``bucket_size`` is a pure implementation
    knob (result-invariant, tested): the driver holds one row per id-bucket
    for the exclusive prefix, so size it ≈ N/10⁴–10⁶ at scale; a two-level
    prefix (bucket-of-buckets) extends this past ~10¹⁰ docs if ever needed."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        # arrow-native tokenize: only the doc-index array is needed, terms
        # stay Arrow (no object-dtype string round-trip)
        _, di, _ = DEFAULT_ANALYZER.tokenize_column_arrow(batch[text_col])
        n = np.bincount(di, minlength=batch.num_rows).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: batch[id_col],
                         "n_tokens": pa.array(n),
                         "bucket": pa.array(ids // bucket_size, type=pa.int64())})

    # materialized ON PURPOSE: consumed twice (bucket sums now, pack-id
    # assignment later) and re-running the lineage would re-read + re-tokenize
    # the whole corpus; the materialized form is 3 int columns per doc
    counted = (
        ds.select_columns([id_col, text_col])
        .map_batches(count_tokens, batch_format="pyarrow")
        .materialize()
    )
    # tiny table: one row per id-bucket → exclusive prefix on the driver
    bsums = counted.groupby("bucket").sum("n_tokens").take_all()
    bsums.sort(key=lambda r: r["bucket"])
    offsets, run = {}, 0
    for r in bsums:
        offsets[r["bucket"]] = run
        run += r["sum(n_tokens)"]
    off_ref = ray.put(offsets)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = group.sort_values(id_col)
        prev = off[int(g["bucket"].iloc[0])] + g["n_tokens"].cumsum() - g["n_tokens"]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": g["n_tokens"].to_numpy(),
            "pack_id": (prev.to_numpy() // capacity).astype(np.int64),
        })

    return counted.groupby("bucket").map_groups(assign, batch_format="pandas")


def bench_shingle_hashes(bench_texts: list[str], k_shingle: int = 3,
                         analyzer=None) -> np.ndarray:
    """Sorted distinct k-gram shingle hashes of a benchmark set — the SAME
    rolling polynomial over FNV token hashes as the dedup candidate
    generator (functions/textstats.shingle_hashes), so the DuckDB oracle can
    reproduce both sides bit-exactly."""
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..functions.textstats import shingle_hashes

    an = analyzer or DEFAULT_ANALYZER
    parts = [shingle_hashes(an.tokenize(t or ""), k_shingle)
             for t in bench_texts]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def contamination_flags(
    ds: rd.Dataset, text_col: str, id_col: str, bench_texts: list[str], *,
    k_shingle: int = 3, min_hits: int = 1, analyzer=None,
) -> rd.Dataset:
    """Benchmark decontamination (n-gram overlap): (id, n_hits) for every
    document sharing ≥ ``min_hits`` DISTINCT k-gram shingles with the
    benchmark set.  The bench shingle-hash set is driver-built (benchmarks
    are small), broadcast once via ``ray.put``, and each batch runs one
    vectorized ``np.isin`` over its flat per-doc-distinct shingle stream —
    no shuffle, no text movement, O(batch shingles × log bench)."""
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..functions.textstats import shingle_hashes_column

    an = analyzer or DEFAULT_ANALYZER
    bench_ref = ray.put(bench_shingle_hashes(bench_texts, k_shingle, an))

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        fp, docs = shingle_hashes_column(batch[text_col], k_shingle, an)
        hit = np.isin(fp, bench) if len(fp) else np.empty(0, dtype=bool)
        n = (np.bincount(docs[hit], minlength=batch.num_rows)
             if hit.any() else np.zeros(batch.num_rows, dtype=np.int64))
        idx = np.flatnonzero(n >= min_hits)
        return pa.table({id_col: batch[id_col].take(pa.array(idx)),
                         "n_hits": pa.array(n[idx].astype(np.int64),
                                            type=pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def split_assign(
    ds: rd.Dataset, id_col: str, *, fractions: dict[str, float],
    seed: int = 17,
) -> rd.Dataset:
    """Deterministic train/val/test split assignment — (id, split) per row.

    split = the named bucket whose cumulative fraction interval contains
    splitmix64(FNV-1a64(f"{seed}|{id}")) / 2^64 (the splitmix finalizer
    fixes FNV's non-uniform high bits over short decimal ids — same fix the
    KMV sketch needed).  Purely a function of the id and seed:
    stable across runs, partitionings and corpus growth (a doc never changes
    split when new data arrives — the property random_sample lacks), and
    shuffle-free (one vectorized hash pass per batch).  Fractions must sum
    to 1 (± float eps); the last bucket absorbs the remainder interval."""
    from ..functions.textstats import mix64, token_hashes

    names = list(fractions)
    thresholds = split_thresholds(fractions)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        strs = [f"{seed}|{v}" for v in ids.to_pylist()]
        h = mix64(token_hashes(strs))  # uint64, full-width uniform
        # bucket i <=> h < T_i, via integer-exact searchsorted (the SQL
        # oracle compares the SAME integer literals — no float boundaries)
        bucket = np.searchsorted(thresholds, h, side="right")
        bucket = np.minimum(bucket, len(names) - 1)
        out = np.asarray(names, dtype=object)[bucket]
        return pa.table({id_col: batch[id_col],
                         "split": pa.array(out, type=pa.string())})

    return ds.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


def split_thresholds(fractions: dict[str, float]) -> np.ndarray:
    """Integer hash-space thresholds (uint64, ascending) shared by
    ``split_assign`` and its SQL oracle: bucket i ⇔ h < T_i; the last bucket
    absorbs the rounding remainder."""
    fracs = np.asarray(list(fractions.values()), dtype=np.float64)
    if (fracs < 0).any() or abs(fracs.sum() - 1.0) > 1e-9:
        raise ValueError(f"fractions must be >= 0 and sum to 1, got {fractions}")
    cums = np.minimum(np.cumsum(fracs), 1.0)
    t = [min(int(c * float(1 << 64)), (1 << 64) - 1) for c in cums]
    t[-1] = (1 << 64) - 1
    return np.asarray(t, dtype=np.uint64)
