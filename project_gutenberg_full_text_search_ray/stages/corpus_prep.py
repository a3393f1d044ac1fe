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
  prefix sum (the sessionize/asof shape): one global sort of (doc_id,
  n_tokens), per-block summaries → driver-side exclusive prefix over the
  O(blocks) summary table → per-block vectorized cumsum.  Exchanges carry
  (doc_id, n_tokens) only — never text.

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
from ..functions.arrowutil import table_refs


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
    from ..functions.textstats import token_hashes

    n_docs = ds.count()
    min_df = max(1, math.ceil(max_df_frac * n_docs))

    def partial_df(batch: pa.Table) -> pa.Table:
        spans, rows, _ = _doc_spans(batch[text_col], span_tokens)
        if len(spans) == 0:
            return pa.table({"span_h": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        # spans are keyed by their 64-bit FNV hash from here on: the pass-1
        # exchange carries (hash, partial_df) — 16 bytes/row instead of the
        # span text — and the scrub pass tests membership with one np.isin.
        # A cross-span collision (~vocab²/2⁶⁴) at worst drops one rare span.
        h = token_hashes(spans.tolist()).view(np.int64)
        # a span counts once per doc: distinct (row, hash)
        uniq = pd.DataFrame({"r": rows, "h": h}).drop_duplicates()
        cnt = uniq.groupby("h", sort=False).size()
        return pa.table({"span_h": pa.array(cnt.index.to_numpy(), type=pa.int64()),
                         "df": pa.array(cnt.to_numpy(), type=pa.int64())})

    # pass 1 needs only the text: spans are deduped by the per-batch row
    # index from tokenize_column, so the id column never leaves storage here
    df_tbl = (
        ds.select_columns([text_col])
        .map_batches(partial_df, batch_format="pyarrow")
        .groupby("span_h")
        .sum("df")
    )
    import pyarrow.compute as pc

    hot = df_tbl.map_batches(
        lambda b: b.filter(pc.greater_equal(b["sum(df)"], min_df)).select(["span_h"]),
        batch_format="pyarrow",
    ).take_all()
    hot_ref = ray.put(np.sort(np.fromiter(
        (r["span_h"] for r in hot), dtype=np.int64, count=len(hot))))

    def scrub(batch: pa.Table) -> pa.Table:
        frequent = ray.get(hot_ref)
        spans, rows, wins = _doc_spans(batch[text_col], span_tokens)
        out = np.full(batch.num_rows, "", dtype=object)
        if len(spans):
            h = token_hashes(spans.tolist()).view(np.int64)
            keep = ~np.isin(h, frequent)
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
    bucket_size: int | None = None,
) -> rd.Dataset:
    """Streaming Dataset of (id, n_tokens, pack_id): concat-then-chunk
    packing over docs ordered by id — pack_id = exclusive running token
    total // capacity (a doc whose tokens straddle a boundary belongs to the
    bin its first token lands in).

    Shape (the sessionize/asof distributed-prefix pattern,
    stages/sessionize.py): tokenize → ONE global ``sort(id)`` exchange
    carrying (id, n_tokens) only — never text — then two vectorized passes
    over the materialized sorted blocks: (1) one summary row per block
    (first id, block token sum) → the driver orders the O(blocks) summaries
    and computes an exclusive prefix; (2) per block, offset + ``np.cumsum``
    assigns every pack id.  No per-group Python calls: work per block is one
    cumsum regardless of corpus size (the r3 implementation's per-id-bucket
    ``map_groups`` was N/bucket_size Python calls + arrow↔pandas round
    trips — corpus-proportional interpreter overhead).

    ``bucket_size`` is accepted for backward compatibility and IGNORED: it
    was a pure implementation knob of the r3 bucketed prefix (results never
    depended on it — the invariance is pinned by tests); the sort-based
    implementation has no buckets.  Ids are assumed unique (doc ids)."""
    del bucket_size  # deprecated no-op, see docstring
    id_type = ds.schema().base_schema.field(id_col).type

    def count_tokens(batch: pa.Table) -> pa.Table:
        # arrow-native tokenize: only the doc-index array is needed, terms
        # stay Arrow (no object-dtype string round-trip)
        _, di, _ = DEFAULT_ANALYZER.tokenize_column_arrow(batch[text_col])
        n = np.bincount(di, minlength=batch.num_rows).astype(np.int64)
        return pa.table({id_col: batch[id_col], "n_tokens": pa.array(n)})

    # materialized ON PURPOSE: the sorted blocks are consumed twice (summary
    # pass now, pack-id assignment later) and re-running the lineage would
    # re-read + re-tokenize + re-sort the corpus; the materialized form is
    # two int columns per doc
    srt = (
        ds.select_columns([id_col, text_col])
        .map_batches(count_tokens, batch_format="pyarrow")
        .sort(id_col)
        .materialize()
    )

    # ---- pass 1: one (first_id, block token sum) row per block → driver
    # exclusive prefix over the O(blocks) summary table
    sum_schema = pa.schema([("first_id", id_type), ("block_sum", pa.int64())])

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return sum_schema.empty_table()
        n = np.asarray(b["n_tokens"].to_numpy(zero_copy_only=False))
        return pa.table({"first_id": b[id_col].slice(0, 1),
                         "block_sum": pa.array([int(n.sum())], type=pa.int64())})

    stabs = [t for t in ray.get(table_refs(
        srt.map_batches(summarize, batch_size=None,
                        batch_format="pyarrow")))
        if t.num_rows and "first_id" in t.column_names]
    offsets, run = {}, 0
    if stabs:
        summ = pa.concat_tables(stabs)
        import pyarrow.compute as pc

        summ = summ.take(pc.sort_indices(summ["first_id"])).to_pylist()
        for s in summ:  # sort made block id-ranges disjoint
            offsets[s["first_id"]] = run
            run += s["block_sum"]
    off_ref = ray.put(offsets)

    out_schema = pa.schema([(id_col, id_type), ("n_tokens", pa.int64()),
                            ("pack_id", pa.int64())])

    # ---- pass 2: per block, offset + vectorized exclusive cumsum
    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        off = ray.get(off_ref)[b[id_col][0].as_py()]
        n = np.asarray(b["n_tokens"].to_numpy(zero_copy_only=False))
        prev = off + np.cumsum(n, dtype=np.int64) - n
        return pa.table({id_col: b[id_col], "n_tokens": b["n_tokens"],
                         "pack_id": pa.array(prev // capacity, type=pa.int64())})

    return srt.map_batches(assign, batch_size=None, batch_format="pyarrow")


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


def rate_threshold(rate: float) -> int:
    """Integer hash-space acceptance threshold shared by ``quota_sample``
    and its SQL oracle: keep ⇔ h < T(rate).  rate 1.0 maps to 2⁶⁴−1 (drops
    only the single all-ones hash, probability 2⁻⁶⁴ — the oracle compares
    the SAME literal, so the sides cannot diverge)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return min(int(rate * float(1 << 64)), (1 << 64) - 1)


def quota_sample(
    ds: rd.Dataset, id_col: str, group_col: str, *,
    rates: dict[str, float], seed: int = 17, default_rate: float = 0.0,
) -> rd.Dataset:
    """Deterministic per-group subsampling — the training-mix reweighting
    step (keep 50% of 'en', 10% of 'es', drop 'zh', ...): a row survives iff
    splitmix64(FNV-1a64(f"{seed}|{id}")) < rate[group]·2⁶⁴.

    Purely a function of (seed, id, the group's rate): stable under corpus
    growth and repartitioning (a kept doc stays kept when new data arrives —
    the property ``Dataset.random_sample`` lacks), shuffle-free (one
    vectorized hash pass + one ``index_in`` rate lookup per batch), and
    change-one-group-safe (retuning 'es' never resamples 'en').  Reuses
    split_assign's hash kernel; vary ``seed`` to decorrelate from the split
    coin.  Groups missing from ``rates`` — including NULL — use
    ``default_rate``.  Returns the surviving (id, group) rows."""
    import pyarrow.compute as pc

    from ..functions.textstats import mix64, token_hashes

    names = list(rates)
    th = np.asarray([rate_threshold(r) for r in rates.values()]
                    + [rate_threshold(default_rate)], dtype=np.uint64)
    name_arr = pa.array(names, type=pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if pa.types.is_null(g.type):
            idx = np.full(batch.num_rows, len(names), dtype=np.int64)
        else:
            if not (pa.types.is_string(g.type) or pa.types.is_large_string(g.type)):
                g = g.cast(pa.string())
            idx = pc.fill_null(pc.index_in(g, value_set=name_arr),
                               len(names)).to_numpy(zero_copy_only=False)
        h = mix64(token_hashes([f"{seed}|{v}" for v in ids.to_pylist()]))
        return batch.filter(pa.array(h < th[idx.astype(np.int64)]))

    return ds.select_columns([id_col, group_col]).map_batches(
        keep, batch_format="pyarrow")


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


# (pattern, replacement) order matters and is part of the operator's
# contract: emails first (an address containing digits+dots must not be
# half-eaten by the IP rule), then phones, then IPv4.  All three are RE2
# syntax — the engine (pyarrow re2), the DuckDB oracle (regexp_replace,
# also re2) and any future Rust/Go port evaluate them identically.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii_column(texts: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """(redacted_text, n_pii) for a string column — the C4/RefinedWeb-style
    PII scrub.  Sequential per-pattern pass; each pattern's hit count is
    taken on the text AS ALREADY REDACTED by the previous patterns (so an
    IP inside an e-mail address counts once, as the e-mail).  Pure
    ``pyarrow.compute`` re2 kernels — no Python per row."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_null(texts.type):
        return (pa.nulls(len(texts), type=pa.string()),
                np.zeros(len(texts), dtype=np.int64))
    cur = texts
    n_pii = np.zeros(len(texts), dtype=np.int64)
    for _, pattern, repl in PII_PATTERNS:
        hits = pc.count_substring_regex(cur, pattern).cast(pa.int64())
        n_pii += pc.fill_null(hits, 0).to_numpy(zero_copy_only=False)
        cur = pc.replace_substring_regex(cur, pattern, repl)
    return cur, n_pii


def redact_pii(
    ds: rd.Dataset, text_col: str, id_col: str, out_col: str = "clean_text",
) -> rd.Dataset:
    """PII redaction over a corpus → ``(id_col, out_col, n_pii)``.
    Shuffle-free single pass; DuckDB-oracled end-to-end (driver query
    ``pii_redact`` re-expresses the sequential re2 passes as nested
    ``regexp_replace(..., 'g')`` + ``regexp_extract_all`` counts)."""

    def scrub(batch: pa.Table) -> pa.Table:
        clean, n_pii = redact_pii_column(batch[text_col])
        return pa.table({id_col: batch[id_col], out_col: clean,
                         "n_pii": pa.array(n_pii)})

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pyarrow")


def chunk_documents(
    ds: rd.Dataset, text_col: str, id_col: str,
    chunk_tokens: int = 256, overlap: int = 0,
) -> rd.Dataset:
    """Sliding-window document chunking (RAG / long-context training prep):
    each doc's RAW space-split words are cut into windows of
    ``chunk_tokens`` words advancing by ``stride = chunk_tokens - overlap``;
    the last window is short rather than padded, and a doc never emits zero
    chunks.  Output ``(id_col, chunk_idx, chunk_text, n_words)``.

    Chunk count for w words: 1 if w <= chunk_tokens else
    1 + ceil((w - chunk_tokens) / stride) — every word is covered and no
    window starts past the text.  Raw split (not the analyzer) keeps the
    DuckDB list-slice oracle bit-exact (driver query ``chunk_docs``).

    Shuffle-free one-pass ``map_batches``; per batch the word stream is
    replicated per overlapping window with one fancy-index gather (memory
    factor chunk/stride, bounded by the overlap you asked for) and joined
    with ONE pandas groupby-join — the ``_doc_spans`` idiom."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        empty = pa.table({
            id_col: pa.array([], type=ids.type),
            "chunk_idx": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
            "n_words": pa.array([], type=pa.int64()),
        })
        n = len(texts)
        if n == 0 or pa.types.is_null(texts.type):
            return empty
        toks = pc.split_pattern(pc.coalesce(texts, pa.scalar("")), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.diff(offsets)
        words = np.asarray(toks.flatten().to_pylist(), dtype=object)
        n_chunks = np.where(w <= chunk_tokens, 1,
                            1 + (w - chunk_tokens + stride - 1) // stride)
        total = int(n_chunks.sum())
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        # chunk_idx = position within each doc's run (vectorized ranges)
        first = np.r_[0, np.cumsum(n_chunks)[:-1]]
        ci = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
        start = ci * stride
        length = np.minimum(start + chunk_tokens, w[doc_of]) - start
        # replicate the word stream per window: one flat gather
        flat_chunk = np.repeat(np.arange(total, dtype=np.int64), length)
        pos = np.arange(len(flat_chunk), dtype=np.int64) - \
            np.repeat(np.r_[0, np.cumsum(length)[:-1]], length)
        widx = offsets[doc_of][flat_chunk] + start[flat_chunk] + pos
        joined = pd.Series(words[widx], dtype=object) \
            .groupby(flat_chunk, sort=True).agg(" ".join)
        text_out = np.full(total, "", dtype=object)
        text_out[joined.index.to_numpy(dtype=np.int64)] = joined.to_numpy(dtype=object)
        return pa.table({
            id_col: ids.take(pa.array(doc_of)),
            "chunk_idx": pa.array(ci),
            "chunk_text": pa.array(text_out, type=pa.string()),
            "n_words": pa.array(length.astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        chunk, batch_format="pyarrow")


def normalize_text_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical text form (C4/CCNet-style): Unicode NFC composition →
    Unicode lowercase → ``\\s+`` collapsed to one space → space-trimmed.

    NFC runs through ``unicodedata`` with an ``is_normalized`` fast path —
    one cheap C quick-check per row, and real normalization only for the
    rare non-NFC rows (this build's ``pc.utf8_normalize(form="NFC")`` emits
    DECOMPOSED bytes — canonically equivalent but hash-different, unusable
    for dedup keys).  Lower/collapse run as Arrow kernels; the trim is
    space-only to match SQL ``trim`` exactly (the re2 ``\\s`` class already
    collapsed every ASCII whitespace run)."""
    import unicodedata

    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_null(texts.type):
        return pa.nulls(len(texts), type=pa.string())
    # ASCII is NFC by construction — one vectorized check skips the Python
    # pass entirely on the (overwhelmingly common) all-ASCII batch
    if pc.all(pc.fill_null(pc.string_is_ascii(texts), True)).as_py():
        arr = texts
    else:
        composed = [
            s if s is None or unicodedata.is_normalized("NFC", s)
            else unicodedata.normalize("NFC", s)
            for s in texts.to_pylist()
        ]
        arr = pa.array(composed, type=pa.string())
    return pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(arr), r"\s+", " "), " ")


def normalize_text(
    ds: rd.Dataset, text_col: str, id_col: str, out_col: str = "norm_text",
) -> rd.Dataset:
    """Text normalization over a corpus → ``(id_col, out_col, changed)``.
    Shuffle-free single pass; ``changed`` marks rows whose canonical form
    differs from the input (the usual pre-dedup signal).  DuckDB-oracled
    end-to-end (driver query ``normalize_text``:
    ``trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))``)."""
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        out = normalize_text_column(batch[text_col])
        changed = pc.fill_null(pc.not_equal(out, batch[text_col]), False)
        return pa.table({id_col: batch[id_col], out_col: out,
                         "changed": changed})

    return ds.select_columns([id_col, text_col]).map_batches(
        norm, batch_format="pyarrow")


def duplicate_spans(
    ds: rd.Dataset, text_col: str, id_col: str, *,
    win: int = 6, min_count: int = 2,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Cross-document duplicate-substring detection — the ExactSubstr dedup
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") at token-window granularity: every run of ``win`` consecutive
    analyzer tokens occurring ≥ ``min_count`` times ANYWHERE in the corpus
    (another document or a self-repeat) is reported, merged per document
    into maximal token spans ``(id, span_start, span_end, n_windows)`` —
    positions in analyzer-token space, ``span_end`` exclusive; overlapping
    and exactly-adjacent windows merge.

    Shape (all exchanges carry (hash, id, pos) integers — never text):

    1. windows — one tokenize pass per block; window hashes are the shared
       rolling w-gram polynomial (``textstats._rolling_poly`` — the
       fingerprinting/shingle fold, so the SQL oracle reuses the proven
       mod-2^64 twin).  Recomputed for pass 3 instead of materialized:
       windows are ~24 B/token, larger than the text itself.
    2. window df — ``groupby(h).count()`` over the 8 B/row hash column;
       hashes with total count ≥ ``min_count`` form the duplicated set.
    3. semi-join the windows stream against that set: broadcast
       sorted-int64 membership under ``broadcast_threshold`` ids (the
       apply_dedup route — no window row enters an exchange), else Ray
       Data's native inner join.
    4. span merge IS gap-sessionization (break when the next duplicated
       window starts more than ``win`` past the previous): the hit stream
       reuses ``stages.sessionize`` (user=id, ts=pos, gap=win) and one
       grouped Max/Count emits the merged spans.

    2⁻⁶⁴ window-hash collision risk, like every hash-keyed dedup here.
    Rows with a NULL id are dropped (a span must be attributable)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    from ..functions.textstats import _rolling_poly, token_hashes
    from .dedup import _join_args
    from .sessionize import sessionize

    if win < 1:
        raise ValueError(f"win must be >= 1, got {win}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    for reserved in ("pos", "h", "__pid"):
        if id_col == reserved:
            raise ValueError(f"id_col {id_col!r} collides with an internal column")
    id_type = ds.schema().base_schema.field(id_col).type
    out_schema = pa.schema([
        (id_col, id_type), ("span_start", pa.int64()),
        ("span_end", pa.int64()), ("n_windows", pa.int64())])

    def windows(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=id_type),
                          "pos": pa.array([], type=pa.int64()),
                          "h": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        batch = batch.filter(pc.is_valid(batch[id_col]))
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if batch.num_rows == 0 or pa.types.is_null(texts.type):
            return empty
        terms, doc_index, positions = DEFAULT_ANALYZER.tokenize_column(texts)
        if len(terms) < win:
            return empty
        th = token_hashes(list(terms))
        fp = _rolling_poly(th, win)
        n_win = len(th) - win + 1
        # a window is real only when it stays inside one document
        valid = doc_index[:n_win] == doc_index[win - 1:]
        fp, docs = fp[valid], doc_index[:n_win][valid]
        pos = positions[:n_win][valid].astype(np.int64)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids.take(pa.array(docs)),
                         "pos": pa.array(pos),
                         "h": pa.array(fp.view(np.int64))})

    def wins_ds() -> rd.Dataset:
        return ds.select_columns([id_col, text_col]).map_batches(
            windows, batch_format="pyarrow")

    # pass 2: duplicated window hashes (exchange = the pruned h column)
    dup = wins_ds().select_columns(["h"]).groupby("h").count().map_batches(
        lambda b: b.filter(pc.greater_equal(b["count()"], min_count))
        .select(["h"]),
        batch_format="pyarrow")
    from .dedup import _drop_empty_blocks

    dup = _drop_empty_blocks(dup)
    n_dup = dup.count()
    if n_dup == 0:
        return rd.from_arrow(out_schema.empty_table())

    if n_dup <= broadcast_threshold:
        tabs = [t for t in ray.get(table_refs(dup))
                if t.num_rows and "h" in t.column_names]
        keys = np.sort(pa.concat_tables(tabs)["h"]
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        kref = ray.put(keys)

        def member(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            ks = ray.get(kref)
            vals = batch["h"].to_numpy(zero_copy_only=False)
            at = np.searchsorted(ks, vals)
            at[at == len(ks)] = 0
            return batch.filter(pa.array(ks[at] == vals))

        hits = wins_ds().map_batches(member, batch_format="pyarrow")
    else:
        hits = wins_ds().join(dup, join_type="inner", on=("h",),
                              **_join_args())

    def addpid(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, "pos"])
        return t.append_column("__pid", t["pos"])

    sess = sessionize(hits.map_batches(addpid, batch_format="pyarrow"),
                      id_col, "pos", "__pid", gap_us=win)
    spans = sess.groupby([id_col, "session_id"]).aggregate(
        Max("__pid", alias_name="max_pos"), Count(alias_name="n_windows"))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "session_id" not in b.column_names:
            return out_schema.empty_table()
        return pa.table({
            id_col: b[id_col],
            "span_start": pc.cast(b["session_id"], pa.int64()),
            "span_end": pc.cast(pc.add(b["max_pos"], win), pa.int64()),
            "n_windows": pc.cast(b["n_windows"], pa.int64())})

    return spans.map_batches(finish, batch_format="pyarrow")


def lm_surprisal_scores(
    ds: rd.Dataset, text_col: str, id_col: str, *,
    quant: int = 1024, vocab_cap: int = 5_000_000,
    carry_cols: tuple[str, ...] = (),
) -> rd.Dataset:
    """Unigram-LM surprisal quality scoring — the CCNet-style "perplexity
    filter" (Wenzek et al. 2020) with the LM trained on the corpus itself:
    per document, the total and per-token information content under the
    corpus unigram distribution.  Low bits/token ⇒ stereotyped/boilerplate
    text; high ⇒ rare-token noise — the standard head/middle/tail quality
    split signal.

    Determinism/oracle contract: each DISTINCT token's surprisal is
    quantized ONCE to an integer — ``qb(t) = floor(−log2(c_t / C) · quant
    + 0.5)`` — and per-document scores are exact int64 sums of those
    integers, so block geometry cannot move a score; a DuckDB twin
    (driver query ``lm_quality_scores``) recomputes the same table.
    Output: ``(id, n_tokens, bits_q, bpt_q)`` with ``bpt_q = bits_q //
    n_tokens`` (NULL for token-less docs).

    Shape: pass 1 trains the LM — per-batch ``np.unique`` partial counts,
    one vocabulary-bounded ``groupby(term).sum()`` (the combiner
    discipline; the exchange carries (term, count), never text).  The
    (term → qb) table is built once on the driver and broadcast via
    ``ray.put`` — vocabulary tables ship to every worker, exactly how
    CCNet deploys its LMs; ``vocab_cap`` fails loudly instead of
    broadcasting an unbounded table.  Pass 2 scores each batch with one
    tokenize + sorted-vocab ``searchsorted`` gather + per-doc ``reduceat``
    sums — shuffle-free.

    ``carry_cols`` pass extra input columns through to the output
    unchanged (e.g. the language column a downstream per-group bucketing
    partitions on) — avoiding the corpus-sized re-join a separate
    (id → group) lookup would need."""
    import pyarrow.compute as pc

    sch = ds.schema().base_schema
    id_type = sch.field(id_col).type
    carry_cols = tuple(carry_cols)
    carry_types = {c: sch.field(c).type for c in carry_cols}

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            return empty
        terms, _, _ = DEFAULT_ANALYZER.tokenize_column(texts)
        if len(terms) == 0:
            return empty
        u, c = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(u, type=pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    counts = (ds.select_columns([text_col])
              .map_batches(partials, batch_format="pyarrow")
              .groupby("term").sum("c"))
    tabs = [t for t in ray.get(table_refs(counts))
            if t.num_rows and "term" in t.column_names]
    if not tabs:
        raise ValueError("lm_surprisal_scores: corpus has no tokens")
    vocab = pa.concat_tables(tabs)
    if vocab.num_rows > vocab_cap:
        raise ValueError(
            f"lm_surprisal_scores: vocabulary {vocab.num_rows} exceeds "
            f"vocab_cap={vocab_cap} — prune the analyzer or raise the cap")
    vterm = np.asarray(vocab["term"].to_pylist(), dtype=object)
    vc = vocab["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vterm, kind="stable")
    vterm, vc = vterm[order], vc[order]
    total = np.float64(int(vc.sum()))
    # ONE quantization per distinct token; everything downstream is int64
    qb = np.floor(-np.log2(vc.astype(np.float64) / total)
                  * quant + 0.5).astype(np.int64)
    vref = ray.put((vterm, qb))

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        zeros = np.zeros(n, dtype=np.int64)
        if n == 0:
            return pa.table(
                {id_col: pa.array([], type=id_type),
                 **{c: pa.array([], type=carry_types[c])
                    for c in carry_cols},
                 "n_tokens": pa.array([], type=pa.int64()),
                 "bits_q": pa.array([], type=pa.int64()),
                 "bpt_q": pa.array([], type=pa.int64())})
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            ntok = bits = zeros
        else:
            terms, doc_index, _ = DEFAULT_ANALYZER.tokenize_column(texts)
            ntok = np.bincount(doc_index, minlength=n).astype(np.int64)
            bits = zeros.copy()
            if len(terms):
                vt, vq = ray.get(vref)
                at = np.searchsorted(vt, terms)
                at[at == len(vt)] = 0
                if not (vt[at] == terms).all():
                    raise KeyError(
                        "lm_surprisal_scores: token absent from the trained "
                        "vocabulary — scoring a different dataset than the "
                        "LM was trained on?")
                tq = vq[at]
                # doc_index is nondecreasing (flat token stream in row
                # order): exact int64 per-doc sums via reduceat
                starts = np.flatnonzero(
                    np.r_[True, doc_index[1:] != doc_index[:-1]])
                bits[doc_index[starts]] = np.add.reduceat(tq, starts)
        nz = ntok > 0
        bpt = np.zeros(n, dtype=np.int64)
        bpt[nz] = bits[nz] // ntok[nz]
        return pa.table({id_col: batch[id_col],
                         **{c: batch[c] for c in carry_cols},
                         "n_tokens": pa.array(ntok),
                         "bits_q": pa.array(bits),
                         "bpt_q": pa.array(bpt, type=pa.int64(),
                                           mask=~nz)})

    return ds.select_columns(
        [id_col, text_col, *carry_cols]).map_batches(
        score, batch_format="pyarrow")


def temperature_rates(
    ds: rd.Dataset, group_col: str, *, alpha: float = 0.5,
) -> dict:
    """Per-group keep-rates for temperature-``alpha`` resampling — the
    multilingual-LM training-mix flattening step (sample language ℓ with
    probability ∝ p_ℓ^α, Conneau & Lample 2019; α=0.5 is the standard
    "square-root temperature").  Downsampling a group never touches
    another (the quota_sample property), so the whole mix retunes with
    one rate table.

    rate_g = (n_min / n_g)^(1-α) with n_min = the smallest non-NULL
    group's count: the smallest group keeps everything and larger groups
    downsample toward the temperature-flattened distribution.

    Oracle contract: at α=0.5 the rate is ``sqrt(n_min / n_g)`` — ONE
    correctly-rounded IEEE division + ONE correctly-rounded sqrt, so a
    SQL twin computing ``sqrt(CAST(n_min AS DOUBLE) / CAST(n_g AS
    DOUBLE))`` reproduces the exact float64, and the shared
    ``rate_threshold`` power-of-two scaling keeps the acceptance
    thresholds integer-identical.  Other α go through ``pow``, which
    IEEE does NOT require correctly rounded — fine for production, but a
    bit-exact cross-engine oracle should stick to α ∈ {0.5, 1.0}.

    Shape: per-batch partial counts (combiner) → one
    group-cardinality ``groupby().sum()`` → driver computes the tiny
    rate table.  Group cardinality must be bounded (enum-like — the
    quota_sample contract).  NULL groups are excluded (they get
    quota_sample's ``default_rate``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    gtype = ds.schema().base_schema.field(group_col).type

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col]).filter(pc.is_valid(b[group_col]))
        part = t.group_by([group_col]).aggregate([([], "count_all")])
        return pa.table({group_col: part[group_col].cast(gtype),
                         "c": part["count_all"].cast(pa.int64())})

    agg = (ds.select_columns([group_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).aggregate(Sum("c", alias_name="c")))
    schema = pa.schema([(group_col, gtype), ("c", pa.int64())])
    tabs = [t for t in ray.get(table_refs(agg))
            if t.num_rows and "c" in t.column_names]
    if not tabs:
        return {}
    from ..functions.arrowutil import concat_cast
    counts = concat_cast(tabs, schema)
    groups = counts[group_col].to_pylist()
    ns = counts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_min = np.float64(int(ns.min()))
    if alpha == 1.0:
        return {g: 1.0 for g in groups}
    if alpha == 0.5:
        rates = np.sqrt(n_min / ns.astype(np.float64))
    else:
        rates = np.power(n_min / ns.astype(np.float64),
                         np.float64(1.0 - alpha))
    return {g: float(r) for g, r in zip(groups, rates)}


def temperature_sample(
    ds: rd.Dataset, id_col: str, group_col: str, *,
    alpha: float = 0.5, seed: int = 17,
) -> rd.Dataset:
    """Temperature-α resampling of the corpus: :func:`temperature_rates`
    composed with :func:`quota_sample` — keep each group-g row iff
    splitmix64(FNV-1a64(f"{seed}|{id}")) < rate_g·2⁶⁴.  Deterministic,
    shuffle-free after the one tiny count aggregate, stable under
    repartitioning, and a kept doc stays kept when its group's count is
    unchanged.  NULL-group rows are dropped (no principled temperature
    weight exists for an unknown group)."""
    rates = temperature_rates(ds, group_col, alpha=alpha)
    return quota_sample(ds, id_col, group_col, rates=rates, seed=seed,
                        default_rate=0.0)


def token_budget_rates(
    ds: rd.Dataset, text_col: str, group_col: str, *, budget_tokens: int,
    analyzer=DEFAULT_ANALYZER,
) -> dict:
    """Per-group keep-rates that sample each group down to ``budget_tokens``
    analyzer tokens IN EXPECTATION — the "10 B tokens per domain"
    training-mix step (docs are kept whole; the hash coin makes the kept
    token mass concentrate tightly around rate·T_g).

    rate_g = min(1, budget_tokens / T_g) with T_g the group's total token
    count — one correctly-rounded IEEE division over two exact integers, so
    a SQL twin computing ``CAST(b AS DOUBLE) / CAST(T AS DOUBLE)`` derives
    the identical float64 and (via the shared ``rate_threshold``
    power-of-two scaling) identical integer acceptance thresholds.

    Shape: ONE streaming tokenize pass emitting per-batch (group, tokens)
    partials → one group-cardinality ``groupby().sum()`` → the tiny driver
    rate table.  Group cardinality must be bounded (the quota_sample
    contract); NULL groups are excluded (they get quota_sample's
    ``default_rate``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    gtype = ds.schema().base_schema.field(group_col).type

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], type=gtype),
                          "t": pa.array([], type=pa.int64())})
        t = b.select([group_col, text_col]).filter(pc.is_valid(b[group_col]))
        if t.num_rows == 0:
            return empty
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            ntok = np.zeros(t.num_rows, dtype=np.int64)
        else:
            _, doc_index, _ = analyzer.tokenize_column(texts)
            ntok = np.bincount(doc_index, minlength=t.num_rows).astype(
                np.int64)
        part = pa.table({group_col: t[group_col],
                         "n": pa.array(ntok)}).group_by(
            [group_col]).aggregate([("n", "sum")])
        return pa.table({group_col: part[group_col].cast(gtype),
                         "t": part["n_sum"].cast(pa.int64())})

    agg = (ds.select_columns([group_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).aggregate(Sum("t", alias_name="t")))
    schema = pa.schema([(group_col, gtype), ("t", pa.int64())])
    from ..functions.arrowutil import concat_cast, table_refs
    tabs = [t for t in ray.get(table_refs(agg))
            if t.num_rows and "t" in t.column_names]
    if not tabs:
        return {}
    counts = concat_cast(tabs, schema)
    out = {}
    for g, tg in zip(counts[group_col].to_pylist(),
                     counts["t"].to_pylist()):
        # a zero-token group keeps everything (nothing to budget away)
        out[g] = 1.0 if tg <= budget_tokens else (
            np.float64(budget_tokens) / np.float64(tg))
    return {g: float(r) for g, r in out.items()}


def token_budget_sample(
    ds: rd.Dataset, text_col: str, id_col: str, group_col: str, *,
    budget_tokens: int, seed: int = 37,
) -> rd.Dataset:
    """Token-budget training-mix resampling: :func:`token_budget_rates`
    composed with :func:`quota_sample` — keep each group-g row iff
    splitmix64(FNV-1a64(f"{seed}|{id}")) < rate_g·2⁶⁴, where rate_g
    targets ``budget_tokens`` kept tokens per group.  Deterministic,
    shuffle-free after the one tiny count aggregate, stable under
    repartitioning; NULL-group rows are dropped.  Returns the surviving
    (id, group) rows."""
    rates = token_budget_rates(ds, text_col, group_col,
                               budget_tokens=budget_tokens)
    return quota_sample(ds, id_col, group_col, rates=rates, seed=seed,
                        default_rate=0.0)


def perplexity_buckets(
    ds: rd.Dataset, text_col: str, id_col: str, group_col: str, *,
    quant: int = 1024, edges: tuple = (("head", 1 / 3), ("middle", 2 / 3)),
    tail_name: str = "tail",
) -> rd.Dataset:
    """CCNet-style per-language perplexity bucketing (Wenzek et al. 2020
    §4.4): score every document with the corpus unigram LM
    (:func:`lm_surprisal_scores`), cut each language at its surprisal
    percentiles, and label docs ``head`` (lowest bits/token — cleanest
    text), ``middle``, ``tail`` — the standard quality-tier signal a
    training mix samples from.

    Composition of two already-oracled kernels, each with the combiner
    discipline:
      1. ``lm_surprisal_scores`` (two streaming passes, vocabulary-sized
         exchange) with ``group_col`` carried through — materialized
         once as the tiny (id, group, bpt_q) table so the refinement
         passes of step 2 re-read blocks instead of re-tokenizing text;
      2. ``grouped_quantiles_unbounded`` over the integer ``bpt_q``
         (O(log range) passes over the materialized scores, O(groups ×
         n_buckets) exchange) — exact percentile_disc cut points per
         group;
      3. one shuffle-free labeling pass against the broadcast
         (group → cut points) table.

    Bucket rule (mirrored by the DuckDB twin): NULL ``bpt_q`` (token-less
    doc) → NULL bucket; else the first edge whose cut point is ≥ the
    doc's ``bpt_q``, else ``tail_name``.  Cut points are data values
    (percentile_disc), so every comparison is integer-exact.  Returns
    ``(id, group, bpt_q, bucket)``."""
    import pyarrow.compute as pc

    gtype = ds.schema().base_schema.field(group_col).type
    id_type = ds.schema().base_schema.field(id_col).type
    scores = lm_surprisal_scores(
        ds, text_col, id_col, quant=quant, carry_cols=(group_col,),
    ).materialize()

    from .topk import grouped_quantiles_unbounded
    qs = [(name, q) for name, q in edges]
    cuts = grouped_quantiles_unbounded(scores, group_col, "bpt_q", qs)
    # (group → [cut per edge, in edges order]); pct labels sort
    # alphabetically in the output, so index by name, not position
    cut_map: dict = {}
    for g, p, v in zip(cuts[group_col].to_pylist(),
                       cuts["pct"].to_pylist(),
                       cuts["val"].to_pylist()):
        cut_map.setdefault(g, {})[p] = v
    edge_names = [name for name, _ in edges]
    # per-group cut matrix for the vectorized labeling gather: row per
    # group (non-NULL groups first, the NULL group — if any — last),
    # plus an all-missing sentinel row for never-seen groups (unreachable
    # — the cuts derive from the same scores — but must not mislabel)
    nn_groups = [g for g in cut_map if g is not None]
    n_rows = len(nn_groups) + 2
    cuts_m = np.zeros((n_rows, len(edge_names)), dtype=np.int64)
    has_m = np.zeros((n_rows, len(edge_names)), dtype=bool)
    for r, g in enumerate(nn_groups + [None]):
        d = cut_map.get(g)
        if d is None:
            continue
        for j, name in enumerate(edge_names):
            v = d.get(name)
            if v is not None:
                cuts_m[r, j] = v
                has_m[r, j] = True
    null_row, miss_row = len(nn_groups), len(nn_groups) + 1
    thr_ref = ray.put((pa.array(nn_groups, type=gtype), cuts_m, has_m))

    out_schema = pa.schema([(id_col, id_type), (group_col, gtype),
                            ("bpt_q", pa.int64()),
                            ("bucket", pa.string())])
    names_arr = np.asarray(edge_names + [tail_name], dtype=object)

    def label(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        gset, cuts, has = ray.get(thr_ref)
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        isnull_g = pc.is_null(g).to_numpy(zero_copy_only=False)
        slot = pc.fill_null(pc.index_in(g, value_set=gset),
                            miss_row).to_numpy(zero_copy_only=False
                                               ).astype(np.int64)
        slot = np.where(isnull_g, null_row, slot)
        valid = pc.is_valid(b["bpt_q"]).to_numpy(zero_copy_only=False)
        v = pc.fill_null(b["bpt_q"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # first edge whose cut point is >= v, else tail — walk the
        # (bounded) edge list right-to-left, O(edges) vectorized passes
        lab = np.full(b.num_rows, len(edge_names), dtype=np.int64)
        for j in range(len(edge_names) - 1, -1, -1):
            hit = has[slot, j] & (v <= cuts[slot, j])
            lab = np.where(hit, j, lab)
        return pa.table({id_col: b[id_col], group_col: b[group_col],
                         "bpt_q": b["bpt_q"],
                         "bucket": pa.array(names_arr[lab],
                                            type=pa.string(),
                                            mask=~valid)})

    return scores.map_batches(label, batch_format="pyarrow")


def line_dedup(
    ds: rd.Dataset, text_col: str, id_col: str, *,
    sep: str = "\n", line_cap: int = 10_000_000,
    spill_dir: str | None = None,
) -> rd.Dataset:
    """CCNet-style duplicated-line removal: split every document on the
    LITERAL separator ``sep``, drop each line occurrence that is not the
    corpus-wide FIRST occurrence of that exact line (first = smallest
    ``(id, line_idx)``), and reassemble the survivors with ``sep`` — the
    paragraph-dedup pass every large crawl pipeline runs before training
    (CCNet/RefinedWeb drop duplicated paragraphs the same way).  Empty
    pieces (adjacent separators, leading/trailing) never participate and
    are never re-emitted; documents whose every line is empty or deduped
    emit no row (SQL GROUP BY semantics — driver query ``line_dedup``).

    Shape: pass 1 explodes lines per batch and exchanges
    ``(hash128(line), packed_first_seen)`` — 24 B per distinct line per
    batch, the ``exact_dedup`` discipline (line text never enters the
    shuffle); one distinct-line-sized ``groupby().min()`` picks winners.
    The test "is this occurrence the first?" is then pure integers: an
    occurrence's packed key ``id·2^20 + idx`` is globally unique, so
    occurrence-is-winner ⇔ packed ∈ winner set, and pass 2 is one
    shuffle-free ``map_batches`` over the original docs — re-split,
    ``np.isin`` against the sorted winner keys (8 B per distinct line),
    run-length reassembly via ``ListArray.from_arrays`` +
    ``binary_join``.  Up to ``line_cap`` winners the sorted key array
    broadcasts once via ``ray.put``; ABOVE the cap the keys spill to
    packed-sorted parquet and the corpus is sorted by id instead, so
    each rebuild batch covers a contiguous packed range and reads only
    its own row-group-pruned slice of the winner table (the
    IVF/zone-map pruned-read pattern — nothing winner-set-sized ever
    concentrates on the driver; both routes are row-identical, pytest).
    ``spill_dir`` names where the above-cap winner table lives — on a
    MULTI-NODE cluster pass a shared path/URI every worker can reach
    (S3/NFS; Ray's write_parquet and the pruned reads both take URIs);
    the local-tempdir default is single-node only and is reclaimed at
    interpreter exit (atexit, the simjoin spill-store contract — pass
    ``spill_dir`` to manage the lifetime yourself in long-lived
    drivers).  A 128-bit hash collision (~n²/2¹²⁸) at worst drops one
    duplicated-elsewhere line.

    Requires a UNIQUE integer id column (a primary key — duplicate ids
    make two occurrences share a packed key, so both would pass the
    winner test; in-batch duplicates raise, cross-batch uniqueness is
    the caller's contract exactly as for ``exact_dedup``'s keep_id)
    with ``|id| < 2^42`` and at most 2^20 lines per document (the
    packed-key envelope) — violations raise, including uint64 ids
    beyond int64 range (checked via a safe Arrow cast, never a
    wrapping ``astype``)."""
    import pyarrow.compute as pc

    IDX_BITS = 20
    ID_BOUND = 1 << 42

    def _pieces(b: pa.Table):
        """(ids_np, values, doc_idx_full, packed_full, nonempty) for the
        batch's split pieces — shared by both passes."""
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if not pa.types.is_integer(ids.type):
            raise TypeError(
                f"line_dedup needs an integer id column, got {ids.type}")
        if ids.null_count:
            raise ValueError("line_dedup: NULL ids cannot be ordered "
                             "for first-occurrence selection")
        # safe cast: uint64 beyond int64 range raises instead of wrapping
        # to a small negative that would silently invert first-occurrence
        # order (and dodge the envelope check below)
        ids_np = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(ids_np) and (np.abs(ids_np) >= ID_BOUND).any():
            raise ValueError("line_dedup: |id| >= 2^42 breaks the packed "
                             "(id, line_idx) ordering key")
        if len(ids_np) > 1 and len(np.unique(ids_np)) != len(ids_np):
            raise ValueError("line_dedup: duplicate ids — packed "
                             "(id, idx) occurrence keys must be unique")
        if pa.types.is_null(texts.type):
            texts = pa.array([None] * len(texts), type=pa.string())
        split = pc.split_pattern(pc.coalesce(texts, pa.scalar("")), sep)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = split.values
        lengths = np.diff(offsets)
        if len(lengths) and lengths.max() > (1 << IDX_BITS):
            raise ValueError("line_dedup: a document splits into more "
                             "than 2^20 lines")
        doc_idx_full = np.repeat(np.arange(len(split), dtype=np.int64),
                                 lengths)
        piece_idx = (np.arange(len(values), dtype=np.int64)
                     - np.repeat(offsets[:-1], lengths))
        packed = ids_np[doc_idx_full] * (1 << IDX_BITS) + piece_idx
        nonempty = pc.not_equal(values, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        nonempty &= ~np.asarray(pc.is_null(values).to_numpy(
            zero_copy_only=False))
        return ids, values, doc_idx_full, packed, nonempty

    win_schema = pa.schema([("__h1", pa.int64()), ("__h2", pa.int64()),
                            ("packed", pa.int64())])

    def winners_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return win_schema.empty_table()
        from ..functions.nputil import hash128

        _, values, _, packed, nonempty = _pieces(b)
        if not nonempty.any():
            return win_schema.empty_table()
        lines = np.asarray(values.filter(pa.array(nonempty)).to_pylist(),
                           dtype=object)
        pk = packed[nonempty]
        h1, h2 = hash128(lines)
        # per-batch combine: min packed per distinct (h1, h2)
        order = np.lexsort((pk, h2, h1))
        h1s, h2s, pks = h1[order], h2[order], pk[order]
        first = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
        return pa.table({"__h1": pa.array(h1s[first]),
                         "__h2": pa.array(h2s[first]),
                         "packed": pa.array(pks[first])}).cast(win_schema)

    from ray.data.aggregate import Min

    from ..functions.arrowutil import concat_cast

    win_ds = (ds.select_columns([id_col, text_col])
              .map_batches(winners_partial, batch_format="pyarrow")
              .groupby(["__h1", "__h2"])
              .aggregate(Min("packed", alias_name="packed"))
              .materialize())  # distinct-line-sized aggregate, object store
    packed_schema = pa.schema([("packed", pa.int64())])
    n_winners = win_ds.count()
    win_ref = None
    spill: str | None = None
    if n_winners <= line_cap:
        wtabs = [t for t in ray.get(table_refs(win_ds))
                 if t.num_rows and "packed" in t.column_names]
        winners = concat_cast([t.select(["packed"]) for t in wtabs],
                              packed_schema)
        win_ref = ray.put(np.sort(
            winners["packed"].to_numpy(zero_copy_only=False)
            .astype(np.int64)))
    else:
        # scale path (winner set too big to broadcast): spill the winner
        # keys SORTED by packed to parquet — row-group min/max stats make
        # range reads cheap — and sort the (projected) corpus by id so
        # each rebuild batch covers a contiguous packed range and reads
        # only its own slice of the winner table (the IVF/zone-map
        # pruned-read pattern; nothing winner-set-sized ever concentrates
        # on the driver).  spill_dir must be worker-reachable (docstring).
        spill = spill_dir
        if spill is None:
            import atexit
            import shutil
            import tempfile

            spill = tempfile.mkdtemp(prefix="pgfts_linededup_winners_")
            atexit.register(shutil.rmtree, spill, ignore_errors=True)
        (win_ds.map_batches(
            lambda b: pa.table({"packed": b["packed"]}).cast(packed_schema),
            batch_format="pyarrow")
         .sort("packed")
         .write_parquet(spill))
        # project BEFORE the sort so the exchange carries only the two
        # columns the rebuild reads, not every input column
        ds = ds.select_columns([id_col, text_col]).sort(id_col)

    out_schema = pa.schema([
        (id_col, ds.schema().base_schema.field(id_col).type),
        (text_col, pa.string())])

    def rebuild(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        ids, values, doc_idx_full, packed, nonempty = _pieces(b)
        keep = nonempty.copy()
        if keep.any():
            if win_ref is not None:
                win = ray.get(win_ref)
            else:
                import pyarrow.parquet as pq

                lo = int(packed[nonempty].min())
                hi = int(packed[nonempty].max())
                win = np.sort(pq.read_table(
                    spill, columns=["packed"],
                    filters=[("packed", ">=", lo), ("packed", "<=", hi)],
                )["packed"].to_numpy(zero_copy_only=False).astype(np.int64))
            if len(win) == 0:
                keep[:] = False
            else:
                pos = np.searchsorted(win, packed)
                pos[pos == len(win)] = 0
                keep &= win[pos] == packed
        kept_vals = values.filter(pa.array(keep))
        counts = np.bincount(doc_idx_full[keep], minlength=b.num_rows) \
            if keep.any() else np.zeros(b.num_rows, dtype=np.int64)
        new_off = np.zeros(b.num_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=new_off[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(new_off, type=pa.int64()),
            kept_vals.cast(pa.string()))
        joined = pc.binary_join(lists, sep)
        has_rows = pa.array(counts > 0)
        return pa.table({
            id_col: ids.filter(has_rows),
            text_col: joined.filter(has_rows).cast(pa.string()),
        }).cast(out_schema)

    return ds.select_columns([id_col, text_col]).map_batches(
        rebuild, batch_format="pyarrow")


def group_cap(
    ds: rd.Dataset, group_col: str, id_col: str, *, cap: int,
) -> rd.Dataset:
    """C4-style per-domain contribution cap: keep at most ``cap`` rows per
    ``group_col`` value, priority = smallest ``id_col`` first — the "no
    domain may dominate the mix" materializer every crawl pipeline runs
    (C4 caps pages per domain the same way).  Returns the kept
    ``(id_col, group_col)`` label set (join/filter it against the corpus
    like the dedup labels).  NULL groups form their own group (SQL
    PARTITION BY semantics); ids are assumed unique (doc ids).

    Shape (the pack_sequences sorted-runs discipline): ONE global
    ``sort(group, id)`` exchange carrying the two label columns only —
    never text — then two vectorized passes over the materialized sorted
    blocks: (1) one summary row per block (first/last group, leading/
    trailing run lengths) → the driver walks the O(blocks) summaries and
    computes, for each block, how many rows of its FIRST group precede
    it (only the group straddling a block boundary ever needs
    continuation — every other group is block-local); (2) per block, one
    run-boundary pass ranks every row within its group and keeps
    rank < cap.  No per-group Python anywhere, so group cardinality is
    unbounded (the grouped_topk driver fold this replaces is bounded by
    groups × k × blocks).  Ids must be non-NULL and unique — in-batch
    duplicates raise (the ``line_dedup`` contract); run boundaries use
    the Arrow-native ``run_starts_sorted`` kernel (numpy object-vs-scalar
    string compares truncate trailing NULs — review-confirmed hazard)."""
    import pyarrow.compute as pc

    from ..functions.arrowutil import run_starts_sorted

    if cap < 1:
        raise ValueError("group_cap: cap must be >= 1")
    sch = ds.schema().base_schema
    gtype, itype = sch.field(group_col).type, sch.field(id_col).type
    out_schema = pa.schema([(id_col, itype), (group_col, gtype)])

    # NULL groups sort as their own run under a private key column so Ray's
    # sort never compares None against values; the real column rides along
    def keyed(b: pa.Table) -> pa.Table:
        g = b[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        ids = b[id_col]
        if ids.null_count:
            raise ValueError("group_cap: NULL ids cannot be ordered")
        if b.num_rows > 1 and len(pc.unique(ids)) != b.num_rows:
            raise ValueError("group_cap: duplicate ids — per-group ranks "
                             "need a unique priority key")
        gkey = pc.if_else(pc.is_valid(g),
                          pc.binary_join_element_wise(
                              pa.array(["v"] * len(g)), g.cast(pa.string()),
                              ""),
                          pa.scalar("\x00null"))
        return pa.table({"__gkey": gkey, id_col: ids, group_col: g})

    srt = (ds.select_columns([group_col, id_col])
           .map_batches(keyed, batch_format="pyarrow")
           .sort(["__gkey", id_col])
           .materialize())  # two label columns per row, consumed twice

    sum_schema = pa.schema([
        ("first_id", itype), ("first_g", pa.string()),
        ("last_g", pa.string()), ("trail_n", pa.int64()),
        ("nrows", pa.int64())])

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return sum_schema.empty_table()
        g = b["__gkey"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = run_starts_sorted(g)
        return pa.table({
            "first_id": b[id_col].slice(0, 1),
            "first_g": g.slice(0, 1),
            "last_g": g.slice(b.num_rows - 1, 1),
            "trail_n": pa.array([b.num_rows - int(starts[-1])],
                                type=pa.int64()),
            "nrows": pa.array([b.num_rows], type=pa.int64())}).cast(
                sum_schema)

    stabs = [t for t in ray.get(table_refs(
        srt.map_batches(summarize, batch_size=None, batch_format="pyarrow")))
        if t.num_rows and "first_g" in t.column_names]
    offsets: dict = {}
    if stabs:
        summ = pa.concat_tables(stabs)
        # blocks are globally sorted by (gkey, id), so block order is the
        # lexicographic order of their FIRST (gkey, id) pair — first_id
        # alone is NOT monotone across group transitions
        summ = summ.take(pc.sort_indices(summ, sort_keys=[
            ("first_g", "ascending"), ("first_id", "ascending")])).to_pylist()
        carry_g, carry = None, 0
        for s in summ:  # sorted blocks: a group's rows are consecutive
            off = carry if s["first_g"] == carry_g else 0
            offsets[s["first_id"]] = off
            if s["first_g"] == s["last_g"]:
                carry_g, carry = s["last_g"], off + s["nrows"]
            else:
                carry_g, carry = s["last_g"], s["trail_n"]
    off_ref = ray.put(offsets)

    def rank_filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        g = b["__gkey"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        starts = run_starts_sorted(g)
        run_len = np.diff(np.append(starts, b.num_rows))
        rank = (np.arange(b.num_rows, dtype=np.int64)
                - np.repeat(starts, run_len))
        first_id = b[id_col][0].as_py()
        rank[: run_len[0]] += ray.get(off_ref).get(first_id, 0)
        keep = pa.array(rank < cap)
        return pa.table({id_col: b[id_col].filter(keep),
                         group_col: b[group_col].filter(keep)}).cast(
                             out_schema)

    return srt.map_batches(rank_filter, batch_size=None,
                           batch_format="pyarrow")
