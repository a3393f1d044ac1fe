"""Headline / snippet generation — the ``ts_headline`` analog.

The reference's Postgres backend ships ``ts_headline`` (the PG FTS snippet
function) although opds.py's feeds never call it; it is the canonical
"show WHY this document matched" feature of a full-text engine, so the
engine exposes it with deterministic, SQL-replicable semantics:

  * the document is the ANALYZER token stream (the same normalization the
    index and every FTS oracle use; tokens joined by single spaces — we do
    not reconstruct raw-text character spans, because the index stores
    postings, not character offsets — a documented divergence from
    ``ts_headline``'s raw-text fragments);
  * the snippet window is the ``max_words`` consecutive tokens whose
    query-term hit count is MAXIMAL, earliest window on ties (PG's
    best-cover heuristic collapsed to one deterministic rule);
  * matched tokens are wrapped ``start_sel``…``stop_sel`` (PG defaults
    ``<b>``/``</b>``);
  * a document with no hit yields the document's FIRST ``max_words``
    tokens un-highlighted (ts_headline's no-match fallback).

Scale shape: one shuffle-free ``map_batches`` pass; per batch the token
stream is flattened ONCE (vectorized Arrow split), window hit counts come
from one cumulative sum over the flat match mask (every window of every
row scored with no per-row Python), and only the final join of the ≤
``max_words`` winning tokens per row is row-wise string assembly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer


def headline_batch(
    texts: pa.Array | pa.ChunkedArray,
    terms: list[str],
    *,
    max_words: int = 12,
    start_sel: str = "<b>",
    stop_sel: str = "</b>",
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> pa.Table:
    """Snippets for one batch of documents → ``(snippet, n_hits)`` table,
    row-aligned with ``texts``.  See module docstring for the semantics."""
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    n_rows = len(texts)
    toks, doc_idx, _ = analyzer.tokenize_column_arrow(texts)
    if len(toks) == 0:
        return pa.table({
            "snippet": pa.array([""] * n_rows, type=pa.string()),
            "n_hits": pa.array(np.zeros(n_rows, dtype=np.int64)),
        })
    term_set = sorted(set(terms))
    import pyarrow.compute as pc

    is_match = pc.is_in(toks, value_set=pa.array(term_set, type=pa.string())) \
        .to_numpy(zero_copy_only=False).astype(np.int64)

    # per-row token ranges in the flat stream (doc_idx is non-decreasing)
    starts = np.searchsorted(doc_idx, np.arange(n_rows), side="left")
    ends = np.searchsorted(doc_idx, np.arange(n_rows), side="right")

    # hit count of the window starting at each flat position i:
    # cum[min(i+W, row_end)] - cum[i], one cumsum for the whole batch
    cum = np.concatenate(([0], np.cumsum(is_match)))
    flat_n = len(toks)
    pos = np.arange(flat_n)
    row_end = np.repeat(ends, ends - starts)  # flat row-end per token
    w_end = np.minimum(pos + max_words, row_end)
    wcount = cum[w_end] - cum[pos]

    # earliest argmax per row: maximum.reduceat for the row max, then the
    # first flat index achieving it (flatnonzero is ordered, and each row
    # has >= 1 achieving index, so searchsorted picks the first per row)
    nonempty = ends > starts
    row_max = np.zeros(n_rows, dtype=np.int64)
    red = np.maximum.reduceat(wcount, starts[nonempty]) if nonempty.any() else None
    if red is not None:
        row_max[nonempty] = red
    achieves = np.flatnonzero(wcount == np.repeat(row_max, ends - starts))
    first_at = achieves[np.searchsorted(achieves, starts[nonempty])] \
        if nonempty.any() else np.empty(0, dtype=np.int64)

    # gather ONLY the winning windows' tokens (<= rows x max_words), wrap
    # matches, and space-join each row's window — all Arrow kernels
    win_len = np.minimum(first_at + max_words, ends[nonempty]) - first_at \
        if nonempty.any() else np.empty(0, dtype=np.int64)
    total = int(win_len.sum())
    cum_len = np.concatenate(([0], np.cumsum(win_len)))
    idx_flat = (np.repeat(first_at, win_len)
                + np.arange(total) - np.repeat(cum_len[:-1], win_len))
    sel = toks.take(pa.array(idx_flat, type=pa.int64()))
    msel = pa.array(is_match[idx_flat].astype(bool))
    wrapped = pc.if_else(
        msel, pc.binary_join_element_wise(start_sel, sel, stop_sel, ""), sel)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(cum_len, type=pa.int32()), wrapped),
        " ")
    snippets = np.full(n_rows, "", dtype=object)
    snippets[nonempty] = joined.to_numpy(zero_copy_only=False)
    n_hits = np.zeros(n_rows, dtype=np.int64)
    n_hits[nonempty] = cum[first_at + win_len] - cum[first_at]
    return pa.table({
        "snippet": pa.array(snippets, type=pa.string()),
        "n_hits": pa.array(n_hits),
    })


def headline_column(
    ds: rd.Dataset,
    text_col: str,
    terms: list[str],
    *,
    max_words: int = 12,
    start_sel: str = "<b>",
    stop_sel: str = "</b>",
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> rd.Dataset:
    """Append ``snippet`` and ``n_hits`` columns to every row — one
    shuffle-free vectorized pass (``headline_batch`` per batch)."""

    def add(batch: pa.Table) -> pa.Table:
        out = headline_batch(batch[text_col], terms, max_words=max_words,
                             start_sel=start_sel, stop_sel=stop_sel,
                             analyzer=analyzer)
        return batch.append_column("snippet", out["snippet"]) \
                    .append_column("n_hits", out["n_hits"])

    return ds.map_batches(add, batch_format="pyarrow")
