"""Text analyzer: lowercase + regex tokenization (+ optional stopwords/stem).

Re-implements what ``to_tsvector('english', ...)`` does for the reference
(/root/reference/tables/mv_books_dc.sql:183-194, custom aggregate :20-28) as a
frozen, versioned analyzer of our own.  Rank identity is defined against OUR
oracle (SURVEY.md §5), so the spec is deliberately simple and exactly
SQL-expressible so a DuckDB oracle can reproduce it token-for-token:

    analyzer-v1:  lower(text)  →  split on ``[^a-z0-9]+``  →  drop empty
                  tokens  →  (optional) drop stopwords  →  (optional) stem.

The default configuration indexes EVERYTHING (no stopwords, no stemming):
BM25's idf already down-weights stopword-like terms, phrase queries over
stopword-heavy text stay well-defined, and the DuckDB oracle stays a one-line
``regexp_split_to_array``.  Positions are assigned over the token stream
*before* stopword removal (mirroring how Postgres tsvector keeps original
lexeme positions when stopwords are elided).

The hot path is fully vectorized: ``pyarrow.compute.utf8_lower`` +
``split_pattern_regex`` (C++ kernels), then numpy offset arithmetic — no
Python-per-row work inside ``map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# The exact same pattern must be used by every oracle (DuckDB
# regexp_split_to_array / Python re.split).
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"

# A small frozen English stopword list (only used when stopwords=True).
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def _porter_lite(term: str) -> str:
    """A tiny deterministic suffix-stripping stemmer (versioned: stem-v1).

    NOT Porter — a frozen, easily re-implementable subset good enough to play
    the role of the reference's English stemming (P5 in SURVEY.md §2.2).
    """
    for suf in ("ingly", "edly", "ing", "ied", "ies", "ed", "es", "s", "ly"):
        if term.endswith(suf) and len(term) - len(suf) >= 3:
            return term[: -len(suf)]
    return term


@dataclass(frozen=True)
class Analyzer:
    """Frozen analyzer config; ``version_tag`` participates in index fingerprints."""

    stopwords: bool = False
    stem: bool = False
    name: str = "analyzer-v1"

    @property
    def version_tag(self) -> str:
        return f"{self.name}(stop={int(self.stopwords)},stem={int(self.stem)})"

    # ---- scalar path (query side / tests / oracles) ----
    def tokenize(self, text: str) -> list[str]:
        import re

        toks = [t for t in re.split(TOKEN_SPLIT_PATTERN, text.lower()) if t]
        if self.stopwords:
            toks = [t for t in toks if t not in ENGLISH_STOPWORDS]
        if self.stem:
            toks = [_porter_lite(t) for t in toks]
        return toks

    def tokenize_with_positions(self, text: str) -> tuple[list[str], list[int]]:
        """Positions index the pre-stopword token stream (tsvector semantics)."""
        import re

        raw = [t for t in re.split(TOKEN_SPLIT_PATTERN, text.lower()) if t]
        terms: list[str] = []
        positions: list[int] = []
        for i, t in enumerate(raw):
            if self.stopwords and t in ENGLISH_STOPWORDS:
                continue
            terms.append(_porter_lite(t) if self.stem else t)
            positions.append(i)
        return terms, positions

    # ---- vectorized batch path (build side) ----
    def tokenize_column(
        self, texts: pa.Array | pa.ChunkedArray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Tokenize a string column; returns flat (terms, doc_index, positions).

        terms      : object ndarray of token strings
        doc_index  : int64 ndarray, row index within `texts` for each token
        positions  : int32 ndarray, token position within its document
                     (counted over the pre-stopword stream)
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lowered = pc.utf8_lower(pc.coalesce(texts, pa.scalar("")))
        split = pc.split_pattern_regex(lowered, TOKEN_SPLIT_PATTERN)
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = split.values  # StringArray, may contain '' at boundaries
        n_docs = len(split)
        total = len(values)
        if total == 0:
            return (
                np.empty(0, dtype=object),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int32),
            )
        lengths = np.diff(offsets)
        doc_index_full = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        nonempty = pc.not_equal(values, pa.scalar("")).to_numpy(zero_copy_only=False)
        nonempty &= ~np.asarray(pc.is_null(values).to_numpy(zero_copy_only=False))
        # position within doc counted over nonempty tokens only
        cum = np.cumsum(nonempty)
        # cum value just before each doc's first slot
        starts = offsets[:-1]
        base_per_doc = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0)
        base_per_doc[starts == 0] = 0
        doc_base = np.repeat(base_per_doc, lengths)
        pos_full = (cum - 1 - doc_base).astype(np.int32)

        terms_np = np.asarray(values.to_pandas(), dtype=object)
        keep = nonempty
        terms = terms_np[keep]
        doc_index = doc_index_full[keep]
        positions = pos_full[keep]

        if self.stopwords:
            stop_mask = np.fromiter(
                (t not in ENGLISH_STOPWORDS for t in terms), dtype=bool, count=len(terms)
            )
            terms, doc_index, positions = (
                terms[stop_mask],
                doc_index[stop_mask],
                positions[stop_mask],
            )
        if self.stem:
            terms = np.array([_porter_lite(t) for t in terms], dtype=object)
        return terms, doc_index, positions


    def tokenize_column_arrow(
        self, texts: pa.Array | pa.ChunkedArray
    ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        """Like ``tokenize_column`` but keeps terms as an Arrow StringArray
        (no object-dtype round-trip) — the build hot path.  Only valid for
        the default config (no stopwords/stem); falls back otherwise."""
        if self.stopwords or self.stem:
            t, d, p = self.tokenize_column(texts)
            return pa.array(t, type=pa.string()), d, p
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lowered = pc.utf8_lower(pc.coalesce(texts, pa.scalar("")))
        split = pc.split_pattern_regex(lowered, TOKEN_SPLIT_PATTERN)
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = split.values
        n_docs = len(split)
        total = len(values)
        if total == 0:
            return (
                pa.array([], type=pa.string()),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int32),
            )
        lengths = np.diff(offsets)
        doc_index_full = np.repeat(np.arange(n_docs, dtype=np.int32), lengths)
        nonempty = pc.not_equal(values, pa.scalar("")).to_numpy(zero_copy_only=False)
        nonempty &= ~np.asarray(pc.is_null(values).to_numpy(zero_copy_only=False))
        cum = np.cumsum(nonempty, dtype=np.int32)
        starts = offsets[:-1]
        base_per_doc = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0).astype(np.int32)
        base_per_doc[starts == 0] = 0
        doc_base = np.repeat(base_per_doc, lengths)
        pos_full = cum - 1 - doc_base
        mask = pa.array(nonempty)
        return values.filter(mask), doc_index_full[nonempty], pos_full[nonempty]


    def tokenize_column_fast(
        self, texts: pa.Array | pa.ChunkedArray
    ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        """Byte-scan tokenizer — exactly equivalent to the regex split for ANY
        UTF-8 input (a token is a maximal run of ``[a-z0-9]`` BYTES, and every
        byte of a multi-byte UTF-8 character is ≥ 0x80, i.e. a separator, just
        like the regex treats the character): one Arrow ``utf8_lower`` then
        pure numpy run-length extraction over the raw value buffer.

        Measured: only ~20% faster than the Arrow RE2 kernel once warm and
        slower on a cold process (large-temporary page faults), so the build
        keeps ``tokenize_column_arrow``; this stays as the tested fallback /
        reference for environments where the regex kernel is the bottleneck.
        Default config only; falls back otherwise."""
        if self.stopwords or self.stem:
            return self.tokenize_column_arrow(texts)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lowered = pc.utf8_lower(pc.coalesce(texts, pa.scalar("")))
        if isinstance(lowered, pa.ChunkedArray):  # kernels may re-chunk
            lowered = lowered.combine_chunks()
        n_docs = len(lowered)
        if n_docs == 0:
            return pa.array([], type=pa.string()), np.empty(0, np.int32), np.empty(0, np.int32)
        if not pa.types.is_string(lowered.type):  # large_string etc. → safe path
            return self.tokenize_column_arrow(texts)
        bufs = lowered.buffers()
        value_off = np.frombuffer(bufs[1], dtype=np.int32, count=n_docs + 1, offset=lowered.offset * 4).astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        lo, hi = value_off[0], value_off[-1]
        b = data[lo:hi]
        doc_offsets = value_off - lo
        if len(b) == 0:
            return pa.array([], type=pa.string()), np.empty(0, np.int32), np.empty(0, np.int32)

        table = np.zeros(256, dtype=bool)
        table[ord("a") : ord("z") + 1] = True
        table[ord("0") : ord("9") + 1] = True
        valid = table[b]
        prev = np.empty_like(valid)
        prev[0] = False
        prev[1:] = valid[:-1]
        # tokens never span documents: treat each doc's first byte as run start
        doc_starts_idx = doc_offsets[:-1]
        in_range = doc_starts_idx < len(b)
        prev[doc_starts_idx[in_range]] = False
        is_start = valid & ~prev
        nxt = np.empty_like(valid)
        nxt[-1] = False
        nxt[:-1] = valid[1:]
        is_end = valid & ~nxt
        # a token also ends at its document's last byte even if the next
        # document begins with a valid byte
        ends_at = doc_offsets[1:] - 1
        ok = (ends_at >= 0) & (ends_at < len(b))
        is_end[ends_at[ok]] = valid[ends_at[ok]]
        starts = np.flatnonzero(is_start)
        ends = np.flatnonzero(is_end) + 1  # exclusive
        # pair starts/ends: both sorted, same count (every start has an end)
        if len(starts) != len(ends):  # pragma: no cover — defensive
            return self.tokenize_column_arrow(texts)
        lens = ends - starts
        n_tok = len(starts)
        if n_tok == 0:
            return pa.array([], type=pa.string()), np.empty(0, np.int32), np.empty(0, np.int32)
        # gather token bytes into one contiguous values buffer
        gather = np.repeat(starts, lens) + (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        )
        values = b[gather]
        tok_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        terms = pa.StringArray.from_buffers(
            n_tok, pa.py_buffer(tok_off.tobytes()), pa.py_buffer(values.tobytes())
        )
        doc_index = (np.searchsorted(doc_offsets, starts, side="right") - 1).astype(np.int32)
        first_tok_of_doc = np.searchsorted(doc_index, np.arange(n_docs), side="left")
        positions = (np.arange(n_tok, dtype=np.int32) - first_tok_of_doc[doc_index]).astype(np.int32)
        return terms, doc_index, positions


DEFAULT_ANALYZER = Analyzer()


def analyzer_sql_tokens_cte(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB SQL fragment producing (id, term) rows that mirror analyzer-v1
    with default config. Used to assemble oracle SQL."""
    return (
        f"SELECT {id_col} AS __id, t.term AS term "
        f"FROM {table}, UNNEST(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_PATTERN}')) AS t(term) "
        f"WHERE t.term <> ''"
    )
