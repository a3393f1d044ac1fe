"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (marker-word heuristic), quality scoring, token counting,
document fingerprinting (rolling hash / winnowing), SimHash.

All deterministic, numpy-vectorized where hot.  These power the
``map_batches`` stages in pipelines/driver_api.py and stages/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analyzer import DEFAULT_ANALYZER, Analyzer

STOPWORD_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that", "was", "for"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que"},
    "es": {"el", "los", "las", "y", "de", "un", "una", "es", "que", "por"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
}


def predict_language(tokens: list[str], raw_text: str | None = None) -> str:
    """n-gram-free marker heuristic: argmax language by stopword hits; 'und'
    when nothing scores.  CJK needs ``raw_text``: the default analyzer splits
    on [^a-z0-9]+ so CJK codepoints never reach the token stream — presence
    of any CJK Unified Ideograph in the raw text short-circuits to 'zh'
    (presence, not ratio, so the DuckDB oracle can express it with one
    regexp_matches)."""
    if raw_text is not None and any("一" <= ch <= "鿿" for ch in raw_text):
        return "zh"
    if not tokens:
        return "und"
    best_lang, best = "und", 0
    for lang in sorted(STOPWORD_MARKERS):
        hits = sum(1 for t in tokens if t in STOPWORD_MARKERS[lang])
        if hits > best:
            best_lang, best = lang, hits
    return best_lang


def quality_metrics(tokens: list[str], text: str) -> dict:
    """Integer-valued quality signals (integers keep oracles fp-safe)."""
    n = len(tokens)
    distinct = len(set(tokens))
    stop_hits = sum(1 for t in tokens if t in STOPWORD_MARKERS["en"])
    return {
        "n_tokens": n,
        "distinct_terms": distinct,
        "stop_hits": stop_hits,
        "n_chars": len(text),
    }


def repetition_metrics(words: list[str]) -> dict:
    """Scalar reference for ``repetition_metrics_column`` (tests assert
    row-identity).  Gopher-style repetition signals over RAW space-split
    words (NOT the analyzer — no stemming/stopwording, so the DuckDB
    ``string_split`` oracle is bit-exact).  All outputs integer: fractions
    are round-DOWN parts-per-10k (``num*10000 // den``)."""
    from collections import Counter

    total = len(words)
    wc = Counter(words)
    grams = Counter(zip(words, words[1:]))
    total2 = max(total - 1, 0)
    dup2 = sum(c for c in grams.values() if c > 1)
    return {
        "n_words": total,
        "dup_word_per_10k": ((total - len(wc)) * 10000 // total) if total else 0,
        "top_word_per_10k": (max(wc.values()) * 10000 // total) if total else 0,
        "dup_2gram_per_10k": (dup2 * 10000 // total2) if total2 else 0,
    }


def repetition_metrics_column(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized Gopher-style repetition / quality-filter signals per doc
    (Rae et al. 2021 §A1.1: repetitious documents are low-quality training
    data): duplicate-word fraction, most-common-word fraction, and the
    fraction of 2-gram occurrences whose 2-gram repeats within the doc.

    Words are RAW space-split (``string_split(text, ' ')`` parity — the
    analyzer would stem/stopword away the very repetitions being measured);
    fractions are integer parts-per-10k so the DuckDB oracle hashes exactly.
    One pandas factorize over the flat word stream, then rank-packed
    ``(doc, code)`` int64 keys + one sort per n-gram order — no per-row
    Python."""
    import pandas as _pd
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    zeros = lambda: np.zeros(n, dtype=np.int64)  # noqa: E731
    if n == 0 or pa.types.is_null(texts.type):
        return {"n_words": zeros(), "dup_word_per_10k": zeros(),
                "top_word_per_10k": zeros(), "dup_2gram_per_10k": zeros()}
    toks = pc.split_pattern(pc.coalesce(texts, pa.scalar("")), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    total = counts.astype(np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
    if not len(flat):
        return {"n_words": total, "dup_word_per_10k": zeros(),
                "top_word_per_10k": zeros(), "dup_2gram_per_10k": zeros()}
    codes, uniques = _pd.factorize(flat, sort=False)
    codes = codes.astype(np.int64)
    V = np.int64(len(uniques))

    def _runs(doc_of, code_of, width):
        """Rank-pack (doc, code) into one int64 key, sort once, return
        (run_doc, run_len) for the distinct (doc, code) groups."""
        key = doc_of * width + code_of
        key.sort()
        new = np.empty(len(key), dtype=bool)
        new[0] = True
        np.not_equal(key[1:], key[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(key)))
        return key[starts] // width, lens

    def per10k(num, den):
        out = zeros()
        nz = den > 0
        out[nz] = num[nz] * 10000 // den[nz]
        return out

    run_doc, lens = _runs(doc_idx.copy(), codes, V)
    distinct = np.bincount(run_doc, minlength=n).astype(np.int64)
    top = zeros()
    np.maximum.at(top, run_doc, lens)

    # 2-grams: adjacent code pairs within a doc, rank-packed the same way
    within = doc_idx[1:] == doc_idx[:-1]
    d2 = doc_idx[:-1][within]
    pair = codes[:-1][within] * V + codes[1:][within]
    total2 = np.bincount(d2, minlength=n).astype(np.int64)
    if len(pair):
        u2, inv2 = np.unique(pair, return_inverse=True)
        run_doc2, lens2 = _runs(d2, inv2.astype(np.int64), np.int64(len(u2)))
        dup_occ = np.bincount(
            run_doc2[lens2 > 1], weights=lens2[lens2 > 1].astype(np.float64),
            minlength=n).astype(np.int64)
    else:
        dup_occ = zeros()
    return {"n_words": total,
            "dup_word_per_10k": per10k(total - distinct, total),
            "top_word_per_10k": per10k(top, total),
            "dup_2gram_per_10k": per10k(dup_occ, total2)}


def predict_language_column(
    texts: pa.Array, analyzer: Analyzer = DEFAULT_ANALYZER,
) -> np.ndarray:
    """Vectorized ``predict_language`` over a string column → object array of
    lang codes, row-identical to the scalar form: one ``tokenize_column``
    pass, per-language marker hits via ``np.isin`` + ``bincount``, argmax
    with the same first-alphabetical tie-break ('hits > best' over sorted
    langs == argmax taking the first maximum), CJK short-circuit via one
    Arrow regex pass.  Replaces a per-row token loop."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if pa.types.is_null(texts.type):  # all-null block arrives null-typed
        return np.full(n, "und", dtype=object)
    langs = sorted(STOPWORD_MARKERS)
    terms, doc_index, _ = analyzer.tokenize_column(texts)
    terms = np.asarray(terms, dtype=object)
    hits = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        m = np.isin(terms, list(STOPWORD_MARKERS[lang]))
        if m.any():
            hits[:, j] = np.bincount(doc_index[m], minlength=n)
    best = hits.argmax(axis=1)  # first max == scalar 'hits > best' tie-break
    out = np.asarray(langs, dtype=object)[best]
    out[hits.max(axis=1) == 0] = "und"
    cjk = pc.match_substring_regex(
        pc.coalesce(texts, pa.scalar("")), "[一-鿿]").to_numpy(zero_copy_only=False)
    out[cjk] = "zh"
    return out


def quality_metrics_column(
    texts: pa.Array, analyzer: Analyzer = DEFAULT_ANALYZER,
) -> dict[str, np.ndarray]:
    """Vectorized ``quality_metrics`` over a string column → int64 arrays
    {n_tokens, distinct_terms, stop_hits, n_chars}, row-identical to the
    scalar form: one tokenize pass; distinct terms via a (doc, term-code)
    lexsort-dedupe; stop hits via ``np.isin`` + weighted bincount."""
    import pandas as _pd
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if pa.types.is_null(texts.type):  # all-null block arrives null-typed
        z = np.zeros(n, dtype=np.int64)
        return {"n_tokens": z, "distinct_terms": z.copy(),
                "stop_hits": z.copy(), "n_chars": z.copy()}
    terms, doc_index, _ = analyzer.tokenize_column(texts)
    terms = np.asarray(terms, dtype=object)
    n_tokens = np.bincount(doc_index, minlength=n).astype(np.int64)
    if len(terms):
        codes, _ = _pd.factorize(terms, sort=False)
        order = np.lexsort((codes, doc_index))
        dc, cc = doc_index[order], codes[order]
        first = np.empty(len(dc), dtype=bool)
        first[0] = True
        first[1:] = (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])
        distinct = np.bincount(dc[first], minlength=n).astype(np.int64)
        m = np.isin(terms, list(STOPWORD_MARKERS["en"]))
        stop_hits = (np.bincount(doc_index[m], minlength=n).astype(np.int64)
                     if m.any() else np.zeros(n, dtype=np.int64))
    else:
        distinct = np.zeros(n, dtype=np.int64)
        stop_hits = np.zeros(n, dtype=np.int64)
    n_chars = pc.utf8_length(pc.coalesce(texts, pa.scalar(""))).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    return {"n_tokens": n_tokens, "distinct_terms": distinct,
            "stop_hits": stop_hits, "n_chars": n_chars}


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit FNV-1a per token (no PYTHONHASHSEED dependence).

    Vectorized ACROSS tokens: one position-loop over the longest token, each
    step an elementwise xor+multiply over all tokens still that long —
    bit-identical to the per-byte scalar fold (uint64 multiply wraps mod
    2^64), without a Python loop per byte."""
    n = len(tokens)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    encoded = [t.encode() for t in tokens]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    if maxlen == 0:
        return out
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    # fancy-index the FLAT byte stream per position: memory stays O(total
    # bytes).  A dense (n, maxlen) pad would multiply the batch by the
    # LONGEST token's length — one 1 MB base64/hex run in a 50k-token doc
    # is a 50 GB allocation and a dead worker.
    alive = np.arange(n)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            alive = alive[lens[alive] > j]
            if not len(alive):
                break
            by = flat[starts[alive] + j].astype(np.uint64)
            out[alive] = (out[alive] ^ by) * _FNV_PRIME
    return out


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — bijective avalanche over uint64.  FNV-1a of
    SHORT similar strings (decimal ids) is not uniform in the high bits;
    order statistics (KMV) and threshold bucketing (split_assign) need
    full-width uniformity.  Bijective → adds no collisions."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token unigrams (tf-weighted)."""
    if not tokens:
        return 0
    hashes = token_hashes(tokens)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for b in range(64):
        if v[b] > 0:
            sig |= np.uint64(1) << np.uint64(b)
    return int(sig)


_SIMHASH_CHUNK = 1 << 17  # tokens per vote-matrix chunk (~32 MB of int32)


def simhash64_column(texts: pa.Array, analyzer: Analyzer = DEFAULT_ANALYZER) -> np.ndarray:
    """Vectorized ``simhash64`` over a string column → uint64 per row,
    bit-identical to the scalar form (same tf-weighted token stream): ONE
    tokenize_column pass, ONE token_hashes fold over the flat stream, one
    bit-unpack, per-doc segment sums via ``reduceat`` (doc_index is
    nondecreasing).  Replaces a per-row Python loop that dominated
    simhash_pairs' signature stage."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    terms, doc_index, _ = analyzer.tokenize_column(texts)
    sigs = np.zeros(len(texts), dtype=np.uint64)  # empty doc → 0, like scalar
    if len(terms) == 0:
        return sigs
    h = token_hashes(list(terms))
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    # chunked vote pass: the (tokens × 64) ±1 matrix is built 128k tokens at
    # a time (~32 MB) and folded into a docs×64 accumulator — an unchunked
    # matrix over a large batch is hundreds of MB of fresh allocation per
    # call, which this host's page-fault storms turn into tens of seconds
    v = np.zeros((len(texts), 64), dtype=np.int64)
    CH = _SIMHASH_CHUNK
    for s in range(0, len(h), CH):
        hv = h[s:s + CH]
        di = doc_index[s:s + CH]
        votes = (2 * ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int32) - 1)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(di)) + 1))
        v[di[starts]] += np.add.reduceat(votes, starts, axis=0)
    touched = np.unique(doc_index)
    pos = v[touched] > 0
    sigs[touched] = (pos.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    return sigs


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _rolling_poly(th: np.ndarray, window: int) -> np.ndarray:
    """The ONE w-gram polynomial over a token-hash stream (base
    1099511628211, big-endian fold, wraps mod 2^64).  Both the scalar
    fingerprinting path and the vectorized column shingle path call this —
    a second copy of the fold would let the dedup candidate generator and
    the fingerprinting oracle drift apart."""
    base = np.uint64(1099511628211)
    mults = base ** np.arange(window, dtype=np.uint64)
    n = len(th) - window + 1
    out = np.zeros(max(n, 0), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window):
            out += th[j : j + n] * mults[window - 1 - j]
    return out


def rolling_fingerprints(tokens: list[str], window: int = 4) -> np.ndarray:
    """Rabin-Karp-style rolling hashes of token w-grams (document
    fingerprinting; winnowing selects minima per window downstream)."""
    if len(tokens) < window:
        return np.empty(0, dtype=np.uint64)
    return _rolling_poly(token_hashes(tokens), window)


def winnow(fps: np.ndarray, w: int = 5) -> np.ndarray:
    """Winnowing: per sliding window of w fingerprints keep the minimum; the
    deduped minima set is the document signature (Schleimer et al., SIGMOD'03)."""
    if len(fps) == 0:
        return fps
    if len(fps) <= w:
        return np.unique(fps.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(fps, w).min(axis=1)
    return np.unique(mins)


def shingles(tokens: list[str], k: int = 3) -> set[str]:
    return {" ".join(tokens[i : i + k]) for i in range(max(0, len(tokens) - k + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ---- MinHash (vectorized universal hashing) ----
_MERSENNE = (1 << 61) - 1


def minhash_params(num_perm: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _mulmod_mersenne(a: np.uint64, h: np.ndarray) -> np.ndarray:
    """EXACT (a·h) mod (2^61−1) for a < 2^61 and unrestricted uint64 ``h``,
    in pure uint64 arithmetic: 32-bit limb products (each < 2^64) reduced via
    2^61 ≡ 1 (so 2^64 ≡ 8); every addend is reduced below p before summing,
    so no intermediate overflows.  Bit-identical to Python big-int math —
    the DuckDB HUGEINT oracle depends on that."""
    p = np.uint64(_MERSENNE)
    a1, a0 = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    h1, h0 = h >> np.uint64(32), h & np.uint64(0xFFFFFFFF)
    hi = (a1 * h1) % p                                # carries 2^64 ≡ 8
    mid = ((a1 * h0) % p + (a0 * h1) % p) % p         # carries 2^32
    m1, m0 = mid >> np.uint64(32), mid & np.uint64(0xFFFFFFFF)
    mid_red = (m1 * np.uint64(8) + (m0 << np.uint64(32)) % p) % p
    return ((hi * np.uint64(8)) % p + mid_red + (a0 * h0) % p) % p


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sig[j] = min over shingles of (a_j * h + b_j mod p). Empty doc → p."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    h = shingle_hashes.astype(np.uint64, copy=False)
    p = np.uint64(_MERSENNE)
    out = np.empty(len(a), dtype=np.uint64)
    for j in range(len(a)):
        out[j] = ((_mulmod_mersenne(np.uint64(a[j]), h) + np.uint64(b[j])) % p).min()
    return out


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Distinct k-gram hashes — the SAME polynomial as rolling_fingerprints
    (one definition, so the dedup candidate generator and the fingerprinting
    oracle can never drift)."""
    return np.unique(rolling_fingerprints(tokens, window=k))


def shingle_hashes_column(
    texts: pa.Array, k: int = 3, analyzer: Analyzer = DEFAULT_ANALYZER,
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct per-doc k-gram hashes over a string column → (fp, doc_row),
    sorted by (doc_row, fp) — the vectorized form of per-row
    ``shingle_hashes(analyzer.tokenize(...))``: ONE tokenize pass, the
    rolling polynomial over the flat token stream with windows crossing doc
    boundaries masked out, one lexsort for per-doc dedupe."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    empty = np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    if pa.types.is_null(texts.type):  # all-null block arrives as null-typed
        return empty
    terms, doc_index, _ = analyzer.tokenize_column(texts)
    if len(terms) < k:
        return empty
    th = token_hashes(list(terms))
    fp = _rolling_poly(th, k)  # the same fold as rolling_fingerprints
    n_win = len(th) - k + 1
    # a window is a real shingle only when it stays inside one doc
    valid = doc_index[:n_win] == doc_index[k - 1:]
    fp, docs = fp[valid], doc_index[:n_win][valid]
    if not len(fp):
        return empty
    order = np.lexsort((fp, docs))
    fp, docs = fp[order], docs[order]
    keep = np.empty(len(fp), dtype=bool)
    keep[0] = True
    keep[1:] = (docs[1:] != docs[:-1]) | (fp[1:] != fp[:-1])
    return fp[keep], docs[keep]


def minhash_signature_column(
    texts: pa.Array, a: np.ndarray, b: np.ndarray, k: int = 3,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> np.ndarray:
    """Vectorized MinHash over a string column → (n_rows, num_perm) uint64,
    bit-identical to the scalar ``minhash_signature(shingle_hashes(...))``
    per row: the shared flat shingle pass, then each permutation is one
    exact Mersenne mulmod over the flat shingle stream + a
    ``minimum.reduceat`` per-doc fold.  Replaces a per-row Python loop (the
    signature stage of minhash_lsh_pairs)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    p = np.uint64(_MERSENNE)
    sigs = np.full((len(texts), len(a)), _MERSENNE, dtype=np.uint64)  # empty → p
    fp, docs = shingle_hashes_column(texts, k, analyzer)
    if not len(fp):
        return sigs
    starts = np.concatenate(([0], np.flatnonzero(np.diff(docs)) + 1))
    rows = docs[starts]
    for j in range(len(a)):
        vals = (_mulmod_mersenne(np.uint64(a[j]), fp) + np.uint64(b[j])) % p
        sigs[rows, j] = np.minimum.reduceat(vals, starts)
    return sigs
