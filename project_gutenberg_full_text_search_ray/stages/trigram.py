"""Character-trigram index over the dictionary — the FUZZY/CONTAINS family.

The reference backs ``q <% col`` (word_similarity) and ``ILIKE %q%`` with GIN
and GiST trigram indexes over whole text columns
(/root/reference/tables/mv_books_dc.sql:472-487, README.md:118-123).  We index
trigrams of the *dictionary terms* instead: a fuzzy or contains query first
expands to matching vocabulary terms via the trigram index, then runs as an
ordinary OR-query through the posting lists — two pruned columnar reads, no
corpus scan.

The trigram table is derived lazily from ``dict/`` on first use and cached in
the index directory (atomic write).  Layout: (tri:string, term:string),
sorted by ``tri`` → parquet row-group stats prune each lookup to the query's
own trigrams.

Trigram spec (pg_trgm-compatible framing): terms are padded ``"  t "``;
word_similarity(q, t) = |shared trigrams| / |trigrams(q)|.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TRIGRAM_DIR = "dict_trigrams"
# bump when the derivation logic changes: cached tables derived under an
# older format must be rebuilt, not reused (the _DONE marker carries this)
TRIGRAM_FMT = "tg2"


def trigram_dirname(index_fingerprint: str) -> str:
    """Basename of the derived trigram cache for a generation — the SINGLE
    owner of this naming (vacuum_index keeps exactly this dir)."""
    fp8 = index_fingerprint[:8]
    return f"{TRIGRAM_DIR}_{TRIGRAM_FMT}_{fp8}" if fp8 else f"{TRIGRAM_DIR}_{TRIGRAM_FMT}"


def trigrams(word: str) -> set[str]:
    w = f"  {word} "
    return {w[i : i + 3] for i in range(len(w) - 2)}


def ensure_trigram_index(index_dir: str) -> str:
    """Derive (tri, term) from the dictionary once; idempotent + atomic.

    Built as a Ray Data pipeline — map over dictionary shards (tasks, one
    per shard batch), one vocabulary-sized ``sort("tri")`` exchange, sharded
    parquet out — so a 10⁸-term dictionary never materializes on the driver.
    Files are globally range-partitioned by ``tri`` after the sort, so a
    lookup's ``filters=[("tri", "in", ...)]`` prunes to its own row groups."""
    # generation-qualified derived dir + fingerprint-carrying _DONE marker:
    # a rebuild/refresh (new dictionary) derives into a NEW directory and a
    # stale trigram table is never consulted nor rmtree'd from under readers
    gen = ""
    try:
        from ..state.manifest import load_index_manifest

        gen = str(load_index_manifest(index_dir).get("fingerprint", ""))
    except Exception:
        pass
    out = os.path.join(index_dir, trigram_dirname(gen))
    gen = f"{TRIGRAM_FMT}:{gen}"
    done_path = os.path.join(out, "_DONE")
    if os.path.exists(done_path):
        with open(done_path) as f:
            if f.read().strip() == gen:
                return out
    import ray.data as rd

    from ..state.manifest import resolve_dirs

    dict_dir = resolve_dirs(index_dir)[1]

    def explode(batch: pa.Table) -> pa.Table:
        from ..corpus import FIELD_SEP

        terms = batch["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        # field-scoped posting keys ("<field>\x1f<term>") are indexed by
        # the trigrams of their WORD PART (a field's vocabulary need not
        # be a subset of the body's), but the stored term stays the full
        # key — expansion filters by scope so a plain fuzzy/contains
        # query never leaks "title\x1freport"-style keys.
        # Vectorized: strip the scope prefix, pad "  w ", then one
        # utf8_slice per window offset (loop bound = LONGEST word, not
        # total trigrams — the only Python loop is ~word-length long)
        words = pc.replace_substring_regex(
            terms.cast(pa.string()), pattern=f"^[^{FIELD_SEP}]*{FIELD_SEP}",
            replacement="")
        padded = pc.binary_join_element_wise(
            pa.scalar("  "), words, pa.scalar(" "), pa.scalar(""))
        lens = pc.utf8_length(padded)
        maxlen = pc.max(lens).as_py() or 0
        tri_parts, term_parts = [], []
        for i in range(max(0, int(maxlen) - 2)):
            mask = pc.greater_equal(lens, i + 3)
            tri_parts.append(pc.utf8_slice_codeunits(
                padded.filter(mask), start=i, stop=i + 3))
            term_parts.append(terms.filter(mask))
        if not tri_parts:
            return pa.table({"tri": pa.array([], type=pa.string()),
                             "term": pa.array([], type=pa.string())})
        out = pa.table({"tri": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in tri_parts]),
                        "term": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in term_parts])})
        # per-term trigram SET semantics: word_similarity counts DISTINCT
        # shared trigrams, so duplicate (tri, term) rows (e.g. "aaaa") must
        # collapse.  Terms are unique across the dictionary, so within-batch
        # dedupe is global dedupe.
        return out.group_by(["tri", "term"]).aggregate([])

    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    (
        rd.read_parquet(dict_dir, columns=["term"])
        .map_batches(explode, batch_format="pyarrow")
        .sort("tri")
        .write_parquet(tmp, row_group_size=8192)
    )
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(gen)
    # commit: existing-dir-WINS, under a short exclusive lock.  Two
    # processes can derive the same generation concurrently (HTTP server +
    # batch job on one index); the loser adopts the winner's committed
    # cache.  The lock makes "check _DONE → clear stale occupant → rename"
    # atomic w.r.t. other committers, so a cache whose _DONE matches (one
    # readers may already hold) is never rmtree'd — without it, B could
    # clear a stale occupant AFTER A committed into the same name.  Readers
    # never take the lock; a lock left by a crashed holder is broken after
    # LOCK_STALE_S.
    import time as _time

    LOCK_STALE_S = 300.0
    lock = f"{out}.lock"

    def _committed() -> bool:
        try:
            with open(done_path) as f:
                return f.read().strip() == gen
        except OSError:
            return False

    won = False
    try:
        deadline = _time.monotonic() + LOCK_STALE_S * 2
        while True:
            if _committed():
                return out
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                try:
                    if _time.time() - os.path.getmtime(lock) > LOCK_STALE_S:
                        # break a crashed holder's lock via RENAME, not
                        # unlink: rename is atomic, so exactly ONE waiter
                        # wins the break — two unlink-based breakers could
                        # each remove the other's fresh lock and both enter
                        # the critical section
                        os.rename(lock, f"{lock}.broken.{os.getpid()}")
                        os.unlink(f"{lock}.broken.{os.getpid()}")
                        continue
                except OSError:
                    continue  # lock vanished / lost the break race — retry
                if _time.monotonic() > deadline:
                    raise RuntimeError(
                        f"could not commit trigram cache at {out}: lock held")
                _time.sleep(0.1)
                continue
            try:
                if _committed():
                    return out
                # occupant (if any) has no matching _DONE → never committed
                # → no reader can hold it → safe to clear under the lock.
                # Refresh the lock mtime first: waiters break locks older
                # than LOCK_STALE_S, so the critical section's long op (this
                # rmtree of a stale occupant) gets the FULL window measured
                # from here, not from lock creation.  Assumption (documented,
                # not enforced): rmtree+rename completes well under
                # LOCK_STALE_S from this touch — beyond that a waiter may
                # break in, which is benign-by-construction (both builds of
                # the same generation have identical content) but
                # double-work.
                os.utime(lock)
                shutil.rmtree(out, ignore_errors=True)
                os.rename(tmp, out)
                won = True
                return out
            finally:
                os.close(fd)
                try:
                    os.unlink(lock)
                except OSError:
                    pass
    finally:
        if not won:
            shutil.rmtree(tmp, ignore_errors=True)  # never leak a tmp build


def _candidates(index_dir: str, query_trigrams: set[str]) -> pa.Table:
    tri_dir = ensure_trigram_index(index_dir)
    t = pq.read_table(tri_dir, filters=[("tri", "in", sorted(query_trigrams))])
    return t


def _scope_filter(terms: list[str], field: str | None) -> list[str]:
    """Keep only the keys visible to this scope: plain vocabulary terms for
    an unscoped query, ``<field>\\x1f*`` posting keys for a field scope
    (returned as the FULL key — already usable as a query Term)."""
    from ..corpus import FIELD_SEP

    if field is None:
        return [t for t in terms if FIELD_SEP not in t]
    pfx = f"{field}{FIELD_SEP}"
    return [t for t in terms if t.startswith(pfx)]


def fuzzy_expand(
    index_dir: str, query_term: str, *, min_sim: float = 0.4,
    max_expansions: int = 8, field: str | None = None,
) -> list[tuple[str, float]]:
    """P2 FUZZY: dictionary terms with word_similarity ≥ min_sim, best first.
    With ``field``, candidates are that field's posting keys (full keys
    returned; similarity measured against the word part)."""
    qt = trigrams(query_term.lower())
    if not qt:
        return []
    cand = _candidates(index_dir, qt)
    if cand.num_rows == 0:
        return []
    counts = cand.group_by("term").aggregate([("tri", "count")])
    terms = counts["term"].to_pylist()
    n_shared = counts["tri_count"].to_pylist()
    keep = set(_scope_filter(terms, field))
    scored = [(t, c / len(qt)) for t, c in zip(terms, n_shared)
              if t in keep and c / len(qt) >= min_sim]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:max_expansions]


def prefix_terms(index_dir: str, frag: str, *, max_expansions: int | None = 64,
                 field: str | None = None) -> list[str]:
    """Dictionary terms starting with ``frag`` — a RANGE scan
    [frag, frag+MAXCHAR) over the term-sorted dictionary parquet (row-group
    stats prune to the matching shard/groups; no vocabulary materialization).
    With ``field``, the scan runs over that field's keyspace (the composite
    keys sort contiguously under their ``<field>\\x1f`` prefix) and returns
    full posting keys."""
    from ..corpus import FIELD_SEP
    from ..state.manifest import resolve_dirs

    frag = frag.lower()  # vocabulary is lowercase, like fuzzy/contains_expand
    dict_dir = resolve_dirs(index_dir)[1]
    lo = f"{field}{FIELD_SEP}{frag}" if field is not None else frag
    hi = lo + "\U0010ffff"
    t = pq.read_table(dict_dir, columns=["term"],
                      filters=[("term", ">=", lo), ("term", "<=", hi)])
    # an unscoped range scan on 'tit' would sweep in field keys like
    # "title\x1fx" — the scope filter keeps each query in its own keyspace
    terms = _scope_filter([x for x in t["term"].to_pylist() if x.startswith(lo)],
                          field)
    terms.sort()
    return terms[:max_expansions]


def suggest_terms(index_dir: str, prefix: str, *, k: int = 10,
                  field: str | None = None) -> pa.Table:
    """Autocomplete: dictionary terms starting with ``prefix``, hottest
    first — ``(term, df)`` ordered (df DESC, term ASC), top ``k``.

    Same pruned RANGE scan as :func:`prefix_terms` ([prefix, prefix+MAXCHAR)
    over the term-sorted dictionary parquet; row-group stats prune to the
    matching shard) but keeps ``df`` — ranking reuses the stats the index
    already maintains (S5/A9), no corpus pass.  With ``field``, the scan
    runs in that field's ``<field>\\x1f`` keyspace and the returned terms
    are the word parts."""
    from ..corpus import FIELD_SEP
    from ..state.manifest import resolve_dirs

    prefix = prefix.lower()  # vocabulary is lowercase, like prefix_terms
    dict_dir = resolve_dirs(index_dir)[1]
    lo = f"{field}{FIELD_SEP}{prefix}" if field is not None else prefix
    hi = lo + "\U0010ffff"
    t = pq.read_table(dict_dir, columns=["term", "df"],
                      filters=[("term", ">=", lo), ("term", "<=", hi)])
    # range scan keeps only its own keyspace (an unscoped 'tit' sweep would
    # otherwise pick up "title\x1fx" field keys), same rule as prefix_terms
    mask = pc.starts_with(t["term"], pattern=lo)
    if field is None:
        mask = pc.and_(mask, pc.invert(pc.match_substring(t["term"], FIELD_SEP)))
    t = t.filter(mask)
    idx = pc.sort_indices(t, sort_keys=[("df", "descending"),
                                        ("term", "ascending")])
    t = t.take(idx).slice(0, k)
    terms = t["term"]
    if field is not None:
        terms = pc.utf8_replace_slice(terms, start=0,
                                      stop=len(f"{field}{FIELD_SEP}"),
                                      replacement="")
    return pa.table({"term": terms, "df": t["df"].cast(pa.int64())})


def did_you_mean(index_dir: str, word: str, *, k: int = 5,
                 min_sim: float = 0.4, field: str | None = None) -> pa.Table:
    """Spelling suggestion ("did you mean …?"): dictionary terms ranked by
    ``(word_similarity DESC, df DESC, term ASC)`` — fuzzy_expand's trigram
    candidate fetch and similarity, with corpus frequency as the tie-break
    so the most COMMON close spelling wins (fuzzy_expand breaks ties
    alphabetically because its job is recall-safe query expansion, not a
    single user-facing correction).  Returns ``(term, sim_i4, df)`` with
    sim ×10⁴ round-half-up.  With ``field``, candidates come from that
    field's keyspace and the word parts are returned."""
    from ..corpus import FIELD_SEP
    from ..state.manifest import resolve_dirs

    qt = trigrams(word.lower())
    if not qt:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "sim_i4": pa.array([], type=pa.int64()),
                         "df": pa.array([], type=pa.int64())})
    cand = _candidates(index_dir, qt)
    counts = cand.group_by("term").aggregate([("tri", "count")])
    keep = set(_scope_filter(counts["term"].to_pylist(), field))
    scored = [(t, c / len(qt)) for t, c in
              zip(counts["term"].to_pylist(), counts["tri_count"].to_pylist())
              if t in keep and c / len(qt) >= min_sim]
    if not scored:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "sim_i4": pa.array([], type=pa.int64()),
                         "df": pa.array([], type=pa.int64())})
    dict_dir = resolve_dirs(index_dir)[1]
    dic = pq.read_table(dict_dir, columns=["term", "df"],
                        filters=[("term", "in", sorted(t for t, _ in scored))])
    df_map = dict(zip(dic["term"].to_pylist(),
                      dic["df"].to_pylist()))
    rows = sorted(((t, s, int(df_map.get(t, 0))) for t, s in scored),
                  key=lambda x: (-x[1], -x[2], x[0]))[:k]
    word_of = (lambda t: t.split(FIELD_SEP, 1)[-1]) if field is not None else (lambda t: t)
    import numpy as np

    return pa.table({
        "term": pa.array([word_of(t) for t, _, _ in rows], type=pa.string()),
        "sim_i4": pa.array(np.floor(np.asarray([s for _, s, _ in rows],
                                               dtype=np.float64) * 10000 + 0.5).astype(np.int64)),
        "df": pa.array([d for _, _, d in rows], type=pa.int64()),
    })


def suffix_terms(index_dir: str, frag: str, *, max_expansions: int | None = 64,
                 field: str | None = None) -> list[str]:
    """Dictionary terms ending with ``frag``.  Uses the trigram index when the
    fragment carries its boundary trigram (pg_trgm pads terms with a trailing
    space, so a suffix of length ≥ 2 has the distinctive ``"xy "`` trigram);
    shorter fragments fall back to a vectorized ends_with scan of the
    dictionary (vocabulary-sized, columnar).  With ``field``, candidates are
    that field's posting keys (full keys returned)."""
    frag = frag.lower()  # vocabulary is lowercase, like fuzzy/contains_expand
    if len(frag) >= 2:
        boundary = f"{frag[-2:]} "  # last two chars + padding space
        cand = _candidates(index_dir, {boundary})
        terms = [t for t in set(_scope_filter(cand["term"].to_pylist(), field))
                 if t.endswith(frag)]
        terms.sort()
        return terms[:max_expansions]
    from ..state.manifest import resolve_dirs

    dict_dir = resolve_dirs(index_dir)[1]
    t = pq.read_table(dict_dir, columns=["term"])
    mask = pc.ends_with(t["term"], pattern=frag)
    terms = _scope_filter(t["term"].filter(mask).to_pylist(), field)
    terms.sort()
    return terms[:max_expansions]


def term_exists(index_dir: str, term: str) -> bool:
    from ..state.manifest import resolve_dirs

    dict_dir = resolve_dirs(index_dir)[1]
    t = pq.read_table(dict_dir, columns=["term"], filters=[("term", "==", term)])
    return t.num_rows > 0


def contains_expand(index_dir: str, pattern: str, *, max_expansions: int | None = 64,
                    field: str | None = None) -> list[str]:
    """P3 CONTAINS (single-token patterns): dictionary terms containing
    ``pattern`` as a substring — trigram-candidate fetch + exact verify, the
    GIN-trigram plan shape.  Patterns shorter than 3 chars have no trigram
    and would need a scan; callers fall back.  With ``field``, candidates are
    that field's posting keys (full keys returned; the substring is verified
    against the word part)."""
    from ..corpus import FIELD_SEP

    p = pattern.lower()
    inner = {p[i : i + 3] for i in range(len(p) - 2)} if len(p) >= 3 else set()
    if not inner:
        return []
    cand = _candidates(index_dir, inner)
    if cand.num_rows == 0:
        return []
    counts = cand.group_by("term").aggregate([("tri", "count")])
    need = len(inner)
    keep = set(_scope_filter(counts["term"].to_pylist(), field))
    terms = [
        t
        for t, c in zip(counts["term"].to_pylist(), counts["tri_count"].to_pylist())
        if c == need and t in keep and p in t.split(FIELD_SEP, 1)[-1]
    ]
    terms.sort()
    return terms[:max_expansions]
