"""Segment searcher — per-segment boolean retrieval + BM25 top-k.

Replaces the Postgres query side of the reference: ``tsvec @@
websearch_to_tsquery`` matching (/root/reference/search/full_text_search.py:
137-140), filter composition (:105-263), ``ts_rank_cd`` ordering (:275-295)
and LIMIT/OFFSET pagination (:297-314).

One call searches ONE segment: decode the query terms' posting blocks
(delta+VByte), evaluate the boolean tree with sorted-array set algebra
(AND = intersect, OR = union, NOT = difference, phrase = positional check),
apply the metadata filter mask from the segment's doc store, score matches
with BM25 (global idf/avgdl shipped in the plan), and return the segment's
top-k plus its exact match count.  The driver merges per-segment top-k heaps
(SURVEY.md §3.1 "Ours").

Used in two modes:
  * task mode    — ``manifest_ds.map_batches(make_search_fn(plan))`` (build
    nothing, read only the needed posting blocks; good for batch queries);
  * actor mode   — ``SegmentSearchActor`` keeps decoded postings + doc store
    cached across queries (the reference's prewarmed-shared-buffers analog,
    SURVEY.md §2.3 T1).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.bm25 import tf_norm
from ..functions.codec import vbyte_decode
from ..functions.querylang import Not, ParsedQuery, Phrase, Term

SEG_ID_COL = "__seg"
SEG_TOTAL_COL = "__seg_total"
SCORE_COL = "score"
ALL_MATCHES = -1  # plan.k sentinel: return every matching doc (export mode)


# ---------------------------------------------------------------- filters
@dataclass(frozen=True)
class FilterSpec:
    """One metadata predicate (AND-composed). Analog of the reference's
    ``add_filter`` clauses F1–F16 (full_text_search.py:105-263)."""

    col: str
    op: str  # == != > >= < <= in not_in between startswith substr isnull
    #          notnull any_eq struct_any udf
    value: Any = None


def apply_filters(table: pa.Table, filters: list[FilterSpec]) -> np.ndarray:
    mask = np.ones(table.num_rows, dtype=bool)
    for f in filters:
        if f.op == "udf":
            # F16 escape hatch (reference raw-SQL `where()`, full_text_search
            # .py:255-263): a user callable Table → bool mask, shipped to the
            # segment tasks like any other plan field
            m_np = np.asarray(f.value(table), dtype=bool)
            if m_np.shape != (table.num_rows,):
                raise ValueError("udf filter must return a bool mask of len(table)")
            mask &= m_np
            continue
        col = table[f.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if f.op in ("any_eq", "struct_any"):
            # F10–F15 jsonb-containment analogs (full_text_search.py:215-253):
            # list<T> / list<struct> columns, "does ANY element match".
            # Vectorized: elementwise compare on the flat child buffer, then
            # scatter matches back to parent rows via list_parent_indices.
            # list_flatten + list_parent_indices are length-aligned (both skip
            # NULL list slots), unlike raw .values which spans them
            flat = pc.list_flatten(col)
            parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
            if f.op == "any_eq":
                m_flat = pc.equal(flat, pa.scalar(f.value).cast(flat.type))
            else:  # struct_any: value is {field: wanted}; element matches ALL
                m_flat = None
                for fld, want in f.value.items():
                    child = pc.struct_field(flat, fld)
                    m1 = pc.equal(child, pa.scalar(want).cast(child.type))
                    m_flat = m1 if m_flat is None else pc.and_(m_flat, m1)
            m_np_flat = pc.fill_null(m_flat, False).to_numpy(zero_copy_only=False)
            m_np = np.zeros(table.num_rows, dtype=bool)
            m_np[parent[m_np_flat]] = True
            mask &= m_np
            continue
        if f.op == "isnull":
            m = pc.is_null(col)
        elif f.op == "notnull":
            m = pc.is_valid(col)
        elif f.op in ("in", "not_in"):
            vals = pa.array(list(f.value)).cast(col.type)
            m = pc.is_in(col, value_set=vals)
            if f.op == "not_in":
                # SQL NOT IN excludes NULLs (NULL NOT IN (...) is not true);
                # pc.is_in returns plain false for NULL inputs, so a bare
                # invert would let them through
                m = pc.and_(pc.invert(m), pc.is_valid(col))
        elif f.op == "between":
            lo = pa.scalar(f.value[0]).cast(col.type)
            hi = pa.scalar(f.value[1]).cast(col.type)
            m = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
        elif f.op == "startswith":
            m = pc.starts_with(col, pattern=str(f.value))
        elif f.op == "substr":
            # CONTAINS filter = the reference's ILIKE '%v%' → case-insensitive
            m = pc.match_substring(col, pattern=str(f.value), ignore_case=True)
        else:
            kernel = {
                "==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
                ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal,
            }[f.op]
            val = pa.scalar(f.value).cast(col.type)
            m = kernel(col, val)
        mask &= pc.fill_null(m, False).to_numpy(zero_copy_only=False)
    return mask


# ---------------------------------------------------------------- plan
@dataclass(frozen=True)
class OrderSpec:
    kind: str = "score"  # score | column | random
    col: str | None = None
    descending: bool = True
    seed: int = 42


@dataclass(frozen=True)
class SearchPlan:
    """Everything a segment needs to answer a query; small + picklable, shipped
    once per task / kept in the actor."""

    queries: tuple[ParsedQuery, ...] = ()  # multiple = AND-ed clauses (P4)
    filters: tuple[FilterSpec, ...] = ()
    order: OrderSpec = field(default_factory=OrderSpec)
    k: int = 100  # per-segment top-k (>= offset+limit of the page)
    idf: dict[str, float] = field(default_factory=dict)
    avgdl: float = 1.0
    id_cols: tuple[str, ...] = ("doc_id",)
    # doc-store columns actually needed (None = all): prune at the read —
    # a MINI-projection query must not drag every metadata column off disk
    need_cols: tuple[str, ...] | None = None
    # "bm25" | "fuzzy_sim".  fuzzy_sim ranks by max word_similarity of the
    # matched expansion terms (reference FUZZY ``_order_sql`` orders by
    # word_similarity, full_text_search.py:277-295 — NOT by rank of the
    # expansion); term_weights carries term → similarity
    score_mode: str = "bm25"
    term_weights: dict[str, float] = field(default_factory=dict)
    # per-field avgdl for "<field>\x1fterm" posting keys (field-local BM25
    # normalization — reference per-field tsvectors)
    avgdl_fields: dict[str, float] = field(default_factory=dict)


# ---------------------------------------------------------------- postings
class _TermPostings:
    __slots__ = ("ords", "tfs", "pos_bytes_per_block", "block_tf_slices",
                 "_positions", "has_pos")

    def __init__(self) -> None:
        self.ords = np.empty(0, dtype=np.int64)
        self.tfs = np.empty(0, dtype=np.int32)
        self.pos_bytes_per_block: list[bytes] = []
        self.block_tf_slices: list[np.ndarray] = []
        self._positions: tuple[np.ndarray, np.ndarray] | None = None
        # False when loaded WITHOUT the pos column (non-phrase terms skip the
        # largest per-term payload); a later phrase query must reload
        self.has_pos = True

    def positions(self) -> tuple[np.ndarray, np.ndarray]:
        """→ (offsets[int64, len=df+1], flat_positions[int64]) per posting entry."""
        if self._positions is None:
            streams = []
            for raw, tfb in zip(self.pos_bytes_per_block, self.block_tf_slices):
                deltas = vbyte_decode(raw).astype(np.int64)
                if len(deltas) == 0:
                    continue
                starts = np.concatenate(([0], np.cumsum(tfb)[:-1]))
                cs = np.cumsum(deltas)
                base = (cs[starts] - deltas[starts])
                streams.append(cs - np.repeat(base, tfb))
            flat = np.concatenate(streams) if streams else np.empty(0, dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(self.tfs, dtype=np.int64)))
            self._positions = (offsets, flat)
        return self._positions


class _PostingsFile:
    """Open postings file + per-row-group term min/max for pruned reads —
    the actor-path analog of a GIN index's b-tree over keys: a term lookup
    touches only the row groups whose [min,max] range covers it."""

    __slots__ = ("pf", "mins", "maxs")

    def __init__(self, path: str):
        self.pf = pq.ParquetFile(path)
        md = self.pf.metadata
        col_idx = md.schema.to_arrow_schema().get_field_index("term")
        self.mins, self.maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            self.mins.append(st.min if st else None)
            self.maxs.append(st.max if st else None)

    def read_terms(self, terms: list[str], with_pos: bool = True) -> pa.Table:
        want = sorted(set(terms))
        rgs = [
            i
            for i in range(len(self.mins))
            if self.mins[i] is None
            or any(self.mins[i] <= t <= self.maxs[i] for t in want)
        ]
        cols = ["term", "block", "ords", "tfs"] + (["pos"] if with_pos else [])
        if not rgs:
            return self.pf.schema_arrow.empty_table().select(cols)
        t = self.pf.read_row_groups(rgs, columns=cols)
        return t.filter(pc.is_in(t["term"], value_set=pa.array(want)))


def load_postings(
    postings_path: str, terms: list[str], pfile: _PostingsFile | None = None,
    with_pos: bool = True,
) -> dict[str, _TermPostings]:
    """``with_pos=False`` skips reading the positional payload — the largest
    per-term column — for terms no phrase atom references."""
    out: dict[str, _TermPostings] = {}
    if not terms:
        return out
    cols = ["term", "block", "ords", "tfs"] + (["pos"] if with_pos else [])
    if pfile is not None:
        t = pfile.read_terms(terms, with_pos=with_pos)
    else:
        t = pq.read_table(
            postings_path,
            columns=cols,
            filters=[("term", "in", sorted(set(terms)))],
        )
    if t.num_rows == 0:
        return out
    t = t.sort_by([("term", "ascending"), ("block", "ascending")])
    terms_col = t["term"].to_pylist()
    ords_col = t["ords"].to_pylist()
    tfs_col = t["tfs"].to_pylist()
    pos_col = t["pos"].to_pylist() if with_pos else None
    # accumulate per-term block arrays and concatenate ONCE per term — a
    # per-block np.concatenate onto the growing array is O(blocks²) copying
    # for hot terms (1M-df term ≈ 1000 blocks)
    acc: dict[str, tuple[list, list]] = {}
    for i, term in enumerate(terms_col):
        tp = out.setdefault(term, _TermPostings())
        tp.has_pos = with_pos
        deltas = vbyte_decode(ords_col[i]).astype(np.int64)
        ords = np.cumsum(deltas)  # per-block deltas: first is absolute
        tfb = vbyte_decode(tfs_col[i]).astype(np.int32)
        o_list, t_list = acc.setdefault(term, ([], []))
        o_list.append(ords)
        t_list.append(tfb)
        if with_pos:
            tp.pos_bytes_per_block.append(pos_col[i])
            tp.block_tf_slices.append(tfb)
    for term, (o_list, t_list) in acc.items():
        tp = out[term]
        tp.ords = o_list[0] if len(o_list) == 1 else np.concatenate(o_list)
        tp.tfs = t_list[0] if len(t_list) == 1 else np.concatenate(t_list)
    return out


# ---------------------------------------------------------------- evaluation
def _phrase_match(postings: dict[str, _TermPostings], phrase: Phrase) -> np.ndarray:
    """Sorted ords of docs where the phrase's terms occur at consecutive
    positions (tsquery ``<->`` semantics over our position streams).

    Fully vectorized: for each phrase term k, build composite keys
    ``doc << 32 | (pos − offset_k)`` over the candidate docs (the key is the
    would-be phrase START position); an occurrence exists iff a key survives
    the intersection across all k.  ``phrase.offsets`` preserve pre-stopword
    gaps (Postgres ``<N>`` distances); None = consecutive.  No per-document
    Python loop."""
    p_offs = phrase.offsets or tuple(range(len(phrase.terms)))
    plists = []
    for t in phrase.terms:
        tp = postings.get(t)
        if tp is None or len(tp.ords) == 0:
            return np.empty(0, dtype=np.int64)
        plists.append(tp)
    cand = plists[0].ords
    for tp in plists[1:]:
        cand = np.intersect1d(cand, tp.ords, assume_unique=True)
    if len(cand) == 0:
        return cand

    keys: np.ndarray | None = None
    for k, tp in enumerate(plists):
        offs, flat = tp.positions()
        if len(flat) < int(offs[-1]):
            # index built with store_positions=False → phrase semantics are
            # undecidable; match nothing (documented, pinned in tests)
            return np.empty(0, dtype=np.int64)
        idx = np.searchsorted(tp.ords, cand)
        starts = offs[idx]
        lens = (offs[idx + 1] - starts).astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        gather = np.repeat(starts, lens) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        )
        pos_k = flat[gather]
        doc_k = np.repeat(cand.astype(np.int64), lens)
        off_k = int(p_offs[k])
        ok = pos_k >= off_k
        key = (doc_k[ok] << np.int64(32)) | (pos_k[ok] - off_k)
        keys = key if keys is None else np.intersect1d(keys, key, assume_unique=True)
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
    return np.unique(keys >> np.int64(32))


def _atom_docs(postings: dict[str, _TermPostings], atom) -> np.ndarray:
    if isinstance(atom, Term):
        tp = postings.get(atom.term)
        return tp.ords if tp is not None else np.empty(0, dtype=np.int64)
    if isinstance(atom, Phrase):
        return _phrase_match(postings, atom)
    raise TypeError(atom)


def evaluate_query(
    postings: dict[str, _TermPostings], query: ParsedQuery, n_docs: int
) -> np.ndarray:
    """Boolean tree → sorted matched ords."""
    if query.is_empty:
        return np.empty(0, dtype=np.int64)
    results = []
    for g in query.groups:
        pos_sets = []
        neg_sets = []
        for a in g.atoms:
            if isinstance(a, Not):
                neg_sets.append(_atom_docs(postings, a.atom))
            else:
                pos_sets.append(_atom_docs(postings, a))
        if pos_sets:
            m = pos_sets[0]
            for s in pos_sets[1:]:
                m = np.intersect1d(m, s, assume_unique=True)
        else:
            m = np.arange(n_docs, dtype=np.int64)
        for s in neg_sets:
            if len(s):
                m = np.setdiff1d(m, s, assume_unique=True)
        results.append(m)
    out = results[0]
    for r in results[1:]:
        out = np.union1d(out, r)
    return out


from ..corpus import FIELD_SEP  # single source of truth for the posting-key separator


def _term_field(term: str) -> str | None:
    i = term.find(FIELD_SEP)
    return term[:i] if i >= 0 else None


def score_docs(
    postings: dict[str, _TermPostings],
    matched: np.ndarray,
    positive_terms: list[str],
    idf_map: dict[str, float],
    dl: np.ndarray,
    avgdl: float,
    dl_fields: dict[str, np.ndarray] | None = None,
    avgdl_fields: dict[str, float] | None = None,
) -> np.ndarray:
    """BM25 over matched ords; fp64, terms iterated in sorted order (fixed
    summation order ⇒ bit-reproducible across parallelism levels).  Terms
    with a field prefix normalize against that FIELD's dl/avgdl."""
    scores = np.zeros(len(matched), dtype=np.float64)
    mdl_cache: dict[str | None, np.ndarray] = {None: dl[matched].astype(np.float64)}
    for term in sorted(set(positive_terms)):
        tp = postings.get(term)
        w = idf_map.get(term, 0.0)
        if tp is None or len(tp.ords) == 0 or w == 0.0:
            continue
        fld = _term_field(term)
        if fld is not None and fld not in mdl_cache:
            fdl = (dl_fields or {}).get(fld)
            mdl_cache[fld] = (fdl[matched].astype(np.float64)
                              if fdl is not None else mdl_cache[None])
        mdl = mdl_cache[fld if fld in mdl_cache else None]
        av = (avgdl_fields or {}).get(fld, avgdl) if fld is not None else avgdl
        idx = np.searchsorted(tp.ords, matched)
        idx_c = np.minimum(idx, len(tp.ords) - 1)
        present = tp.ords[idx_c] == matched
        if not present.any():
            continue
        tfv = tp.tfs[idx_c[present]].astype(np.float64)
        scores[present] += w * tf_norm(tfv, mdl[present], av)
    return scores


def score_docs_maxsim(
    postings: dict[str, _TermPostings],
    matched: np.ndarray,
    term_weights: dict[str, float],
) -> np.ndarray:
    """FUZZY scoring: score(doc) = max over expansion terms present in the
    doc of that term's word_similarity to the query (reference orders FUZZY
    results by ``word_similarity``, full_text_search.py:277-295)."""
    scores = np.zeros(len(matched), dtype=np.float64)
    for term in sorted(term_weights):
        tp = postings.get(term)
        w = float(term_weights[term])
        if tp is None or len(tp.ords) == 0:
            continue
        idx = np.searchsorted(tp.ords, matched)
        idx_c = np.minimum(idx, len(tp.ords) - 1)
        present = tp.ords[idx_c] == matched
        np.maximum(scores, np.where(present, w, 0.0), out=scores)
    return scores


def topk_maxscore(
    postings: dict[str, _TermPostings],
    matched: np.ndarray,
    positive_terms: list[str],
    idf_map: dict[str, float],
    dl: np.ndarray,
    avgdl: float,
    k: int,
    dl_fields: dict[str, np.ndarray] | None = None,
    avgdl_fields: dict[str, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore-style top-k: rank-identical to exhaustive ``score_docs`` +
    lexsort, but prunes the candidate set as terms accumulate.

    Terms are processed in DESCENDING score-bound order (bound = idf ·
    tf_norm(max tf in segment, min dl in segment), computed here from the
    already-decoded postings — exact, and free once postings are in memory.
    The per-block (max_tf, min_dl) parquet columns exist for a future
    skip-before-decode path; note the stored min_dl is whole-doc dl, so a
    block-skip consumer must recompute it for '<field>\\x1fterm' keys against
    the field dl).  After each
    term, any candidate whose current score + Σ(remaining bounds) cannot
    reach the current k-th best is dropped — it can never enter the top-k.
    Scores of survivors are EXACT (same fp64 ops in the same sorted-term
    accumulation order as score_docs: per-candidate, bounds only decide
    membership, never the value).

    Returns (selected ords, their scores) ordered by (score DESC, ord ASC).
    """
    terms = sorted(set(positive_terms))

    def term_dl_av(t: str) -> tuple[np.ndarray, float]:
        # EXACTLY score_docs' field fallback (dl and avgdl fall back
        # INDEPENDENTLY): a segment lacking the dl__<field> column but whose
        # manifest carries avgdl_fields[field] must normalize identically on
        # both paths, or paged and export scoring diverge on that segment
        fld = _term_field(t)
        if fld is None:
            return dl, avgdl
        fdl = (dl_fields or {}).get(fld)
        return (fdl if fdl is not None else dl), (avgdl_fields or {}).get(fld, avgdl)

    infos = []
    for t in terms:
        tp = postings.get(t)
        w = idf_map.get(t, 0.0)
        if tp is None or len(tp.ords) == 0 or w == 0.0:
            continue
        t_dl, t_av = term_dl_av(t)
        ub = w * float(
            tf_norm(
                np.array([tp.tfs.max()], dtype=np.float64),
                np.array([float(t_dl[tp.ords].min())]),
                t_av,
            )[0]
        )
        infos.append((t, tp, w, ub))
    if not infos or len(matched) == 0:
        order = np.lexsort((matched,))[:k]
        return matched[order], np.zeros(min(k, len(matched)), dtype=np.float64)

    # NOTE on fp determinism: accumulation must happen in sorted-term order
    # (same as score_docs) for bit-identical sums, so we accumulate in term
    # order but use the DESCENDING-bound order only for the pruning schedule.
    # Simplest rank-identical construction: accumulate per-candidate partial
    # sums term-by-term in SORTED order, and prune with the suffix-sum of
    # remaining bounds in that same order.
    suffix_ub = np.zeros(len(infos) + 1)
    for i in range(len(infos) - 1, -1, -1):
        suffix_ub[i] = suffix_ub[i + 1] + infos[i][3]

    cand = matched
    scores = np.zeros(len(cand), dtype=np.float64)
    all_dls = {id(dl): dl}
    cdl_by: dict[int, np.ndarray] = {id(dl): dl[cand].astype(np.float64)}
    kth = -np.inf
    for i, (t, tp, w, ub) in enumerate(infos):
        t_dl, t_av = term_dl_av(t)
        key = id(t_dl)
        if key not in cdl_by:
            all_dls[key] = t_dl
            cdl_by[key] = t_dl[cand].astype(np.float64)
        cdl = cdl_by[key]
        idx = np.searchsorted(tp.ords, cand)
        idx_c = np.minimum(idx, len(tp.ords) - 1)
        present = tp.ords[idx_c] == cand
        if present.any():
            tfv = tp.tfs[idx_c[present]].astype(np.float64)
            scores[present] += w * tf_norm(tfv, cdl[present], t_av)
        if len(cand) > 4 * k:
            # current k-th best lower bound
            if len(scores) > k:
                kth = np.partition(scores, -k)[-k]
            remaining = suffix_ub[i + 1]
            keep = scores + remaining >= kth
            if not keep.all():
                cand = cand[keep]
                scores = scores[keep]
                # rebuild per-field candidate-dl gathers against the pruned set
                cdl_by = {key_: all_dls[key_][cand].astype(np.float64)
                          for key_ in cdl_by}
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order]


def _random_keys(id_vals: list[tuple], seed: int) -> np.ndarray:
    """Seeded ORDER BY RANDOM() analog (O3): md5 of seed+identity — identical
    in DuckDB: md5(seed || '|' || id)."""
    return np.array(
        [hashlib.md5(f"{seed}|{'|'.join(str(v) for v in t)}".encode()).hexdigest() for t in id_vals],
        dtype=object,
    )


# ---------------------------------------------------------------- core
def search_segment(seg_path: str, plan: SearchPlan, cache: dict | None = None) -> pa.Table:
    """Search one segment directory → top-k rows (+ exact per-segment count)."""
    import os

    docs_path = os.path.join(seg_path, "docs.parquet")
    postings_path = os.path.join(seg_path, "postings.parquet")
    if cache is not None and docs_path in cache:
        docs = cache[docs_path]  # warm actors keep the full doc store
    else:
        cols = list(plan.need_cols) if (plan.need_cols is not None and cache is None) else None
        docs = pq.read_table(docs_path, columns=cols)
        if cache is not None:
            cache[docs_path] = docs
    n_docs = docs.num_rows
    dl = docs["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
    dl_fields = {
        c[len("dl__"):]: docs[c].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in docs.column_names if c.startswith("dl__")
    }

    # 1. boolean retrieval (AND across .search() clauses — P4)
    if plan.queries:
        all_terms = sorted({t for q in plan.queries for t in q.all_terms()})
        # only phrase atoms need the positional payload — everything else
        # skips the largest per-term column at the read
        need_pos = {t for q in plan.queries for t in q.phrase_terms()}

        def _split(ts):
            return ([t for t in ts if t in need_pos],
                    [t for t in ts if t not in need_pos])

        if cache is not None:
            # per-term posting cache: queries sharing terms skip the parquet
            # read; a cached pos-less entry is a MISS for a phrase query
            _SENT = object()

            def _hit(t):
                e = cache.get((postings_path, t), _SENT)
                if e is _SENT:
                    return False
                return e is None or e.has_pos or t not in need_pos

            missing = [t for t in all_terms if not _hit(t)]
            if missing:
                pf = cache.get(("__pf__", postings_path))
                if pf is None:
                    pf = _PostingsFile(postings_path)
                    cache[("__pf__", postings_path)] = pf
                m_pos, m_nopos = _split(missing)
                loaded = load_postings(postings_path, m_pos, pfile=pf, with_pos=True)
                loaded.update(load_postings(postings_path, m_nopos, pfile=pf, with_pos=False))
                for t in missing:
                    cache[(postings_path, t)] = loaded.get(t)
            postings = {
                t: cache[(postings_path, t)]
                for t in all_terms
                if cache[(postings_path, t)] is not None
            }
        else:
            p_terms, np_terms = _split(all_terms)
            if p_terms and np_terms:
                pf = _PostingsFile(postings_path)
                postings = load_postings(postings_path, p_terms, pfile=pf, with_pos=True)
                postings.update(load_postings(postings_path, np_terms, pfile=pf, with_pos=False))
            else:
                postings = load_postings(postings_path, all_terms, with_pos=bool(p_terms))
        matched = evaluate_query(postings, plan.queries[0], n_docs)
        for q in plan.queries[1:]:
            matched = np.intersect1d(matched, evaluate_query(postings, q, n_docs), assume_unique=True)
    else:
        postings = {}
        matched = np.arange(n_docs, dtype=np.int64)

    # 2. metadata filter mask (filters compose with AND after search — the
    #    reference's subquery-then-outer-filter shape, full_text_search.py:305)
    if plan.filters:
        mask = apply_filters(docs, list(plan.filters))
        matched = matched[mask[matched]]

    total = len(matched)
    empty_sel = matched[:0]

    # 3. scoring + ordering + per-segment top-k
    if total == 0:
        sel = empty_sel
        scores_sel = np.empty(0, dtype=np.float64)
    elif plan.k == ALL_MATCHES:
        # export mode: every matching doc, scored, unordered (the consumer is
        # a streaming Dataset sink, not a results page)
        sel = matched
        if plan.queries and plan.score_mode == "fuzzy_sim":
            scores_sel = score_docs_maxsim(postings, matched, plan.term_weights)
        elif plan.queries:
            pos_terms = [t for q in plan.queries for t in q.positive_terms()]
            scores_sel = score_docs(postings, matched, pos_terms, plan.idf, dl, plan.avgdl,
                                    dl_fields, plan.avgdl_fields)
        else:
            scores_sel = np.zeros(len(sel), dtype=np.float64)
    elif plan.order.kind == "score" and plan.score_mode == "fuzzy_sim":
        scores_all = score_docs_maxsim(postings, matched, plan.term_weights)
        order = np.lexsort((matched, -scores_all))[: min(plan.k, total)]
        sel, scores_sel = matched[order], scores_all[order]
    elif plan.order.kind == "score":
        pos_terms = [t for q in plan.queries for t in q.positive_terms()]
        sel, scores_sel = topk_maxscore(
            postings, matched, pos_terms, plan.idf, dl, plan.avgdl, min(plan.k, total),
            dl_fields, plan.avgdl_fields,
        )
    elif plan.order.kind == "random":
        # vectorized take + column to_pylist (one per-row .as_py() loop over
        # chunked arrays is seconds of pure Python on a 1M-doc segment)
        sub = docs.select(list(plan.id_cols)).take(pa.array(matched))
        ids = list(zip(*[sub[c].to_pylist() for c in plan.id_cols]))
        keys = _random_keys(ids, plan.order.seed)
        order = np.argsort(keys, kind="stable")[: plan.k]
        sel = matched[order]
        scores_sel = np.zeros(len(sel), dtype=np.float64)
    else:  # column ordering (O2) with NULLS LAST
        sub = docs.take(pa.array(matched))
        sort_cols = [(plan.order.col, "descending" if plan.order.descending else "ascending")]
        sort_cols += [(c, "ascending") for c in plan.id_cols]
        order = pc.sort_indices(
            sub, sort_keys=sort_cols, null_placement="at_end"
        ).to_numpy(zero_copy_only=False)[: plan.k]
        sel = matched[order]
        scores_sel = np.zeros(len(sel), dtype=np.float64)

    out = docs.take(pa.array(sel))
    if "ord" in out.column_names:
        out = out.drop_columns(["ord"])  # internal ordinal — never user-facing
    out = out.append_column(SCORE_COL, pa.array(scores_sel, type=pa.float64()))
    out = out.append_column(SEG_TOTAL_COL, pa.array(np.full(len(sel), total, dtype=np.int64)))
    # plan.k >= 1 is enforced at plan construction (build_plan clamps), so a
    # segment that matched >0 docs always emits >=1 count-carrying row
    return out


def make_search_fn(plan: SearchPlan, index_dir: str,
                   seg_dirs: dict[int, str] | None = None):
    """Stateless-task form: map over a dataset of segment-id rows.
    ``seg_dirs`` (from the committed manifest) pins the generation; when not
    given, the manifest is resolved ONCE here on the driver — resolving
    inside each task would let a refresh committing mid-scan hand different
    tasks different generations (mixed results, or KeyError on a changed
    segment count)."""
    if seg_dirs is None:
        from ..state.manifest import resolve_dirs

        seg_dirs = resolve_dirs(index_dir)[0]

    def fn(batch: pa.Table) -> pa.Table:
        from .segment_build import limit_worker_arrow_threads

        limit_worker_arrow_threads()
        dirs = seg_dirs
        tables = []
        for seg_id in batch["seg_id"].to_pylist():
            t = search_segment(dirs[int(seg_id)], plan)
            t = t.append_column(SEG_ID_COL, pa.array(np.full(t.num_rows, seg_id, dtype=np.int32)))
            tables.append(t)
        return pa.concat_tables(tables) if tables else None

    return fn


class SegmentSearchActor:
    """Actor-pool form: postings/doc-store cache persists across queries —
    the analog of the reference's prewarmed shared buffers (README.md:29-34).
    Use with ``map_batches(SegmentSearchActor, fn_constructor_kwargs=...,
    concurrency=N)`` or as a raw @ray.remote actor via SearchService."""

    def __init__(self, index_dir: str, seg_dirs: dict[int, str] | None = None):
        from ..state.manifest import resolve_dirs

        self.index_dir = index_dir
        # resolve once at construction: the actor serves THIS committed
        # generation for its lifetime (generation-qualified dirs stay valid
        # even while a refresh writes the next one).  A caller that already
        # holds a pinned generation (SearchService) passes ``seg_dirs`` so an
        # actor RESTART after a refresh commit rejoins its siblings'
        # generation instead of resolving the newer one from disk.
        self.seg_dirs = dict(seg_dirs) if seg_dirs is not None else resolve_dirs(index_dir)[0]
        self.cache: dict = {}

    def search(self, seg_id: int, plan: SearchPlan) -> pa.Table:
        t = search_segment(self.seg_dirs[seg_id], plan, cache=self.cache)
        return t.append_column(SEG_ID_COL, pa.array(np.full(t.num_rows, seg_id, dtype=np.int32)))
