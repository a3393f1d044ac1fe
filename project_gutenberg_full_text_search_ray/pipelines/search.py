"""Query execution: builder API + driver-side merge (SURVEY.md §3.1).

Mirrors the reference's library surface (/root/reference/search/
full_text_search.py): ``engine.query(crosswalk).search(...).filter sugar
.order_by(...)[page, page_size]`` then ``engine.execute(q)`` — but executes as
a Ray Data pipeline over the index's segment list: each segment task returns
its exact match count and top-k rows in one round trip (the reference runs
TWO SQL statements, count then fetch — :316-330 vs :297-314; we fuse them),
and the driver merges per-segment heaps with the same deterministic
comparator.

Pagination contract replicated from the reference: page_size default 28,
clamped to [1,100] (opds.py:55-60, full_text_search.py:82); page clamped to
[1, total_pages] (full_text_search.py:369-372).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..corpus import CorpusSpec
from ..crosswalks import Crosswalk, Transformer, apply_crosswalk
from ..functions.analyzer import Analyzer
from ..functions.bm25 import idf as bm25_idf
from ..functions.querylang import ParsedQuery, parse_query
from ..state.manifest import load_index_manifest, resolve_dirs
from ..functions.arrowutil import table_refs
from ..stages.segment_search import (
    SCORE_COL,
    SEG_ID_COL,
    SEG_TOTAL_COL,
    FilterSpec,
    OrderSpec,
    SearchPlan,
    _random_keys,
    make_search_fn,
    search_segment,
)

DEFAULT_PAGE_SIZE = 28
MAX_PAGE_SIZE = 100
RELEVANCE = "__relevance__"
RANDOM = "__random__"


@dataclass
class SearchQuery:
    """Accumulating query builder — analog of reference ``SearchQuery``
    (full_text_search.py:67-263). Pure data; no I/O until execute()."""

    crosswalk: Crosswalk = Crosswalk.FULL
    queries: list[ParsedQuery] = field(default_factory=list)
    fuzzy_terms: list[tuple[str, str | None]] = field(default_factory=list)
    contains_patterns: list[tuple[str, str | None]] = field(default_factory=list)
    filters: list[FilterSpec] = field(default_factory=list)
    order: OrderSpec = field(default_factory=OrderSpec)
    page: int = 1
    page_size: int = DEFAULT_PAGE_SIZE
    _analyzer: Analyzer | None = None

    # -- search clauses (P1/P4); chained calls AND together
    def search(self, text: str, field_filter: tuple[str, str] | None = None,
               field: str | None = None) -> "SearchQuery":
        from ..functions.analyzer import DEFAULT_ANALYZER
        from ..functions.querylang import scope_to_field

        parsed = parse_query(text, self._analyzer or DEFAULT_ANALYZER)
        if field is not None:
            # PER-FIELD search (reference per-field tsvectors,
            # mv_books_dc.sql:135-194): terms rewrite to the field's posting
            # keyspace — match, tf, df, dl and avgdl are all field-local, so
            # rank == rank against the field vector (full_text_search.py:
            # 277-279), not a metadata-filtered whole-text rank
            parsed = scope_to_field(parsed, field)
        self.queries.append(parsed)
        if field_filter is not None:
            # metadata-scoped search (SURVEY.md §1.4 flat scope columns) —
            # e.g. field_filter=("role","assistant")
            self.filters.append(FilterSpec(field_filter[0], "==", field_filter[1]))
        return self

    def search_fuzzy(self, term: str, field: str | None = None) -> "SearchQuery":
        """P2 FUZZY: typo-tolerant — expands to dictionary terms by trigram
        word_similarity at plan time (stages/trigram.py), then OR-searches.
        ``field`` scopes both match and similarity ranking to that field's
        posting keyspace (reference honors SearchField for FUZZY)."""
        self.fuzzy_terms.append((term, field))
        return self

    def search_contains(self, pattern: str, field: str | None = None) -> "SearchQuery":
        """P3 CONTAINS (single-token substring): trigram-candidate dictionary
        terms verified exactly, then OR-searched — the GIN-trigram plan.
        ``field`` scopes matching to that field's posting keyspace."""
        self.contains_patterns.append((pattern, field))
        return self

    # -- filter sugar mirroring F1–F16 (generic engine: named by intent)
    def doc(self, **id_vals: Any) -> "SearchQuery":  # F1 etext()
        for c, v in id_vals.items():
            self.filters.append(FilterSpec(c, "==", v))
        return self

    def docs_in(self, col: str, ids: list) -> "SearchQuery":  # F2 etexts()
        self.filters.append(FilterSpec(col, "in", list(ids)))
        return self

    def range_gte(self, col: str, v: Any) -> "SearchQuery":  # F3/F7/F8
        self.filters.append(FilterSpec(col, ">=", v))
        return self

    def range_lte(self, col: str, v: Any) -> "SearchQuery":
        self.filters.append(FilterSpec(col, "<=", v))
        return self

    def eq(self, col: str, v: Any) -> "SearchQuery":  # F4/F5/F10-F15 analogs
        self.filters.append(FilterSpec(col, "==", v))
        return self

    def ne(self, col: str, v: Any) -> "SearchQuery":
        self.filters.append(FilterSpec(col, "!=", v))
        return self

    def isnull(self, col: str) -> "SearchQuery":  # tool IS NULL (F4 analog)
        self.filters.append(FilterSpec(col, "isnull"))
        return self

    def notnull(self, col: str) -> "SearchQuery":
        self.filters.append(FilterSpec(col, "notnull"))
        return self

    def prefix(self, col: str, p: str) -> "SearchQuery":  # F9 locc prefix
        self.filters.append(FilterSpec(col, "startswith", p))
        return self

    def contains(self, col: str, s: str) -> "SearchQuery":  # P3 CONTAINS
        self.filters.append(FilterSpec(col, "substr", s))
        return self

    def where(self, spec: FilterSpec) -> "SearchQuery":  # F16 escape hatch
        self.filters.append(spec)
        return self

    # -- ordering (O1–O3)
    def order_by(self, col: str, descending: bool = True, seed: int = 42) -> "SearchQuery":
        if col == RELEVANCE:
            self.order = OrderSpec("score")
        elif col == RANDOM:
            self.order = OrderSpec("random", seed=seed)
        else:
            self.order = OrderSpec("column", col=col, descending=descending)
        return self

    # -- pagination (O4): q[page, page_size]
    def __getitem__(self, key) -> "SearchQuery":
        if isinstance(key, tuple):
            page, size = key
        else:
            page, size = key, self.page_size
        self.page = max(1, int(page))
        self.page_size = min(MAX_PAGE_SIZE, max(1, int(size)))
        return self


@dataclass
class SearchResult:
    total: int
    page: int
    page_size: int
    table: pa.Table

    @property
    def rows(self) -> list[dict]:
        return self.table.to_pylist()


def _merge_comparator_indices(t: pa.Table, order: OrderSpec, id_cols: tuple[str, ...]) -> np.ndarray:
    if order.kind == "score":
        sort_keys = [(SCORE_COL, "descending")] + [(c, "ascending") for c in id_cols]
        return pc.sort_indices(t, sort_keys=sort_keys, null_placement="at_end").to_numpy(zero_copy_only=False)
    if order.kind == "random":
        ids = list(zip(*[t[c].to_pylist() for c in id_cols]))
        keys = _random_keys(ids, order.seed)
        return np.argsort(keys, kind="stable")
    sort_keys = [(order.col, "descending" if order.descending else "ascending")]
    sort_keys += [(c, "ascending") for c in id_cols]
    return pc.sort_indices(t, sort_keys=sort_keys, null_placement="at_end").to_numpy(zero_copy_only=False)


def merge_segment_partials(parts, order: OrderSpec, id_cols: tuple[str, ...],
                           k: int, empty_fn) -> tuple[int, pa.Table]:
    """Per-segment partial top-k tables → (total, merged top-k).  The SINGLE
    owner of the distributed merge contract: the engine's fan-out branch and
    the SearchService actor pool both call this, so totals / ordering /
    tie-break cannot drift between the two query paths."""
    parts = [p for p in parts if p is not None and p.num_rows]
    if not parts:
        return 0, empty_fn()
    merged = pa.concat_tables(parts)
    segsum = merged.group_by(SEG_ID_COL).aggregate([(SEG_TOTAL_COL, "max")])
    total = int(pc.sum(segsum[f"{SEG_TOTAL_COL}_max"]).as_py() or 0)
    merged = merged.drop_columns(
        [c for c in (SEG_ID_COL, SEG_TOTAL_COL) if c in merged.column_names])
    idx = _merge_comparator_indices(merged, order, id_cols)[:k]
    return total, merged.take(pa.array(idx))


def paginate_result(total: int, merged: pa.Table, q: "SearchQuery",
                    spec: CorpusSpec, custom) -> SearchResult:
    """Page-clamp + crosswalk tail shared by ``engine.execute`` and
    ``SearchService.execute`` — one owner of the pagination contract."""
    total_pages = max(1, math.ceil(total / q.page_size)) if total else 1
    page = min(q.page, total_pages)
    off = (page - 1) * q.page_size
    tbl = apply_crosswalk(merged.slice(off, q.page_size), q.crosswalk, spec, custom)
    return SearchResult(total=total, page=page, page_size=q.page_size, table=tbl)


class FullTextSearchEngine:
    """Engine facade — analog of reference ``FullTextSearch``
    (full_text_search.py:333-389). Holds manifest + dictionary cache; the
    per-query heavy lifting happens in segment tasks/actors."""

    def __init__(self, index_dir: str, mode: str = "ray"):
        self.index_dir = index_dir
        self.mode = mode  # "ray" (segment tasks) | "local" (driver loop; tests)
        self.manifest = load_index_manifest(index_dir)
        c = self.manifest["corpus"]
        self.spec = CorpusSpec(tuple(c["id_cols"]), c["text_col"], tuple(c["meta_cols"]), c["name"],
                      tuple(c.get("field_cols") or ()))
        self.analyzer = Analyzer(
            stopwords=self.manifest["analyzer"]["stopwords"], stem=self.manifest["analyzer"]["stem"]
        )
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"]) or 1.0
        self.avgdl_fields = {
            f: (float(v) or 1.0)
            for f, v in (self.manifest.get("avgdl_fields") or {}).items()
        }
        self.seg_ids = [s["seg_id"] for s in self.manifest["segments"]]
        # every path resolves through the COMMITTED manifest (generation-
        # qualified dirs): a refresh writing the next generation is invisible
        self.seg_dirs, self.dict_dir = resolve_dirs(index_dir, self.manifest)
        self._df_cache: dict[str, int] = {}
        # browse/values/hierarchy vocabulary cap: value_counts refuses a
        # column whose KMV-estimated cardinality exceeds this (a raw ts/id
        # column would otherwise materialize a corpus-sized vocabulary on
        # the driver); the HTTP layer maps the refusal to 400
        self.max_browse_vocab: int = 100_000
        self._vocab_cache: dict[str, pa.Table] = {}
        self._children_cache: dict[tuple, pa.Table] = {}
        self._custom_transformer: Transformer | None = None
        self._dict_paths = sorted(
            os.path.join(self.dict_dir, f)
            for f in os.listdir(self.dict_dir)
            if f.endswith(".parquet")
        )

    # ------------------------------------------------------------ public API
    def query(self, crosswalk: Crosswalk = Crosswalk.FULL) -> SearchQuery:
        return SearchQuery(crosswalk=crosswalk, _analyzer=self.analyzer)

    def set_custom_transformer(self, fn: Transformer) -> None:  # C5 hook
        self._custom_transformer = fn

    def count(self, q: SearchQuery) -> int:  # A1
        return self._run(q, count_only=True)[0]

    def get(self, *id_vals, crosswalk: Crosswalk = Crosswalk.FULL) -> dict | None:
        """Point lookup by document identity — the reference README's
        ``fts.get(1342)`` (/root/reference/README.md:107; documented there
        but absent from the reference's own code, SURVEY §2.10).  Positional
        values map onto ``spec.id_cols`` in order: ``eng.get(conv, turn)``
        for transcripts, ``eng.get(doc_id)`` for documents.  Returns the
        crosswalked row dict, or None when absent."""
        if len(id_vals) != len(self.spec.id_cols):
            raise ValueError(
                f"get() takes {len(self.spec.id_cols)} id value(s) "
                f"({', '.join(self.spec.id_cols)}), got {len(id_vals)}")
        q = self.query(crosswalk)
        for col, v in zip(self.spec.id_cols, id_vals):
            q = q.eq(col, v)
        q = q.order_by(self.spec.id_cols[0], descending=False)[1, 1]
        res = self.execute(q)
        return res.rows[0] if res.table.num_rows else None

    def get_many(self, ids: list, *, crosswalk: Crosswalk = Crosswalk.FULL) -> pa.Table:
        """Batch point lookup — the reference README's
        ``fts.get_many([1342, 84, 11])`` (/root/reference/README.md:110).
        ``ids`` are scalars for single-column identity or tuples matching
        ``spec.id_cols``.  Identity-ordered table of the found docs (absent
        ids are simply missing — same contract as SQL ``IN``).

        Shape: zone-map pruning + a vectorized ``is_in`` on the leading id
        column narrows segments, then one vectorized packed-key ``is_in``
        (udf filter, no per-row Python) exact-matches the composite
        identity inside each surviving segment."""
        import pyarrow.compute as pc

        id_cols = self.spec.id_cols
        norm = [tuple(v) if isinstance(v, (tuple, list)) else (v,) for v in ids]
        if not norm:
            return apply_crosswalk(self._empty_result_table(), crosswalk,
                                   self.spec, self._custom_transformer)
        if any(len(t) != len(id_cols) for t in norm):
            raise ValueError(f"each id must have {len(id_cols)} value(s) "
                             f"({', '.join(id_cols)})")
        q = self.query(crosswalk).docs_in(id_cols[0],
                                          sorted({t[0] for t in norm}))
        if len(id_cols) > 1:
            wanted = pa.array(["\x1f".join(str(x) for x in t) for t in norm])

            def match(t: pa.Table) -> np.ndarray:
                packed = pc.binary_join_element_wise(
                    *[pc.cast(t[c], pa.string()) for c in id_cols], "\x1f")
                return pc.is_in(packed, value_set=wanted).to_numpy(
                    zero_copy_only=False)

            q = q.where(FilterSpec(None, "udf", match))
        q = q.order_by(id_cols[0], descending=False)
        # internal page: a point-lookup batch is bounded by len(ids), not
        # the facade's MAX_PAGE_SIZE browse clamp
        q.page, q.page_size = 1, len(norm)
        return self.execute(q).table

    def execute(self, q: SearchQuery) -> SearchResult:
        total, merged = self._run(q)
        return paginate_result(total, merged, q, self.spec, self._custom_transformer)

    def matches_dataset(self, q: SearchQuery) -> rd.Dataset:
        """Stream EVERY matching doc as a Ray Dataset (no top-k, no driver
        materialization) — corpus filtering by boolean/phrase search, the
        training-data-pipeline primitive ("keep all turns matching X but not
        Y").  Consume with ``.write_parquet`` / ``iter_batches`` /
        downstream ``map_batches``; rows carry the BM25 score for weighting."""
        from ..stages.segment_search import ALL_MATCHES

        plan = self.build_plan(q, ALL_MATCHES)
        seg_ids = self.prune_segments(q.filters) if q.filters else self.seg_ids
        segs = rd.from_items([{"seg_id": s} for s in seg_ids])
        fn = make_search_fn(plan, self.index_dir)

        def run_and_strip(batch: pa.Table) -> pa.Table:
            out = fn(batch)
            drop = [c for c in (SEG_ID_COL, SEG_TOTAL_COL) if c in out.column_names]
            return out.drop_columns(drop)

        return segs.map_batches(run_and_strip, batch_format="pyarrow", batch_size=1)

    def contains_multi_dataset(
        self, pattern: str, filters: list[FilterSpec] | None = None,
        max_combos: int = 256, field: str | None = None,
    ) -> rd.Dataset:
        """P3 CONTAINS for patterns spanning token boundaries — the reference
        ``ILIKE '%q%'`` over a GIN trigram index
        (/root/reference/search/full_text_search.py:144-146,
        tables/mv_books_dc.sql:472-487).  Index-assisted plan:

        1. decompose the pattern at token boundaries: the FIRST fragment must
           be a dictionary-term suffix, INNER fragments exact dictionary
           terms, the LAST a prefix — expanded via the trigram index /
           sorted-dictionary range scans (stages/trigram.py);
        2. candidate docs = OR over (first × last) phrase combinations
           through the positional posting lists (no corpus scan);
        3. VERIFY the literal substring against the source text (candidates
           re-fetched from the corpus parquet recorded in the manifest —
           positions collapse separators, so "window, merge" phrase-matches
           but must not substring-match "window merge").

        Edge expansions are UNBOUNDED (truncating them would silently drop
        matching docs); the plan instead falls back to a full vectorized
        substring scan when the pattern has no indexable shape (edge fragment
        too short + absent inner term) or the combination count exceeds
        ``max_combos``.  Returns a streaming Dataset of verified matching
        docs (export-mode semantics, like ``matches_dataset``).

        Matching is CASE-INSENSITIVE end to end (candidates come from the
        lowercased posting vocabulary; verify/scan lowercase the source),
        the reference's ILIKE semantics.  ``field`` scopes the operator to a
        per-field keyspace: candidates phrase-match the field's postings and
        the literal verify runs against that column of the source parquet."""
        import pyarrow.compute as _pc

        from ..corpus import field_term
        from ..functions.querylang import AndGroup, ParsedQuery, Phrase, Term
        from ..stages.dedup import DocFetcher
        from ..stages.trigram import contains_expand, prefix_terms, suffix_terms, term_exists

        p = pattern.lower()
        frags = self.analyzer.tokenize(p)
        input_paths = self.manifest.get("input_paths")
        if not input_paths:
            raise ValueError(
                "contains_multi needs manifest input_paths (index built from parquet)")
        if field is not None and field not in self.spec.field_cols:
            raise ValueError(f"contains_multi field {field!r} is not an indexed field_col")
        text_col = field if field is not None else self.spec.text_col
        id_cols = self.spec.id_cols

        def scoped(t: str) -> str:
            return field_term(field, t) if field is not None else t

        def full_scan() -> rd.Dataset:
            ds = rd.read_parquet(input_paths, columns=[*id_cols, text_col])
            return ds.map_batches(
                lambda b: b.filter(_pc.match_substring(b[text_col], p, ignore_case=True)),
                batch_format="pyarrow",
            )

        if len(frags) <= 1:
            # single-token substring: unbounded expansion keeps this exact;
            # field scope expands within the field's own keyspace (full
            # posting keys come back pre-scoped)
            terms = contains_expand(self.index_dir, p, max_expansions=None,
                                    field=field) if frags else []
            if not terms:
                return full_scan()
            q = self.query()
            q.queries.append(ParsedQuery(tuple(AndGroup((Term(t),)) for t in terms)))
            for f in filters or []:
                q = q.where(f)
            return self.matches_dataset(q)

        # edge expansions are scope-aware (full posting keys when field);
        # inner fragments must exist as exact terms of the scoped keyspace
        firsts = suffix_terms(self.index_dir, frags[0], max_expansions=None, field=field)
        lasts = prefix_terms(self.index_dir, frags[-1], max_expansions=None, field=field)
        inner = list(frags[1:-1])
        if not firsts or not lasts or any(
                not term_exists(self.index_dir, scoped(t)) for t in inner):
            return full_scan() if (not firsts or not lasts) else rd.from_arrow(
                self._empty_result_table())
        if len(firsts) * len(lasts) > max_combos:
            return full_scan()
        groups = []
        for a in firsts:
            for b in lasts:
                seq = (a, *(scoped(t) for t in inner), b)
                groups.append(AndGroup((Phrase(seq) if len(seq) > 1 else Term(seq[0]),)))
        q = self.query()
        q.queries.append(ParsedQuery(tuple(groups)))
        for f in filters or []:
            q = q.where(f)
        candidates = self.matches_dataset(q)
        fetcher = DocFetcher(input_paths, id_cols[0], [text_col]) if len(id_cols) == 1 else None

        def verify(batch: pa.Table) -> pa.Table:
            if fetcher is not None:
                texts = fetcher.fetch(batch[id_cols[0]].to_pylist())
                keep = [p in (texts.get(i) or "").lower()
                        for i in batch[id_cols[0]].to_pylist()]
            else:
                # composite identity: filtered read on the leading id column,
                # then match rows on the full identity
                t = pq.read_table(
                    input_paths, columns=[*id_cols, text_col],
                    filters=[(id_cols[0], "in", list(set(batch[id_cols[0]].to_pylist())))],
                )
                lookup = {
                    tuple(r[c] for c in id_cols): r[text_col] for r in t.to_pylist()
                }
                keys = zip(*[batch[c].to_pylist() for c in id_cols])
                keep = [p in (lookup.get(tuple(kk)) or "").lower() for kk in keys]
            return batch.filter(pa.array(keep, type=pa.bool_()))

        return candidates.map_batches(verify, batch_format="pyarrow")

    def top_docs(self, q: SearchQuery, n: int) -> pa.Table:
        """Top-n matched docs with scores (facet sampling, A7). Bypasses the
        page-size clamp; n caps per-segment and merged k."""
        total, merged = self._run(q, k_override=n)
        return merged.slice(0, n)

    def stored_column_type(self, col: str) -> pa.DataType:
        """Arrow type of a stored column — one parquet FOOTER read of the
        first segment's doc store (never a corpus pass; callers that only
        need the type must not trigger the vocabulary groupby)."""
        if col not in (*self.spec.meta_cols, *self.spec.id_cols):
            raise ValueError(f"{col!r} is not a stored column "
                             f"(stored: {(*self.spec.id_cols, *self.spec.meta_cols)})")
        schema = pq.read_schema(
            os.path.join(self.seg_dirs[self.seg_ids[0]], "docs.parquet"))
        return schema.field(col).type

    def value_counts(self, col: str) -> pa.Table:
        """Controlled-vocabulary discovery — the reference ships its
        vocabularies as API constants (Language / LoCCMainClass /
        CuratedBookshelves / FileType, /root/reference/search/
        constants.py:18-310); a transcript corpus's role/tool values are
        data, so this DERIVES them: distinct values + doc counts of a stored
        column via one column-pruned read + groupby over the segment doc
        stores.  Cached per column — vocabularies only change on refresh and
        the engine is generation-pinned, so the cache can never go stale.
        The result is vocabulary-sized and held driver-side: right for
        enum-like columns (role/tool/lang) and id prefixes; a column whose
        cardinality approaches the corpus (e.g. a raw timestamp) makes this
        a corpus-sized materialization — don't browse on those."""
        if col not in (*self.spec.meta_cols, *self.spec.id_cols):
            raise ValueError(f"value_counts: {col!r} is not a stored column "
                             f"(stored: {(*self.spec.id_cols, *self.spec.meta_cols)})")
        if col not in self._vocab_cache:
            files = [os.path.join(self.seg_dirs[s], "docs.parquet")
                     for s in self.seg_ids]

            # cardinality precheck (KMV sketch, stages/sketches.py): one
            # column-pruned streaming pass whose exchange is ≤ k hashes per
            # block, run ONCE per column (success populates the vocabulary
            # cache).  Enforces the docstring's "don't browse on those"
            # instead of advising it — ?col=ts on a real corpus would
            # otherwise concat a corpus-sized vocabulary on the driver.
            from ..stages.sketches import distinct_count

            est, _exact = distinct_count(
                rd.read_parquet(files, columns=[col]), col, k=1024)
            if est > self.max_browse_vocab:
                raise ValueError(
                    f"value_counts({col!r}): ~{est} distinct values exceeds "
                    f"the browseable-vocabulary cap ({self.max_browse_vocab})"
                    f" — browse/values/hierarchy need an enum-like column")

            def partial(b: pa.Table) -> pa.Table:
                # per-block partial counts (classic combiner): each block
                # emits vocabulary-sized rows, so there is NO all-to-all
                # exchange — the driver folds tiny partials
                return b.select([col]).group_by(col).aggregate([([], "count_all")])

            parts = [t for t in ray.get(table_refs(
                rd.read_parquet(files, columns=[col])
                .map_batches(partial, batch_format="pyarrow")))
                if t.num_rows and "count_all" in t.column_names]
            if not parts:
                self._vocab_cache[col] = pa.table({
                    col: pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64())})
                return self._vocab_cache[col]
            merged = pa.concat_tables(parts).group_by(col).aggregate(
                [("count_all", "sum")])
            idx = pc.sort_indices(merged, sort_keys=[(col, "ascending")],
                                  null_placement="at_end")
            merged = merged.take(idx)
            self._vocab_cache[col] = pa.table({
                col: merged[col],
                "n": merged["count_all_sum"].cast(pa.int64())})
        return self._vocab_cache[col]

    def _prefix_level(self, col: str, prefix: str, clen: int) -> pa.Table:
        """(trunc, n, n_exact, n_longer) per distinct ``clen``-char truncation
        of the non-null values starting with ``prefix`` — ONE prefix-scoped,
        column-pruned combiner pass over the segment doc stores.

        This is the hierarchy surface's scale path (r4): per-block partials
        and the merged table are bounded by that prefix's BRANCHING FACTOR,
        never by column cardinality — a value_counts-derived hierarchy would
        materialize a corpus-sized vocabulary on the driver for id-like
        columns (exactly what max_browse_vocab refuses).  String columns
        additionally push a sound [prefix, next-prefix) range predicate into
        the parquet read, so deep-prefix navigation over the id-sorted doc
        stores prunes to the row groups that can match.  Cached (512-entry
        LRU-ish bound shared with the children cache)."""
        if col not in (*self.spec.meta_cols, *self.spec.id_cols):
            raise ValueError(f"prefix hierarchy: {col!r} is not a stored column "
                             f"(stored: {(*self.spec.id_cols, *self.spec.meta_cols)})")
        key = ("__level__", col, prefix, clen)
        if key in self._children_cache:
            return self._children_cache[key]
        if len(self._children_cache) >= 512:
            self._children_cache.pop(next(iter(self._children_cache)))
        files = [os.path.join(self.seg_dirs[s], "docs.parquet")
                 for s in self.seg_ids]
        read_kwargs: dict = {}
        ctype = self.stored_column_type(col)
        if prefix and (pa.types.is_string(ctype) or pa.types.is_large_string(ctype)):
            import pyarrow.dataset as pds

            expr = pds.field(col) >= prefix
            try:
                if ord(prefix[-1]) < 0x10FFFF:
                    # every string starting with `prefix` is < this bound
                    hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
                    expr = expr & (pds.field(col) < hi)
            except (ValueError, UnicodeEncodeError):
                pass  # unencodable bound: lower bound alone is still sound
            read_kwargs["filter"] = expr

        out_schema = pa.schema([("trunc", pa.string()), ("n", pa.int64()),
                                ("n_exact", pa.int64()), ("n_longer", pa.int64())])

        def partial(b: pa.Table) -> pa.Table:
            v = b[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if pa.types.is_null(v.type):
                return out_schema.empty_table()
            if not (pa.types.is_string(v.type) or pa.types.is_large_string(v.type)):
                v = v.cast(pa.string())
            m = pc.fill_null(
                pc.and_kleene(pc.is_valid(v), pc.starts_with(v, prefix)), False)
            sub = v.filter(m)
            if len(sub) == 0:
                return out_schema.empty_table()
            ln = pc.utf8_length(sub)
            g = pa.table({
                "trunc": pc.utf8_slice_codeunits(sub, 0, clen),
                "n": pa.array(np.ones(len(sub), dtype=np.int64)),
                "n_exact": pc.cast(pc.equal(ln, clen), pa.int64()),
                "n_longer": pc.cast(pc.greater(ln, clen), pa.int64()),
            }).group_by("trunc").aggregate(
                [("n", "sum"), ("n_exact", "sum"), ("n_longer", "sum")])
            # select by NAME — pyarrow group_by key/aggregate column order is
            # version-dependent
            return pa.table({"trunc": g["trunc"], "n": g["n_sum"],
                             "n_exact": g["n_exact_sum"],
                             "n_longer": g["n_longer_sum"]})

        parts = [t for t in ray.get(table_refs(
            rd.read_parquet(files, columns=[col], **read_kwargs)
            .map_batches(partial, batch_format="pyarrow")))
            if t.num_rows and "trunc" in t.column_names]
        if not parts:
            out = out_schema.empty_table()
        else:
            merged = pa.concat_tables(parts).group_by("trunc").aggregate(
                [("n", "sum"), ("n_exact", "sum"), ("n_longer", "sum")])
            merged = merged.take(pc.sort_indices(merged["trunc"]))
            out = pa.table({"trunc": merged["trunc"],
                            "n": merged["n_sum"].cast(pa.int64()),
                            "n_exact": merged["n_exact_sum"].cast(pa.int64()),
                            "n_longer": merged["n_longer_sum"].cast(pa.int64())})
        self._children_cache[key] = out
        return out

    def prefix_exact_count(self, col: str, prefix: str) -> int:
        """Docs whose value's STRING form equals ``prefix`` exactly — the
        node's own documents in a variable-length-value hierarchy (values
        ['3', '30']: node '3' has children AND its own docs; children alone
        would make the exact-'3' docs unreachable and child counts would not
        sum to the parent's).  One cached prefix-scoped pass, no vocabulary."""
        level = self._prefix_level(col, prefix, len(prefix))
        m = pc.fill_null(pc.equal(level["trunc"], prefix), False)
        return int(pc.sum(level["n_exact"].filter(m)).as_py() or 0)

    def prefix_children(self, col: str, prefix: str, depth: int = 1) -> pa.Table:
        """Prefix-hierarchy navigation (the reference's LoCC class tree with
        has-children lookups, /root/reference/opds/opds.py:598-811): child
        prefixes ``len(prefix)+depth`` chars deep under ``prefix``, each with
        its doc count and a ``has_children`` flag (some value extends past
        the child prefix).

        Derived from ``_prefix_level`` — one prefix-scoped, predicate-pushed
        combiner pass per navigated (prefix, depth), cached.  Exchanges and
        the driver-held result are bounded by the prefix's branching factor,
        so id-like (corpus-cardinality) columns navigate safely; the old
        value_counts derivation is reserved for enum-like browse/values,
        where max_browse_vocab enforces the cap."""
        plen, clen = len(prefix), len(prefix) + depth
        level = self._prefix_level(col, prefix, clen)
        # drop values no longer than the prefix itself (the node's own docs,
        # surfaced by prefix_exact_count instead)
        m = pc.fill_null(pc.greater(pc.utf8_length(level["trunc"]), plen), False)
        sub = level.filter(m)
        return pa.table({
            "child": sub["trunc"],
            "n": sub["n"],
            "has_children": pc.greater(sub["n_longer"], 0),
        })

    # ------------------------------------------------------------ internals
    def suggest(self, prefix: str, k: int = 10, *, field: str | None = None) -> pa.Table:
        """Autocomplete over the index dictionary: terms starting with
        ``prefix``, (df DESC, term ASC), top ``k`` — a pruned range scan of
        the stats the index already maintains (stages/trigram.suggest_terms)."""
        from ..stages.trigram import suggest_terms

        return suggest_terms(self.index_dir, prefix, k=k, field=field)

    def did_you_mean(self, word: str, k: int = 5, *, min_sim: float = 0.4,
                     field: str | None = None) -> pa.Table:
        """Spelling suggestion: dictionary terms by (word_similarity DESC,
        df DESC, term ASC) — trigram candidates + frequency tie-break
        (stages/trigram.did_you_mean)."""
        from ..stages.trigram import did_you_mean

        return did_you_mean(self.index_dir, word, k=k, min_sim=min_sim,
                            field=field)

    def ts_stat(self, k: int | None = None, *,
                field: str | None = None) -> pa.Table:
        """Postgres ``ts_stat`` analog (reference delegates corpus term
        statistics to PG — SURVEY §2.5 A9): ``(word, ndoc, nentry)`` per
        dictionary term — document frequency and total occurrences —
        ordered (nentry DESC, ndoc DESC, word ASC), optionally top-``k``.
        One pruned scan of the stats the index already maintains (the
        S5 dictionary carries (term, df, cf); no corpus pass).  ``field``
        scopes to a field's own posting keys, mirroring ``suggest``."""
        import pyarrow.compute as pc

        t = pq.read_table(self._dict_paths, columns=["term", "df", "cf"]) \
            if self._dict_paths else pa.table(
                {"term": pa.array([], type=pa.string()),
                 "df": pa.array([], type=pa.int64()),
                 "cf": pa.array([], type=pa.int64())})
        if field is None:
            keep = pc.invert(pc.match_substring(t["term"], "\x1f"))
            t = t.filter(keep)
            words = t["term"]
        else:
            pref = f"{field}\x1f"
            t = t.filter(pc.starts_with(t["term"], pref))
            words = pc.utf8_slice_codeunits(t["term"], len(pref))
        out = pa.table({"word": words,
                        "ndoc": t["df"].cast(pa.int64()),
                        "nentry": t["cf"].cast(pa.int64())})
        idx = pc.sort_indices(out, sort_keys=[
            ("nentry", "descending"), ("ndoc", "descending"),
            ("word", "ascending")])
        out = out.take(idx)
        return out.slice(0, k) if k is not None else out

    def idf_map(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in set(terms) if t not in self._df_cache]
        if missing:
            t = pq.read_table(self._dict_paths, columns=["term", "df"], filters=[("term", "in", missing)]) \
                if self._dict_paths else pa.table({"term": [], "df": []})
            found = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
            for m in missing:
                self._df_cache[m] = int(found.get(m, 0))
        return {
            t: (bm25_idf(self.n_docs, self._df_cache[t]) if self._df_cache[t] > 0 else 0.0)
            for t in set(terms)
        }

    def build_plan(self, q: SearchQuery, k: int) -> SearchPlan:
        queries = list(q.queries)
        term_weights: dict[str, float] = {}
        if q.fuzzy_terms or q.contains_patterns:
            from ..functions.querylang import AndGroup, ParsedQuery, Term
            from ..stages.trigram import contains_expand, fuzzy_expand

            for ft, fld in q.fuzzy_terms:
                # scope-aware expansion: unscoped queries expand to plain
                # vocabulary terms, field scopes to that field's own posting
                # keys (a field's vocabulary need not be a subset of the
                # body's) — similarity is measured against the word part,
                # match/rank against the returned posting key
                expanded = fuzzy_expand(self.index_dir, ft, field=fld)
                for key_, sim in expanded:
                    term_weights[key_] = max(term_weights.get(key_, 0.0), sim)
                queries.append(ParsedQuery(tuple(AndGroup((Term(k),)) for k, _ in expanded)))
            for cp, fld in q.contains_patterns:
                # unbounded: a truncated expansion would silently drop
                # matching docs; term count is vocabulary-bounded and
                # MaxScore prunes the wide OR at scoring time
                expanded = contains_expand(self.index_dir, cp,
                                           max_expansions=None, field=fld)
                queries.append(ParsedQuery(tuple(AndGroup((Term(k),)) for k in expanded)))
        # pure-FUZZY queries rank by word_similarity of the best matched
        # expansion term (reference _order_sql, full_text_search.py:277-295);
        # mixed fuzzy+text queries keep BM25 over all clauses
        score_mode = (
            "fuzzy_sim"
            if q.fuzzy_terms and not q.queries and not q.contains_patterns
            and q.order.kind == "score"
            else "bm25"
        )
        terms = [t for pq_ in queries for t in pq_.positive_terms()]
        # prune doc-store columns at the read (task mode): only what scoring,
        # filters, ordering and the output projection actually touch
        if any(f.op == "udf" for f in q.filters):
            need_cols = None  # a udf predicate may touch anything
        else:
            need: dict[str, None] = {}
            for c in ("dl", *self.spec.id_cols):
                need.setdefault(c)
            for f in self.spec.field_cols:  # per-field dl for field-local BM25
                need.setdefault(f"dl__{f}")
            if q.crosswalk is not Crosswalk.MINI:
                for c in self.spec.meta_cols:
                    need.setdefault(c)
            for f in q.filters:
                if f.col:
                    need.setdefault(f.col)
            if q.order.kind == "column" and q.order.col:
                need.setdefault(q.order.col)
            need_cols = tuple(need)
        from ..stages.segment_search import ALL_MATCHES

        if k < 1 and k != ALL_MATCHES:
            # per-segment totals ride on result rows (SEG_TOTAL_COL), so a
            # k=0 plan would silently lose counts; clamp like the reference
            # clamps page_size to >= 1 (full_text_search.py:82)
            k = 1
        return SearchPlan(
            queries=tuple(queries),
            need_cols=need_cols,
            filters=tuple(q.filters),
            order=q.order,
            k=k,
            idf=self.idf_map(terms),
            avgdl=self.avgdl,
            avgdl_fields=self.avgdl_fields,
            id_cols=self.spec.id_cols,
            score_mode=score_mode,
            term_weights=term_weights,
        )

    def prune_segments(self, filters: list[FilterSpec]) -> list[int]:
        """Zone-map segment pruning: drop segments whose primary-identity
        [min,max] range cannot satisfy an identity filter (point lookups — the
        F1 ``etext(nr)`` analog — touch one segment on id-clustered corpora;
        unclustered corpora degrade gracefully to the full list)."""
        id0 = self.spec.id_cols[0]
        keep = []
        segs = self.manifest["segments"]
        for s in segs:
            lo, hi = s.get("id0_min"), s.get("id0_max")
            if lo is None or hi is None:
                keep.append(s["seg_id"])
                continue
            ok = True
            for f in filters:
                if f.col != id0:
                    continue
                if f.op == "==" and not (lo <= f.value <= hi):
                    ok = False
                elif f.op == "in" and not any(lo <= v <= hi for v in f.value):
                    ok = False
                elif f.op == ">=" and hi < f.value:
                    ok = False
                elif f.op == ">" and hi <= f.value:
                    ok = False
                elif f.op == "<=" and lo > f.value:
                    ok = False
                elif f.op == "<" and lo >= f.value:
                    ok = False
                elif f.op == "between" and (hi < f.value[0] or lo > f.value[1]):
                    ok = False
                elif f.op == "startswith" and isinstance(lo, str):
                    p = str(f.value)
                    if hi < p or lo[: len(p)] > p:
                        ok = False
                if not ok:
                    break
            if ok:
                keep.append(s["seg_id"])
        return keep

    def _run(self, q: SearchQuery, count_only: bool = False, k_override: int | None = None):
        k = k_override if k_override is not None else q.page * q.page_size
        if count_only:
            k = 1
        plan = self.build_plan(q, k)
        seg_ids = self.prune_segments(q.filters) if q.filters else self.seg_ids
        if self.mode == "local" or len(seg_ids) <= 4:
            tables = [search_segment(self.seg_dirs[s], plan) for s in seg_ids]
            seg_totals = {s: (int(t[SEG_TOTAL_COL][0].as_py()) if t.num_rows else 0) for s, t in zip(seg_ids, tables)}
            nonempty = [t for t in tables if t.num_rows]
            merged = pa.concat_tables(nonempty) if nonempty else None
            total = sum(seg_totals.values())
            if merged is None or merged.num_rows == 0:
                return total, self._empty_result_table()
            merged = merged.drop_columns([SEG_TOTAL_COL])
            idx = _merge_comparator_indices(merged, q.order, self.spec.id_cols)[:k]
            return total, merged.take(pa.array(idx))
        segs = rd.from_items([{"seg_id": s} for s in seg_ids])
        res = segs.map_batches(
            make_search_fn(plan, self.index_dir, self.seg_dirs),
            batch_format="pyarrow", batch_size=1,
        )
        parts = [ray.get(ref) for ref in table_refs(res)]
        return merge_segment_partials(parts, q.order, self.spec.id_cols, k,
                                      self._empty_result_table)

    def _empty_result_table(self) -> pa.Table:
        d0 = pq.read_table(os.path.join(self.seg_dirs[self.seg_ids[0]], "docs.parquet")).slice(0, 0)
        if "ord" in d0.column_names:
            d0 = d0.drop_columns(["ord"])
        return d0.append_column(SCORE_COL, pa.array([], type=pa.float64()))


def headline(
    eng: "FullTextSearchEngine", text_query: str, *, doc_source,
    k: int = 10, max_words: int = 12,
    start_sel: str = "<b>", stop_sel: str = "</b>",
) -> pa.Table:
    """``ts_headline`` analog: run ``text_query`` (websearch syntax), fetch
    the top-``k`` documents' text from ``doc_source`` (the index stores
    postings + metadata, not raw text — the dedup-family contract), and
    return ``(id, score, snippet, n_hits)`` in rank order.  The snippet is
    the best ``max_words`` token window by query-term hit count with
    matches wrapped ``start_sel``…``stop_sel`` (stages/headline semantics;
    every POSITIVE term of the parsed query is highlighted).  Single-id
    specs only, like more_like_this."""
    from ..functions.analyzer import DEFAULT_ANALYZER
    from ..functions.querylang import parse_query
    from ..stages.headline import headline_batch

    if len(eng.spec.id_cols) != 1:
        raise ValueError(
            "headline supports single-id specs (the doc_source hydrate "
            f"filters one id column — spec has ids {eng.spec.id_cols})")
    id_col = eng.spec.id_cols[0]
    q = eng.query().search(text_query)
    top = eng.top_docs(q, k)
    ids = top[id_col].to_pylist()
    if not ids:
        return pa.table({id_col: top[id_col], "score": top["score"],
                         "snippet": pa.array([], type=pa.string()),
                         "n_hits": pa.array([], type=pa.int64())})
    src = pq.read_table(doc_source, columns=[id_col, eng.spec.text_col],
                        filters=[(id_col, "in", ids)])
    if src.num_rows != len(ids):
        raise KeyError(
            f"headline: doc_source {doc_source!r} is missing "
            f"{len(ids) - src.num_rows} of the top-{len(ids)} ids — is it "
            "the indexed corpus?")
    rank = {v: i for i, v in enumerate(ids)}
    order = np.argsort(np.asarray([rank[v] for v in src[id_col].to_pylist()]))
    texts = src[eng.spec.text_col].combine_chunks().take(pa.array(order))
    analyzer = eng.analyzer or DEFAULT_ANALYZER
    terms = parse_query(text_query, analyzer).positive_terms()
    snip = headline_batch(texts, terms, max_words=max_words,
                          start_sel=start_sel, stop_sel=stop_sel,
                          analyzer=analyzer)
    return pa.table({id_col: top[id_col], "score": top["score"],
                     "snippet": snip["snippet"], "n_hits": snip["n_hits"]})


def more_like_this(
    eng: "FullTextSearchEngine", id_val, *, doc_source,
    k_terms: int = 8, page: int = 1, size: int = 20, quant: int = 1024,
) -> tuple[list[str], "SearchResult"]:
    """Classic more-like-this (the Lucene MLT shape): rank documents
    similar to ``id_val`` by OR-searching its most characteristic terms.

    Term selection is the TF-IDF discipline of ``stages/keywords``:
    tf from ONE tokenize of the source document (fetched from
    ``doc_source`` — the index stores postings + metadata, not raw
    text, so the source parquet supplies it, the dedup-family
    contract), df from the INDEX DICTIONARY (no corpus pass —
    reusing the stats the index already maintains, S5/A9), each
    distinct term's idf quantized once to
    ``floor(log2(N/df)·quant + 0.5)``, top ``k_terms`` by
    (tf·idf_q DESC, term ASC).  The ranked search itself is the
    engine's ordinary BM25 OR query with the source document
    excluded, so every scoring guarantee the FTS oracles pin applies
    here unchanged.  Single-id specs only (the exclusion filter is
    per-id-column).  Returns ``(terms, SearchResult)``."""
    if len(eng.spec.id_cols) != 1:
        raise ValueError(
            "more_like_this supports single-id specs (the exclusion "
            f"filter is one ne() — spec has ids {eng.spec.id_cols})")
    id_col = eng.spec.id_cols[0]
    src = pq.read_table(
        doc_source, columns=[id_col, eng.spec.text_col],
        filters=[(id_col, "==", id_val)])
    if src.num_rows == 0:
        raise KeyError(f"more_like_this: {id_col}={id_val!r} not in "
                       f"{doc_source}")
    from ..functions.analyzer import DEFAULT_ANALYZER

    analyzer = eng.analyzer or DEFAULT_ANALYZER
    terms_flat, _, _ = analyzer.tokenize_column(
        src[eng.spec.text_col].combine_chunks())
    if len(terms_flat) == 0:
        raise ValueError(
            f"more_like_this: {id_col}={id_val!r} has no analyzer tokens "
            f"— nothing to derive a query from")
    ut, tf = np.unique(terms_flat, return_counts=True)
    dic = pq.read_table(eng.dict_dir, columns=["term", "df"],
                        filters=[("term", "in", ut.tolist())])
    df_map = dict(zip(dic["term"].to_pylist(),
                      dic["df"].to_numpy(zero_copy_only=False)))
    known = np.array([t in df_map for t in ut])
    ut, tf = ut[known], tf[known]
    if len(ut) == 0:
        raise ValueError(
            f"more_like_this: none of {id_col}={id_val!r}'s terms are in "
            f"the index dictionary — is doc_source the indexed corpus?")
    dfv = np.asarray([df_map[t] for t in ut], dtype=np.int64)
    idf_q = np.floor(np.log2(np.float64(eng.n_docs)
                             / dfv.astype(np.float64))
                     * quant + 0.5).astype(np.int64)
    score = tf.astype(np.int64) * idf_q
    order = np.lexsort((ut, -score))
    terms = [str(t) for t in ut[order][:k_terms]]
    q = eng.query().search(" or ".join(terms)).ne(id_col, id_val)[page, size]
    return terms, eng.execute(q)

