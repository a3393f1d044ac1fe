"""HTTP JSON facade — S6 / SURVEY §2.10, the thin API layer over the engine.

The reference serves search through CherryPy endpoints returning JSON feeds
(/root/reference/opds/opds.py: ``search`` :964-1069, index feed :286-352,
``json_out`` everywhere, server boot :1185-1194).  This module is the same
surface on the Python stdlib (``http.server.ThreadingHTTPServer`` — no
third-party web framework in the sandbox), kept deliberately thin: parse
params → build a ``SearchQuery`` → ``execute`` → JSON feed.  The engine (or
the ``SearchService`` actor pool) stays the only stateful component.

Contract parity with the reference:
  * pagination params ``page``/``limit``, default 28, clamped to 1–100
    (opds.py:55-60; same clamp as the engine's ``q[page, limit]``)
  * ``field`` selects search type + field: ``fts_<f>``, ``fuzzy_<f>``,
    ``contains_<f>`` prefixes; bare/``keyword`` = whole-doc FTS; unknown
    fields fall back to whole-doc (opds.py:25-38 ``_parse_field``)
  * ``sort``/``sort_order`` — empty = relevance when a query is present
    (opds.py:88-103 ``_apply_sort``)
  * arbitrary metadata equality filters as ``f.<col>=<value>`` params (the
    lang/copyrighted/audiobook filter family, opds.py:69-86)
  * feeds carry ``self``/``next``/``previous`` pagination links
    (opds.py:105-139)
  * errors are JSON with an HTTP status, 500 on engine failure
    (opds.py:1011-1013)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlencode, urlparse

import pyarrow as pa
from ..functions.arrowutil import table_refs

DEFAULT_LIMIT = 28
MAX_LIMIT = 100
SAMPLE_LIMIT = 15  # per-section random-sample size (opds.py:20 SAMPLE_LIMIT)


class BadRequest(ValueError):
    """Request-shaped error → HTTP 400 (engine failures stay 500)."""


def parse_pagination(page, limit, default_limit: int = DEFAULT_LIMIT) -> tuple[int, int]:
    """Clamp exactly like the reference (opds.py:55-60).  Each param falls
    back independently — an invalid limit must not discard a valid page."""
    try:
        p = max(1, int(page))
    except (ValueError, TypeError):
        p = 1
    try:
        n = max(1, min(MAX_LIMIT, int(limit)))
    except (ValueError, TypeError):
        n = default_limit
    return p, n


def parse_field(field: str, default_mode: str = "fts") -> tuple[str | None, str]:
    """``field`` param → (field_name | None, search_mode).

    Mirrors opds.py:25-38: ``fts_``/``fuzzy_``/``contains_`` prefix picks the
    mode, the rest names the field; ``keyword``/empty means whole-doc.

    DELIBERATE DIVERGENCE from the reference: a bare/unprefixed field
    defaults to **FTS** here, where opds.py:31-32 defaults to FUZZY.  The
    reference fronts an OPDS catalog UI whose bare search box wants
    typo-tolerant matching; this engine's flagship surface is ranked BM25
    retrieval, so ``/search?query=x`` runs the websearch query language
    (AND/OR/NOT/phrase) against the inverted index.  Fuzzy is one explicit
    prefix away (``field=fuzzy_keyword``), with identical clamps and field
    scoping — and a reference-parity deployment is one knob away:
    ``SearchAPI(..., default_mode="fuzzy")`` (CLI ``serve
    --default-mode=fuzzy``) restores the opds.py default exactly.
    Pinned by tests/test_http_api.py::test_parse_field and
    ::test_default_mode_divergence_from_reference."""
    mode = default_mode
    name = field or "keyword"
    for prefix in ("fts_", "fuzzy_", "contains_"):
        if name.startswith(prefix):
            mode, name = prefix[:-1], name[len(prefix):]
            break
    if name in ("keyword", "", "book"):
        return None, mode
    return name, mode


def _json_val(v):
    """JSON-type coercion shared by every feed (timestamps etc. → str)."""
    return v if isinstance(v, (str, int, float, bool, type(None), list, dict)) else str(v)


def _json_rows(rows) -> list[dict]:
    """Rows (a pa.Table or an iterable of row dicts) → JSON-safe dicts."""
    if isinstance(rows, pa.Table):
        rows = rows.to_pylist()
    return [{k: _json_val(v) for k, v in r.items()} for r in rows]


class SearchAPI:
    """Framework-free request handling so it can be tested without sockets.

    ``backend`` is anything with ``query()`` and ``execute(q) -> SearchResult``
    — a ``FullTextSearchEngine`` or a ``SearchService`` wrapper."""

    def __init__(self, backend, title: str = "project-gutenberg-fts-ray", *,
                 default_mode: str = "fts"):
        if default_mode not in ("fts", "fuzzy", "contains"):
            raise ValueError(f"default_mode must be fts|fuzzy|contains, "
                             f"got {default_mode!r}")
        self.backend = backend
        self.title = title
        # bare-field search mode; "fuzzy" = reference parity (opds.py:31-32)
        self.default_mode = default_mode

    # ------------------------------------------------------------ endpoints
    def index(self) -> dict:
        """Service feed — the opds.py:286-352 root-feed analog."""
        return {
            "title": self.title,
            "links": [
                {"rel": "self", "href": "/"},
                {"rel": "search", "href": "/search?query={searchTerms}"},
                {"rel": "count", "href": "/count?query={searchTerms}"},
                {"rel": "facets", "href": "/facets?col={column}"},
                {"rel": "values", "href": "/values?col={column}"},
                {"rel": "suggest", "href": "/suggest?prefix={prefix}"},
                {"rel": "ts_stat", "href": "/ts_stat?limit={limit}"},
                {"rel": "browse", "href": "/browse?col={column}"},
                {"rel": "hierarchy", "href": "/hierarchy?prefix={prefix}"},
            ],
        }

    # ---------------------------------------------------- browse navigation
    def _engine(self):
        return getattr(self.backend, "engine", self.backend)

    def _typed_value(self, col: str, raw: str):
        """URL params arrive as strings; coerce to the column's ACTUAL Arrow
        type — numeric only when the stored column is numeric.  Blind
        int-coercion turns a string value like '123' into an int the string
        column can never equal (no Arrow kernel / silent zero matches), so
        the sections feed would emit links to itself it cannot serve.  The
        type comes from one parquet-footer read (stored_column_type), never
        a corpus pass.  A non-numeric value on a numeric column is a 400 at
        parse time, not an ArrowInvalid 500 at execute time."""
        t = self._engine().stored_column_type(col)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return raw
        typed = _coerce(raw)
        if (pa.types.is_integer(t) or pa.types.is_floating(t)) \
                and isinstance(typed, str):
            raise BadRequest(f"value {raw!r} is not valid for numeric column {col!r}")
        return typed

    def suggest(self, params: dict) -> dict:
        """Query assistance: ``?prefix=`` → dictionary autocomplete (terms
        under the prefix, hottest first), ``?word=`` → spelling suggestion
        (trigram word_similarity, df tie-break).  Exactly one of the two;
        ``field=`` scopes either to a per-field keyspace; ``limit=`` caps
        suggestions (clamped to 100, like /search page sizes)."""
        prefix = (params.get("prefix") or "").strip()
        word = (params.get("word") or "").strip()
        if bool(prefix) == bool(word):
            raise BadRequest("suggest needs exactly one of ?prefix= or ?word=")
        try:
            limit = max(1, min(100, int(params.get("limit", 10))))
        except (TypeError, ValueError):
            limit = 10
        field = params.get("field") or None
        eng = self._engine()
        if prefix:
            t = eng.suggest(prefix, k=limit, field=field)
            sug = [{"term": term, "df": df}
                   for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist())]
            return {"prefix": prefix, "suggestions": sug}
        t = eng.did_you_mean(word, k=limit, field=field)
        sug = [{"term": term, "similarity": sim / 10000, "df": df}
               for term, sim, df in zip(t["term"].to_pylist(),
                                        t["sim_i4"].to_pylist(),
                                        t["df"].to_pylist())]
        return {"word": word, "suggestions": sug}

    def ts_stat(self, params: dict) -> dict:
        """Corpus term statistics (Postgres ``ts_stat`` analog): the
        dictionary's (word, ndoc, nentry) report, hottest first;
        ``limit=`` caps rows (clamped to 1000), ``field=`` scopes to a
        per-field keyspace — one pruned dictionary scan, no corpus pass."""
        try:
            limit = max(1, min(1000, int(params.get("limit", 20))))
        except (TypeError, ValueError):
            limit = 20
        field = params.get("field") or None
        t = self._engine().ts_stat(limit, field=field)
        return {"stats": [
            {"word": w, "ndoc": nd, "nentry": ne}
            for w, nd, ne in zip(t["word"].to_pylist(),
                                 t["ndoc"].to_pylist(),
                                 t["nentry"].to_pylist())]}

    def values(self, params: dict) -> dict:
        """Controlled-vocabulary discovery: the valid values of a stored
        column + doc counts (the reference ships these as API constants,
        search/constants.py:18-310; here they're derived by one cached
        groupby — engine.value_counts)."""
        col = params.get("col", "")
        if not col:
            raise BadRequest("values needs ?col=<stored column>")
        try:
            vc = self._engine().value_counts(col)
        except ValueError as e:
            raise BadRequest(str(e)) from None
        # response-size guard: an id column's vocabulary is corpus-scaled —
        # one GET must not serialize millions of values into a JSON body.
        # Top-`limit` by count (desc), a `truncated` flag says there's more.
        try:
            limit = max(1, min(10_000, int(params.get("limit", 1000))))
        except (TypeError, ValueError):
            limit = 1000
        pairs = list(zip(vc[col].to_pylist(), vc["n"].to_pylist()))
        truncated = len(pairs) > limit
        if truncated:
            pairs = sorted(pairs, key=lambda t: (-t[1], str(t[0])))[:limit]
        return {"col": col, "n_distinct": len(vc), "truncated": truncated,
                "values": [{"value": _json_val(v), "n": int(n)}
                           for v, n in pairs]}

    def browse(self, params: dict) -> dict:
        """Curated-section browse — the bookshelves surface (opds.py:356-594):

        * ``/browse?col=c`` — sections feed: ``navigation`` lists EVERY value
          of the column with its doc count; ``groups`` carries a seeded
          random sample of ``SAMPLE_LIMIT`` docs for the top ``sections``
          values (reference per-shelf samples, opds.py:543-561).
        * ``/browse?col=c&value=v`` — one section: seeded random sample page
          of that value's docs (O6 per-group seeded sample + pagination).
        """
        col = params.get("col", "")
        if not col:
            raise BadRequest("browse needs ?col=<stored column>")
        eng = self._engine()
        try:
            seed = int(params.get("seed", 42))
        except (TypeError, ValueError):
            seed = 42
        value = params.get("value")
        if value is not None:
            page, limit = parse_pagination(params.get("page", 1),
                                           params.get("limit", SAMPLE_LIMIT),
                                           default_limit=SAMPLE_LIMIT)
            try:
                typed = self._typed_value(col, value)
            except ValueError as e:
                raise BadRequest(str(e)) from None
            res = self._section_sample(col, typed, seed, page, limit)
            return {
                "title": f"{self.title}: {col}={value}",
                "col": col, "value": _json_val(typed),
                "total": int(res.total), "page": page, "limit": limit,
                "publications": _json_rows(res.table),
                "links": self._pagination_links("/browse", params, page, limit,
                                                int(res.total)),
            }
        try:
            vc = eng.value_counts(col)
        except ValueError as e:
            raise BadRequest(str(e)) from None
        try:
            n_sections = max(0, min(50, int(params.get("sections", 5))))
        except (TypeError, ValueError):
            n_sections = 5
        # NULL is browsable via filters but not linkable — drop it BEFORE
        # slicing the top-N sections, or it silently eats a section slot
        vals = [(v, n) for v, n in zip(vc[col].to_pylist(), vc["n"].to_pylist())
                if v is not None]
        # navigation response cap (id-like columns have corpus-scaled
        # vocabularies; biggest groups first when truncating)
        try:
            nav_limit = max(1, min(10_000, int(params.get("nav_limit", 500))))
        except (TypeError, ValueError):
            nav_limit = 500
        nav_vals = (sorted(vals, key=lambda t: (-t[1], str(t[0])))[:nav_limit]
                    if len(vals) > nav_limit else vals)
        navigation = [{
            "href": f"/browse?{urlencode({'col': col, 'value': v})}",
            "title": f"{v} ({int(n)} docs)",
            "rel": "subsection",
        } for v, n in nav_vals]
        # reference sections: per-shelf random samples, biggest shelves first
        groups = []
        for v, n in sorted(vals, key=lambda t: (-t[1], str(t[0])))[:n_sections]:
            res = self._section_sample(col, v, seed, 1, SAMPLE_LIMIT)
            groups.append({
                "metadata": {"title": str(v), "numberOfItems": int(res.total)},
                "links": [{"rel": "self",
                           "href": f"/browse?{urlencode({'col': col, 'value': v})}"}],
                "publications": _json_rows(res.table),
            })
        return {"title": f"{self.title}: browse {col}",
                "metadata": {"numberOfItems": len(vals),
                             "truncated": len(vals) > nav_limit},
                "links": [{"rel": "self", "href": f"/browse?col={col}"},
                          {"rel": "start", "href": "/"}],
                "navigation": navigation, "groups": groups}

    def _section_sample(self, col: str, value, seed: int, page: int, limit: int):
        """One section's seeded per-group sample: eq filter + seeded RANDOM
        order + pagination — the O6 kernel the sample_per_source oracle
        pins."""
        from .search import RANDOM

        q = self.backend.query().eq(col, value).order_by(RANDOM, seed=seed)
        q[page, limit]
        return self.backend.execute(q)

    def hierarchy(self, params: dict) -> dict:
        """Prefix-hierarchy navigation — the LoCC tree surface
        (opds.py:598-811): children of ``prefix`` one char deeper with doc
        counts and has-children flags; a prefix with NO children is a leaf
        and returns its docs page (identity-ordered), like the reference's
        leaf → books fallthrough."""
        eng = self._engine()
        spec = getattr(self.backend, "spec", None) or eng.spec
        col = params.get("col") or spec.id_cols[0]
        prefix = params.get("prefix", "")
        try:
            children = eng.prefix_children(col, prefix)
        except ValueError as e:
            raise BadRequest(str(e)) from None
        if params.get("exact"):
            # docs whose value IS this node (variable-length vocabularies:
            # node '3' can have children '30','31' AND its own '3' docs)
            return self._hierarchy_exact_docs(col, prefix, params)
        if children.num_rows:
            navigation = [{
                "href": f"/hierarchy?{urlencode({'col': col, 'prefix': c})}",
                "title": f"{c} ({int(n)} docs)",
                "rel": "subsection",
                "has_children": bool(hc),
            } for c, n, hc in zip(children["child"].to_pylist(),
                                  children["n"].to_pylist(),
                                  children["has_children"].to_pylist())]
            n_exact = eng.prefix_exact_count(col, prefix) if prefix else 0
            if n_exact:
                # without this entry, docs valued exactly `prefix` would be
                # unreachable from the tree and child counts would not sum
                # to the parent's advertised count
                navigation.insert(0, {
                    "href": f"/hierarchy?{urlencode({'col': col, 'prefix': prefix, 'exact': 1})}",
                    "title": f"{prefix} ({n_exact} docs at this node)",
                    "rel": "subsection",
                    "has_children": False,
                })
            return {
                "title": prefix or f"{col} hierarchy",
                "metadata": {"numberOfItems": len(navigation)},
                "links": [
                    {"rel": "self",
                     "href": f"/hierarchy?{urlencode({'col': col, 'prefix': prefix})}"},
                    {"rel": "start", "href": "/"},
                    {"rel": "up",
                     "href": (f"/hierarchy?{urlencode({'col': col, 'prefix': prefix[:-1]})}"
                              if prefix else "/")},
                ],
                "navigation": navigation,
            }
        # leaf: identity-ordered docs under this exact prefix.  String
        # columns use the zone-mapped startswith filter; non-string columns
        # (int ids etc. — prefix_children casts to string, so navigation can
        # land here) resolve the matching RAW values from the cached
        # vocabulary and filter with a type-safe id-list instead (startswith
        # on an int64 column has no Arrow kernel → would 500).
        page, limit = parse_pagination(params.get("page", 1),
                                       params.get("limit", DEFAULT_LIMIT))
        q = self.backend.query()
        vc = eng.value_counts(col)
        if pa.types.is_string(vc[col].type) or pa.types.is_large_string(vc[col].type):
            q.prefix(col, prefix)
        else:
            import pyarrow.compute as pc

            v = vc[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            m = pc.fill_null(pc.starts_with(v.cast(pa.string()), prefix), False)
            matched = v.filter(m).to_pylist()
            if not matched:
                return {"title": prefix, "col": col, "prefix": prefix,
                        "total": 0, "page": page, "limit": limit,
                        "results": [], "links": self._pagination_links(
                            "/hierarchy", params, page, limit, 0)}
            q.docs_in(col, matched)
        q.order_by(spec.id_cols[0], descending=False)[page, limit]
        res = self.backend.execute(q)
        return {
            "title": prefix, "col": col, "prefix": prefix,
            "total": int(res.total), "page": page, "limit": limit,
            "results": _json_rows(res.table),
            "links": self._pagination_links("/hierarchy", params, page, limit,
                                            int(res.total)),
        }

    def _hierarchy_exact_docs(self, col: str, prefix: str, params: dict) -> dict:
        """Identity-ordered docs whose value's string form EQUALS the node
        (?exact=1) — type-safe eq filter via _typed_value."""
        spec = getattr(self.backend, "spec", None) or self._engine().spec
        page, limit = parse_pagination(params.get("page", 1),
                                       params.get("limit", DEFAULT_LIMIT))
        q = self.backend.query().eq(col, self._typed_value(col, prefix))
        q.order_by(spec.id_cols[0], descending=False)[page, limit]
        res = self.backend.execute(q)
        return {
            "title": prefix, "col": col, "prefix": prefix, "exact": True,
            "total": int(res.total), "page": page, "limit": limit,
            "results": _json_rows(res.table),
            "links": self._pagination_links("/hierarchy", params, page, limit,
                                            int(res.total)),
        }

    def search(self, params: dict, count_only: bool = False) -> dict:
        query = (params.get("query") or "").strip()
        page, limit = parse_pagination(params.get("page", 1),
                                       params.get("limit", DEFAULT_LIMIT))
        field_name, mode = parse_field(params.get("field", ""),
                                       self.default_mode)
        sort = params.get("sort", "")
        sort_order = params.get("sort_order", "")

        # unknown field → whole-doc, like opds.py:36-37 (scope_to_field would
        # otherwise rewrite terms into a posting keyspace that doesn't exist
        # and silently match nothing)
        spec = getattr(self.backend, "spec", None) or self.backend.engine.spec
        known_field = field_name is not None and field_name in spec.field_cols
        engine = getattr(self.backend, "engine", self.backend)

        q = self.backend.query()
        if query:
            if mode == "fuzzy":
                # per-word fuzzy, field-scoped when the field is indexed
                # (reference honors SearchField for FUZZY); the engine
                # expands each word via the trigram dictionary at plan time
                # and ranks by word_similarity — re-parsing expansions
                # through the query language would mangle them ('or' is an
                # operator, stemmed terms re-stem, scoped keys re-tokenize)
                for term in query.split():
                    q.search_fuzzy(term, field=field_name if known_field else None)
            elif mode == "contains":
                if field_name is not None and not known_field \
                        and field_name in spec.meta_cols:
                    # substring on a stored metadata column: vectorized
                    # case-insensitive substr filter (ILIKE parity)
                    q.contains(field_name, query)
                elif self._single_token_indexable(engine, query):
                    # indexed single-token path (field-scoped when asked:
                    # expansions rewrite into the field's posting keyspace)
                    q.search_contains(query,
                                      field=field_name if known_field else None)
                else:
                    # multi-word / short / punctuated substring: the raw
                    # text is not in the doc store, so route through the
                    # index-assisted contains_multi pipeline (verifies
                    # against the corpus parquet) and page its output
                    return self._contains_multi_feed(
                        engine, spec, query, params, page, limit,
                        field=field_name if known_field else None,
                        count_only=count_only)
            else:
                q.search(query, field=field_name if known_field else None)
        for key, val in params.items():
            if key.startswith("f."):
                q.eq(key[2:], _coerce(val))
        if sort:
            q.order_by(sort, descending=(sort_order != "asc"))
        q[page, limit]

        result = self.backend.execute(q)
        feed = {
            "title": self.title,
            "query": query,
            "total": int(result.total),
            "page": page,
            "limit": limit,
            "results": _json_rows(result.table),
            "links": self._pagination_links("/search", params, page, limit,
                                            int(result.total)),
        }
        facet_col = params.get("facet", "")
        if facet_col:
            feed["facets"] = {facet_col: self._facet(q, facet_col, params)}
        return feed

    @staticmethod
    def _single_token_indexable(engine, query: str) -> bool:
        """True when the pattern can run on the single-token indexed contains
        path: the lowered pattern IS one analyzer token (no spaces or
        punctuation the tokenizer would split on — 'foo-bar' must route to
        contains_multi, which phrase-matches the split tokens and verifies
        the literal) and is long enough to carry a trigram."""
        if len(query) < 3:
            return False
        toks = engine.analyzer.tokenize(query)
        return len(toks) == 1 and toks[0] == query.lower()

    @staticmethod
    def contains_multi_page(engine, spec, query: str, page: int, limit: int,
                            filters=None, field: str | None = None,
                            count_only: bool = False) -> tuple[int, list[dict]]:
        """ONE contains-multi pipeline execution serving both the count and
        the identity-ordered page (candidate generation + corpus verify is
        the expensive part and must not run twice per request).  Shared by
        the HTTP feed and the CLI so their filter/paging semantics can't
        drift.  ``count_only`` skips the page sort entirely — a count of a
        million-match pattern must not pay a distributed sort it discards.

        Paging is TOP-K, not a distributed sort: each block keeps its local
        bottom-k IDENTITIES (one vectorized Arrow sort per block, id columns
        only — never the text), the driver merges those slim partials, picks
        the page's ≤ ``limit`` identities, and one filter pass re-fetches
        just those full rows.  "First page of a million-match pattern" moves
        k×blocks id tuples instead of every matched row through a range
        exchange — and never text-bearing rows to the driver.  Past a
        deep-paging bound even the id-only merge stops paying and it falls
        back to sort+limit."""
        import pyarrow.compute as pc

        import ray

        ds = engine.contains_multi_dataset(query, filters=filters or None,
                                           field=field).materialize()
        total = int(ds.count())
        if count_only:
            return total, []
        k = page * limit
        keys = [(c, "ascending") for c in spec.id_cols]
        if k > 100_000:  # deep paging: the k×blocks id merge stops paying
            head = ds.sort(list(spec.id_cols)).limit(k).take_all()
            return total, head[(page - 1) * limit: page * limit]
        id_cols = list(spec.id_cols)

        def local_bottomk_ids(b: pa.Table) -> pa.Table:
            if b.num_rows > k:
                idx = pc.sort_indices(b, sort_keys=keys)
                b = b.take(idx.slice(0, k))
            return b.select(id_cols)

        parts = [t for t in ray.get(table_refs(
            ds.map_batches(local_bottomk_ids, batch_format="pyarrow")))
            if t.num_rows]
        if not parts:
            return total, []
        merged = pa.concat_tables(parts)
        idx = pc.sort_indices(merged, sort_keys=keys)
        page_ids = merged.take(idx.slice((page - 1) * limit, limit))
        if page_ids.num_rows == 0:
            return total, []
        id0 = id_cols[0]
        want0 = pa.array(sorted(set(page_ids[id0].to_pylist())),
                         type=page_ids[id0].type)

        def pick(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[id0], value_set=want0))

        rows = pa.concat_tables([t for t in ray.get(table_refs(
            ds.map_batches(pick, batch_format="pyarrow")))
            if t.num_rows])
        # exact-identity match (id0 prefilter may over-fetch on composite
        # identities), then identity order == page order
        keyset = set(zip(*[page_ids[c].to_pylist() for c in id_cols]))
        mask = pa.array([kk in keyset for kk in
                         zip(*[rows[c].to_pylist() for c in id_cols])],
                        type=pa.bool_())
        rows = rows.filter(mask)
        rows = rows.take(pc.sort_indices(rows, sort_keys=keys))
        return total, rows.to_pylist()

    def _contains_multi_feed(self, engine, spec, query: str, params: dict,
                             page: int, limit: int,
                             field: str | None = None,
                             count_only: bool = False) -> dict:
        """ILIKE-'%q%' feed for patterns the posting index can't represent:
        verified matches stream from ``contains_multi_dataset``; rows are
        identity-ordered corpus rows (id cols + text), like the reference's
        CONTAINS listing."""
        from ..stages.segment_search import FilterSpec

        if (params.get("sort") or "").strip():
            # same loud failure as the CLI: silently returning identity
            # order for an explicit sort request is worse than a 400
            raise BadRequest("contains-multi results are identity-ordered; "
                             "sort is not supported on this path")

        filters = [FilterSpec(k[2:], "==", _coerce(v))
                   for k, v in params.items() if k.startswith("f.")]
        total, rows = self.contains_multi_page(engine, spec, query, page,
                                               limit, filters=filters,
                                               field=field,
                                               count_only=count_only)
        return {
            "title": self.title,
            "query": query,
            "total": int(total),
            "page": page,
            "limit": limit,
            "results": _json_rows(rows),
            "links": self._pagination_links("/search", params, page, limit,
                                            int(total)),
        }

    def _facet(self, q, facet_col: str, params: dict) -> list[dict]:
        """Sampled facet counts over the top matched docs — the reference's
        top-subjects block in search feeds (opds.py:1005-1009,
        full_text_search.py:446-494: explicitly approximate via sample cap)."""
        import pyarrow.compute as pc

        top_docs = getattr(self.backend, "top_docs", None) or self.backend.engine.top_docs
        try:
            sample = max(1, min(1000, int(params.get("facet_sample", 100))))
            k = max(1, min(50, int(params.get("facet_k", 5))))
        except (ValueError, TypeError):
            sample, k = 100, 5
        top = top_docs(q, sample)
        if facet_col not in top.column_names or top.num_rows == 0:
            return []
        agg = top.group_by(facet_col).aggregate([(facet_col, "count")])
        agg = agg.rename_columns([facet_col, "n"])
        idx = pc.sort_indices(agg, sort_keys=[("n", "descending"),
                                              (facet_col, "ascending")])
        out = agg.take(idx).slice(0, k)
        return [{"value": v, "n": int(n)}
                for v, n in zip(out[facet_col].to_pylist(), out["n"].to_pylist())]

    def count(self, params: dict) -> dict:
        # strip facet params: a facet block would trigger a top_docs sampling
        # fan-out whose output count() immediately throws away.  count_only
        # also skips the contains-multi page sort a count discards.
        slim = {k: v for k, v in params.items()
                if k not in ("facet", "facet_sample", "facet_k")}
        feed = self.search({**slim, "limit": "1", "page": "1"}, count_only=True)
        return {"query": feed["query"], "total": feed["total"]}

    def facets(self, params: dict) -> tuple[int, dict]:
        """Standalone facet browse — the bookshelves/subjects navigation
        feeds (opds.py:356-417, :815-869): sampled value counts over a
        metadata column, optionally under ``query``/``f.<col>`` filters."""
        col = params.get("col", "")
        if not col:
            return 400, {"error": "facets needs ?col=<metadata column>"}
        q = self.backend.query()
        query = (params.get("query") or "").strip()
        if query:
            q.search(query)
        for key, val in params.items():
            if key.startswith("f."):
                q.eq(key[2:], _coerce(val))
        return 200, {"col": col, "query": query,
                     "facets": self._facet(q, col, params)}

    # ------------------------------------------------------------ plumbing
    def _pagination_links(self, path: str, params: dict, page: int,
                          limit: int, total: int) -> list[dict]:
        def url(p: int) -> str:
            qp = {**params, "page": p, "limit": limit}
            return f"{path}?{urlencode(qp)}"

        links = [{"rel": "self", "href": url(page)}]
        if page * limit < total:
            links.append({"rel": "next", "href": url(page + 1)})
        if page > 1:
            links.append({"rel": "previous", "href": url(page - 1)})
        return links

    def handle(self, path: str, params: dict) -> tuple[int, dict]:
        try:
            if path in ("/", "/index"):
                return 200, self.index()
            if path == "/search":
                return 200, self.search(params)
            if path == "/count":
                return 200, self.count(params)
            if path == "/facets":
                return self.facets(params)
            if path == "/values":
                return 200, self.values(params)
            if path == "/suggest":
                return 200, self.suggest(params)
            if path == "/ts_stat":
                return 200, self.ts_stat(params)
            if path == "/browse":
                return 200, self.browse(params)
            if path == "/hierarchy":
                return 200, self.hierarchy(params)
            return 404, {"error": f"no such endpoint: {path}"}
        except BadRequest as e:
            return 400, {"error": str(e)}
        except Exception as e:  # opds.py:1011-1013 → HTTPError(500)
            return 500, {"error": f"search failed: {e}"}


def _coerce(v: str):
    """Filter values arrive as strings; try numeric so ``f.turn_idx=3`` works
    against int columns (Arrow equality does not coerce across types)."""
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


class SearchHTTPServer:
    """ThreadingHTTPServer wrapper: ``start()`` → serve on a background
    thread, ``close()`` → shut down.  Port 0 picks a free port."""

    def __init__(self, backend, host: str = "127.0.0.1", port: int = 0,
                 title: str = "project-gutenberg-fts-ray", *,
                 default_mode: str = "fts"):
        api = SearchAPI(backend, title=title, default_mode=default_mode)

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                parsed = urlparse(self.path)
                params = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                status, payload = api.handle(parsed.path, params)
                body = json.dumps(payload, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self.api = api
        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def start(self) -> "SearchHTTPServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        name="pgfts-http", daemon=True)
        self._thread.start()
        return self

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def close(self) -> None:
        if self._thread is not None:
            # shutdown() blocks on an event only serve_forever() sets —
            # calling it on a never-started server would deadlock forever
            self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
