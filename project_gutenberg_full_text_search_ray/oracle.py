"""Brute-force reference oracle — exhaustive, index-free scorer.

Independent implementation of the engine's exact semantics (SURVEY.md §5):
tokenise every doc with the scalar analyzer path, evaluate the boolean tree
per doc with Python sets, score with the shared BM25 formula, apply filters /
orderings / pagination the same way.  Tests assert the Ray engine is
rank-identical (top-k ids + approx-equal scores + exact totals) to this.
Deliberately slow and simple — no shared code with the index/search path
beyond the analyzer and the one BM25 formula module.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .corpus import CorpusSpec
from .functions.analyzer import DEFAULT_ANALYZER, Analyzer
from .functions.bm25 import K1, B
from .functions.querylang import AndGroup, Not, ParsedQuery, Phrase, Term, parse_query


@dataclass
class OracleResult:
    total: int
    rows: list[dict]  # id cols + meta + score, page-sliced


class BruteForceOracle:
    def __init__(self, table: pa.Table, spec: CorpusSpec, analyzer: Analyzer = DEFAULT_ANALYZER):
        self.spec = spec
        self.analyzer = analyzer
        rows = table.to_pylist()
        # stable doc order = identity ascending (engine tie-break order)
        rows.sort(key=lambda r: tuple(r[c] for c in spec.id_cols))
        self.rows = rows
        self.tokens: list[list[str]] = []
        self.positions: list[dict[str, list[int]]] = []
        self.tf: list[dict[str, int]] = []
        for r in rows:
            terms, pos = analyzer.tokenize_with_positions(r[spec.text_col] or "")
            self.tokens.append(terms)
            posmap: dict[str, list[int]] = {}
            tfmap: dict[str, int] = {}
            for t, p in zip(terms, pos):
                posmap.setdefault(t, []).append(p)
                tfmap[t] = tfmap.get(t, 0) + 1
            self.positions.append(posmap)
            self.tf.append(tfmap)
        self.dl = [len(t) for t in self.tokens]
        for r, d in zip(self.rows, self.dl):
            r["dl"] = d  # engine doc stores carry dl; expose it for parity
        self.n_docs = len(rows)
        self.avgdl = (sum(self.dl) / self.n_docs) if self.n_docs else 1.0
        self.df: dict[str, int] = {}
        for tfmap in self.tf:
            for t in tfmap:
                self.df[t] = self.df.get(t, 0) + 1

    # ---- semantics mirrors
    def _atom_matches(self, i: int, atom) -> bool:
        if isinstance(atom, Term):
            return atom.term in self.tf[i]
        if isinstance(atom, Phrase):
            pm = self.positions[i]
            plists = [pm.get(t) for t in atom.terms]
            if any(p is None for p in plists):
                return False
            offs = atom.offsets or tuple(range(len(atom.terms)))
            starts = {p - offs[0] for p in plists[0]}
            for k, pl in enumerate(plists[1:], start=1):
                starts &= {p - offs[k] for p in pl}
                if not starts:
                    return False
            return True
        raise TypeError(atom)

    def _query_matches(self, i: int, q: ParsedQuery) -> bool:
        if q.is_empty:
            return False
        for g in q.groups:
            ok = True
            for a in g.atoms:
                if isinstance(a, Not):
                    if self._atom_matches(i, a.atom):
                        ok = False
                        break
                elif not self._atom_matches(i, a):
                    ok = False
                    break
            if ok:
                return True
        return False

    def _filter_matches(self, r: dict, col: str, op: str, value) -> bool:
        import datetime as _dt

        v = r.get(col)
        if op == "isnull":
            return v is None
        if op == "notnull":
            return v is not None
        if v is None:
            return False
        if isinstance(v, _dt.datetime):
            # engine filters compare timestamp columns against integer
            # microseconds (segment_search casts the value set to the column
            # type) — mirror for scalar AND list-valued ops (in/between)
            as_us = lambda: int(v.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
            if isinstance(value, int):
                v = as_us()
            elif (isinstance(value, (list, tuple, set)) and value
                  and all(isinstance(x, int) for x in value)):
                v = as_us()
        if op == "==":
            return v == value
        if op == "!=":
            return v != value
        if op == ">":
            return v > value
        if op == ">=":
            return v >= value
        if op == "<":
            return v < value
        if op == "<=":
            return v <= value
        if op == "in":
            return v in set(value)
        if op == "not_in":
            return v not in set(value)
        if op == "between":
            return value[0] <= v <= value[1]
        if op == "startswith":
            return str(v).startswith(value)
        if op == "substr":
            # engine kernel is pc.match_substring(ignore_case=True) — ILIKE
            return str(value).lower() in str(v).lower()
        raise ValueError(op)

    def _score(self, i: int, positive_terms: list[str]) -> float:
        s = 0.0
        dl = self.dl[i]
        for t in sorted(set(positive_terms)):
            tf = self.tf[i].get(t, 0)
            df = self.df.get(t, 0)
            if tf == 0 or df == 0:
                continue
            idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            s += idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
        return s

    def search(
        self,
        query_texts: list[str] | None = None,
        filters: list[tuple] | None = None,
        order: tuple = ("score",),  # ("score",) | ("column", col, desc) | ("random", seed)
        page: int = 1,
        page_size: int = 28,
    ) -> OracleResult:
        queries = [parse_query(t, self.analyzer) for t in (query_texts or [])]
        matched = []
        for i, r in enumerate(self.rows):
            if queries and not all(self._query_matches(i, q) for q in queries):
                continue
            if filters and not all(self._filter_matches(r, *f) for f in filters):
                continue
            matched.append(i)
        total = len(matched)
        pos_terms = [t for q in queries for t in q.positive_terms()]
        scored = [(i, self._score(i, pos_terms) if queries else 0.0) for i in matched]

        ident = lambda i: tuple(self.rows[i][c] for c in self.spec.id_cols)
        if order[0] == "score":
            scored.sort(key=lambda x: ((-x[1]), ident(x[0])))
        elif order[0] == "random":
            seed = order[1]
            scored.sort(
                key=lambda x: hashlib.md5(
                    f"{seed}|{'|'.join(str(v) for v in ident(x[0]))}".encode()
                ).hexdigest()
            )
        else:
            _, col, desc = order
            nn = [x for x in scored if self.rows[x[0]].get(col) is not None]
            nulls = [x for x in scored if self.rows[x[0]].get(col) is None]
            if desc:
                nn.sort(key=lambda x: (_Rev(self.rows[x[0]][col]), ident(x[0])))
            else:
                nn.sort(key=lambda x: (self.rows[x[0]][col], ident(x[0])))
            nulls.sort(key=lambda x: ident(x[0]))
            scored = nn + nulls  # NULLS LAST, both directions (engine parity)

        total_pages = max(1, math.ceil(total / page_size)) if total else 1
        page = min(max(1, page), total_pages)
        off = (page - 1) * page_size
        sel = scored[off : off + page_size]
        out = []
        for i, s in sel:
            d = dict(self.rows[i])
            d["score"] = s
            out.append(d)
        return OracleResult(total=total, rows=out)


class _Rev:
    """Reverse-ordering wrapper for mixed-type sort keys."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return other.v == self.v
