"""Query-language parser mirroring ``websearch_to_tsquery`` semantics.

Reference behavior (P6 in SURVEY.md §2.2): /root/reference/search/
full_text_search.py:139 feeds user text through ``websearch_to_tsquery``,
whose syntax (documented at /root/reference/README.md:149-164) is:

    word word      implicit AND
    "a phrase"     consecutive-position phrase match
    a or b         OR (lowest precedence, case-insensitive keyword)
    -word          NOT (also ``-"phrase"``)
    a <N> b        FOLLOWED BY at exact distance N (tsquery ``<N>``;
                   ``<->`` == ``<1>``) — chains left-associatively
                   (``a <-> b <2> c``) and binds phrases on either side;
                   a marker that cannot combine (query edge, OR boundary,
                   negated operand) is dropped, websearch-leniency style

We parse to a tiny AST: ``Or([And([atom...])])`` where atoms are ``Term``,
``Phrase`` or ``Not(atom)``.  Terms inside atoms are run through the same
Analyzer as the build side; atoms that analyze to nothing vanish (like
Postgres dropping stopword-only tsquery nodes).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analyzer import Analyzer, DEFAULT_ANALYZER


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Phrase:
    """``offsets`` preserve pre-stopword gaps (Postgres ``war <2> peace`` for
    '"war and peace"' under a stopword config): offsets[k] is term k's
    distance from the phrase start in the INDEXED position stream.  None =
    consecutive (the default-analyzer case, where positions have no gaps)."""

    terms: tuple[str, ...]
    offsets: tuple[int, ...] | None = None


@dataclass(frozen=True)
class Not:
    atom: "Term | Phrase"


Atom = Term | Phrase | Not


@dataclass(frozen=True)
class AndGroup:
    atoms: tuple[Atom, ...]


@dataclass(frozen=True)
class ParsedQuery:
    """Disjunction of conjunctions. Empty groups == match-nothing query."""

    groups: tuple[AndGroup, ...]

    def positive_terms(self) -> list[str]:
        """Unique positive (non-negated) terms across the query, in first-seen
        order — these are the scoring terms for BM25."""
        seen: dict[str, None] = {}
        for g in self.groups:
            for a in g.atoms:
                if isinstance(a, Term):
                    seen.setdefault(a.term)
                elif isinstance(a, Phrase):
                    for t in a.terms:
                        seen.setdefault(t)
        return list(seen)

    def all_terms(self) -> list[str]:
        """Every term referenced (incl. negated) — what the searcher must fetch."""
        seen: dict[str, None] = {}
        for g in self.groups:
            for a in g.atoms:
                inner = a.atom if isinstance(a, Not) else a
                if isinstance(inner, Term):
                    seen.setdefault(inner.term)
                else:
                    for t in inner.terms:
                        seen.setdefault(t)
        return list(seen)

    def phrase_terms(self) -> list[str]:
        """Terms appearing inside Phrase atoms (incl. negated phrases) — the
        only terms whose POSITIONAL payload a query needs; everything else
        can skip reading the pos column entirely."""
        seen: dict[str, None] = {}
        for g in self.groups:
            for a in g.atoms:
                inner = a.atom if isinstance(a, Not) else a
                if isinstance(inner, Phrase):
                    for t in inner.terms:
                        seen.setdefault(t)
        return list(seen)

    @property
    def is_empty(self) -> bool:
        return not self.groups


def scope_to_field(q: ParsedQuery, fld: str) -> ParsedQuery:
    """Rewrite every term of a parsed query to the per-field posting key
    ``<field>\\x1f<term>`` — field-scoped match AND field-local scoring
    (reference per-field tsvectors, mv_books_dc.sql:135-194)."""
    from ..corpus import field_term

    def conv_atom(a: Atom) -> Atom:
        if isinstance(a, Not):
            return Not(conv_atom(a.atom))
        if isinstance(a, Phrase):
            return Phrase(tuple(field_term(fld, t) for t in a.terms), a.offsets)
        return Term(field_term(fld, a.term))

    return ParsedQuery(tuple(
        AndGroup(tuple(conv_atom(a) for a in g.atoms)) for g in q.groups
    ))


_LEX = re.compile(r'(-?)"([^"]*)"|(\S+)')
# tsquery FOLLOWED-BY distance marker: <N> (exact distance) or <-> (== <1>)
_NEAR = re.compile(r"<(\d+)>|<->")


def parse_query(text: str, analyzer: Analyzer = DEFAULT_ANALYZER) -> ParsedQuery:
    """Parse websearch-style text into a ParsedQuery (OR of AND-groups)."""
    raw_tokens: list[tuple[str, bool, bool]] = []  # (payload, is_phrase, negated)
    for m in _LEX.finditer(text or ""):
        if m.group(2) is not None:
            # quoted phrase, optionally negated with a leading '-': -"a b"
            raw_tokens.append((m.group(2), True, m.group(1) == "-"))
            continue
        tok = m.group(3)
        # websearch_to_tsquery: ONE leading '-' negates; any further dashes
        # are token punctuation the analyzer drops ('--cat' == NOT cat, not
        # a double negation back to positive)
        neg = False
        if tok.startswith("-") and len(tok) > 1:
            neg = True
            tok = tok[1:]
        if tok.lower() == "or" and not neg:
            raw_tokens.append(("\x00OR", False, False))
        elif tok.startswith('"') and tok.endswith('"') and len(tok) > 1:
            raw_tokens.append((tok.strip('"'), True, neg))
        else:
            raw_tokens.append((tok, False, neg))

    groups: list[AndGroup] = []
    current: list[Atom] = []

    def flush() -> None:
        nonlocal current
        if current:
            groups.append(AndGroup(tuple(current)))
            current = []

    def near_rhs(payload: str, is_phrase: bool) -> tuple[tuple[str, ...], tuple[int, ...]]:
        """Analyze a FOLLOWED-BY right operand to (terms, offsets-from-own-start)."""
        if is_phrase:
            t_list, pos = analyzer.tokenize_with_positions(payload)
            return tuple(t_list), tuple(p - pos[0] for p in pos) if t_list else ()
        terms = tuple(analyzer.tokenize(payload))
        return terms, tuple(range(len(terms)))

    i = 0
    while i < len(raw_tokens):
        payload, is_phrase, neg = raw_tokens[i]
        if payload == "\x00OR" and not is_phrase:
            flush()
            i += 1
            continue
        m_near = None if is_phrase or neg else _NEAR.fullmatch(payload)
        if m_near is not None:
            n_dist = int(m_near.group(1)) if m_near.group(1) else 1
            nxt = raw_tokens[i + 1] if i + 1 < len(raw_tokens) else None
            prev = current[-1] if current else None
            if (prev is not None and not isinstance(prev, Not)
                    and nxt is not None and not nxt[2]
                    and not (nxt[0] == "\x00OR" and not nxt[1])):
                rterms, roffs = near_rhs(nxt[0], nxt[1])
                if rterms:
                    if isinstance(prev, Term):
                        lterms, loffs = (prev.term,), (0,)
                    else:
                        lterms = prev.terms
                        loffs = prev.offsets or tuple(range(len(lterms)))
                    base = loffs[-1] + n_dist
                    terms = lterms + rterms
                    offs: tuple[int, ...] | None = loffs + tuple(base + o for o in roffs)
                    if offs == tuple(range(len(terms))):
                        offs = None  # consecutive — keep plans identical to '"…"'
                    current[-1] = Phrase(terms, offs)
                    i += 2
                    continue
            # marker with no combinable operands — drop it (websearch-style
            # leniency; strict tsquery would raise a syntax error here)
            i += 1
            continue
        if is_phrase:
            t_list, pos = analyzer.tokenize_with_positions(payload)
            terms = tuple(t_list)
            if terms:
                # keep pre-stopword gaps so '"war and peace"' demands
                # war<2>peace against the pre-stopword position stream
                offs = tuple(p - pos[0] for p in pos)
                if offs == tuple(range(len(terms))):
                    offs = None  # consecutive — keep plans identical
                atom: Atom = Phrase(terms, offs) if len(terms) > 1 else Term(terms[0])
                current.append(Not(atom) if neg else atom)
        else:
            terms = tuple(analyzer.tokenize(payload))
            for t in terms:
                current.append(Not(Term(t)) if neg else Term(t))
        i += 1
    flush()
    # A query that reduced to only-negated atoms in every group still has
    # groups; the evaluator handles pure-negative groups (match docs lacking
    # the negated atoms). A fully empty parse means "match nothing".
    return ParsedQuery(tuple(groups))
