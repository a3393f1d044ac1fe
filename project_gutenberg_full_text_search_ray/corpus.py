"""Corpus specifications: how a Parquet table maps onto the index.

The reference indexes one denormalized table of books
(/root/reference/tables/mv_books_dc.sql:30-431).  Our engine is generic over
"a table with identity columns, one text column, and metadata columns":

* transcripts  (north-rule input): id = (conv_id, turn_idx), text = text,
  meta = role/tool/ts   — doc_id = (conv_id, turn_idx) per BASELINE.json.
* documents    (driver testdata):  id = (doc_id,), text = text,
  meta = lang/source/n_chars.

Document identity doubles as the rank tie-break (reference uses
``downloads DESC`` as secondary sort, full_text_search.py:277-279; we fix a
total order on identity instead, SURVEY.md §7.4 "rank identity").
"""

from __future__ import annotations

from dataclasses import dataclass, field


FIELD_SEP = "\x1f"  # posting-key separator: "<field>\x1f<term>" — cannot
# appear in analyzer tokens ([a-z0-9]+), so field keyspaces never collide


def field_term(fld: str, term: str) -> str:
    return f"{fld}{FIELD_SEP}{term}"


@dataclass(frozen=True)
class CorpusSpec:
    """``field_cols`` are EXTRA text columns indexed per-field (the
    reference keeps 7 per-field tsvectors and ranks field-scoped queries by
    the field vector, mv_books_dc.sql:135-194 / full_text_search.py:277-279):
    their postings live under ``field\\x1fterm`` keys with field-local df,
    tf, positions, dl and avgdl — so a field-scoped query is scored against
    field-local statistics, not whole-document ones."""

    id_cols: tuple[str, ...]
    text_col: str
    meta_cols: tuple[str, ...] = ()
    name: str = "corpus"
    field_cols: tuple[str, ...] = ()

    @property
    def read_cols(self) -> list[str]:
        return [*self.id_cols, self.text_col, *self.meta_cols, *self.field_cols]

    def tag(self) -> str:
        return (
            f"{self.name}|id={','.join(self.id_cols)}|text={self.text_col}"
            f"|meta={','.join(self.meta_cols)}|fields={','.join(self.field_cols)}"
        )


TRANSCRIPTS_SPEC = CorpusSpec(
    id_cols=("conv_id", "turn_idx"),
    text_col="text",
    meta_cols=("role", "tool", "ts"),
    name="transcripts",
)

DOCUMENTS_SPEC = CorpusSpec(
    id_cols=("doc_id",),
    text_col="text",
    meta_cols=("lang", "source", "n_chars"),
    name="documents",
)
