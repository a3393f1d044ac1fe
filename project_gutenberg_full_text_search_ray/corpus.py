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


@dataclass(frozen=True)
class CorpusSpec:
    id_cols: tuple[str, ...]
    text_col: str
    meta_cols: tuple[str, ...] = ()
    name: str = "corpus"

    @property
    def read_cols(self) -> list[str]:
        return [*self.id_cols, self.text_col, *self.meta_cols]

    def tag(self) -> str:
        return f"{self.name}|id={','.join(self.id_cols)}|text={self.text_col}|meta={','.join(self.meta_cols)}"


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
