"""Output projections ("crosswalks") — C1–C5 in SURVEY.md §2.2.

Reference: /root/reference/search/crosswalks.py (FULL :8-16, MINI :19-26,
PG :29-56, OPDS :59-206, dispatch :209-214) applied per row in
``FullTextSearch._transform`` (full_text_search.py:361-364).  Ours are
vectorized Arrow-table → Arrow-table projections applied to the (small)
final result page; CUSTOM is the user hook (full_text_search.py:351-353).
"""

from __future__ import annotations

import enum
from typing import Callable

import pyarrow as pa

from .corpus import CorpusSpec
from .stages.segment_search import SCORE_COL


class Crosswalk(enum.Enum):
    FULL = "full"
    MINI = "mini"
    NESTED = "nested"  # PG/OPDS analog: nested struct payload (the `dc` jsonb)
    CUSTOM = "custom"


def full_crosswalk(t: pa.Table, spec: CorpusSpec) -> pa.Table:
    cols = [*spec.id_cols, *spec.meta_cols, "dl", SCORE_COL]
    return t.select([c for c in cols if c in t.column_names])


def mini_crosswalk(t: pa.Table, spec: CorpusSpec) -> pa.Table:
    """Rename-style projection (reference MINI renames title→name etc.)."""
    out = {}
    for i, c in enumerate(spec.id_cols):
        out[f"id{i}" if len(spec.id_cols) > 1 else "id"] = t[c]
    out[SCORE_COL] = t[SCORE_COL]
    return pa.table(out)


def nested_crosswalk(t: pa.Table, spec: CorpusSpec) -> pa.Table:
    """Struct payload column — stands in for the reference's nested `dc`
    jsonb document (mv_books_dc.sql:196-430): identity stays flat, all
    metadata is packed into one Arrow struct column."""
    meta_cols = [c for c in (*spec.meta_cols, "dl") if c in t.column_names]
    payload = pa.StructArray.from_arrays(
        [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c] for c in meta_cols],
        names=meta_cols,
    )
    out = t.select([*spec.id_cols, SCORE_COL])
    return out.append_column("payload", payload)


Transformer = Callable[[pa.Table, CorpusSpec], pa.Table]


def apply_crosswalk(
    t: pa.Table,
    cw: Crosswalk,
    spec: CorpusSpec,
    custom: Transformer | None = None,
) -> pa.Table:
    if cw is Crosswalk.FULL:
        return full_crosswalk(t, spec)
    if cw is Crosswalk.MINI:
        return mini_crosswalk(t, spec)
    if cw is Crosswalk.NESTED:
        return nested_crosswalk(t, spec)
    if cw is Crosswalk.CUSTOM:
        if custom is None:
            raise ValueError("CUSTOM crosswalk requires set_custom_transformer()")
        return custom(t, spec)
    raise ValueError(cw)
