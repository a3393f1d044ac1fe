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
    if meta_cols:
        payload = pa.StructArray.from_arrays(
            [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c] for c in meta_cols],
            names=meta_cols,
        )
    else:
        # no metadata: from_arrays([], names=[]) builds a LENGTH-0 struct
        # array that can't be appended to an n-row table — emit n empty
        # structs instead
        payload = pa.array([{}] * t.num_rows, type=pa.struct([]))
    out = t.select([*spec.id_cols, SCORE_COL])
    return out.append_column("payload", payload)


DEFAULT_FORMAT_PREFS: tuple[str, ...] = (
    "epub3.images", "epub.images", "epub.noimages", "kindle.images",
    "pdf.images", "pdf.noimages", "html",
)
AUDIO_FORMAT_PREFS: tuple[str, ...] = ("index", "html")


def opds_like_crosswalk(
    t: pa.Table,
    spec: CorpusSpec,
    *,
    variants_col: str = "formats",
    format_prefs: tuple[str, ...] = DEFAULT_FORMAT_PREFS,
    audio_prefs: tuple[str, ...] = AUDIO_FORMAT_PREFS,
    is_audio_col: str | None = None,
    base_url: str = "https://example.org/",
    default_href: Callable[[dict], str] | None = None,
) -> pa.Table:
    """OPDS-publication projection with the reference's FALLBACK semantics
    (/root/reference/search/crosswalks.py:144-204):

    * ordered format-preference chain over a ``list<struct>`` variants
      column — first variant whose ``filetype`` equals the most-preferred
      available format wins (audio rows use the audio chain);
    * relative ``filename``s resolve against ``base_url``; absolute http(s)
      pass through;
    * at least one acquisition link is GUARANTEED — rows with no matching
      variant get the default-href fallback (:180-186);
    * cover selection mirrors the reference loop EXACTLY (:190-205): the
      first plain ``cover`` is appended if it precedes, then ``cover.medium``
      stops the scan — so a medium cover that follows a plain one lands
      SECOND in ``images`` (quirk inherited for parity, not preference).

    Applied to the final result page (≤ page_size rows), like the
    reference's per-row ``_transform`` — not a corpus-scale stage."""
    import json

    n = t.num_rows
    variants = (t[variants_col].to_pylist() if variants_col in t.column_names
                else [None] * n)
    audio = (t[is_audio_col].to_pylist() if is_audio_col and is_audio_col in t.column_names
             else [False] * n)
    id_vals = [t[c].to_pylist() for c in spec.id_cols]

    def href_of(fn: str) -> str:
        if fn.startswith(("http://", "https://")):
            return fn
        return base_url.rstrip("/") + "/" + fn.lstrip("/")

    payloads: list[str] = []
    for i in range(n):
        fmts = variants[i] or []
        prefs = audio_prefs if audio[i] else format_prefs
        links: list[dict] = []
        for want in prefs:
            for f in fmts:
                fn = (f or {}).get("filename")
                if not fn:
                    continue
                if ((f.get("filetype") or "").strip().lower()) != want:
                    continue
                link = {
                    "rel": "http://opds-spec.org/acquisition/open-access",
                    "href": href_of(fn),
                    "type": (f.get("mediatype") or "").strip() or "application/epub+zip",
                }
                if f.get("extent"):
                    link["length"] = f["extent"]
                links.append(link)
                break
            if links:
                break
        if not links:  # OPDS requires ≥1 acquisition link — synthesize default
            row_ids = {c: id_vals[j][i] for j, c in enumerate(spec.id_cols)}
            href = (default_href(row_ids) if default_href
                    else href_of("items/" + "-".join(str(v) for v in row_ids.values())))
            links.append({"rel": "http://opds-spec.org/acquisition/open-access",
                          "href": href, "type": "text/html"})
        images: list[dict] = []
        for f in fmts:
            ft = (f or {}).get("filetype") or ""
            fn = (f or {}).get("filename")
            if fn and ("cover.medium" in ft or ("cover" in ft and not images)):
                images.append({"href": href_of(fn), "type": "image/jpeg"})
                if "cover.medium" in ft:
                    break
        doc = {"links": links}
        if images:
            doc["images"] = images  # first plain cover + cover.medium, like :190-205
        payloads.append(json.dumps(doc, sort_keys=True))

    out = t.select([c for c in (*spec.id_cols, SCORE_COL) if c in t.column_names])
    return out.append_column("opds", pa.array(payloads, type=pa.string()))


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
