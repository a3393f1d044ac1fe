"""Vectorized field-parsing kernels — the N3–N8 normalizer battery.

The reference derives its materialized-view columns with Postgres string
machinery: MARC ``$b`` subtitle extraction via ``SPLIT_PART``/``TRIM``
(/root/reference/tables/mv_books_dc.sql:88-97,185-194), publisher ``$a/$b/$c``
struct parsing (:271-291), credits "Updated:" splitting with
``regexp_split_to_array`` (:361-374), ``CONCAT_WS`` doc-text assembly
(:59-73), and html-escaping of description paragraphs
(/root/reference/search/crosswalks.py:107-112).

Here each of those is an Arrow-native kernel over a column (ChunkedArray or
Array) so it can run zero-copy inside ``map_batches``.  Semantics exactly
match the DuckDB function of the same name — the driver oracles rely on it:

  * ``split_part(col, sep, n)``  == DuckDB ``split_part`` (1-based, '' when
    the part is missing — and, matching DuckDB, '' for NULL input too)
  * ``concat_ws(sep, *cols)``    == ``concat_ws`` (NULL elements skipped)
  * ``regexp_split_first(col, pat)`` == ``regexp_split_to_array(col, pat)[1]``
  * ``html_escape(col)``         == nested ``replace`` chain (&, <, >, ", ')
  * ``json_extract_int(col, key)`` == ``CAST(json_extract(col, '$.key') AS
    INT)`` for flat integer-valued JSON objects (the `dc` jsonb analog)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _arr(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _nth_from_lists(lists: pa.ListArray, n: int, *, null_empty: bool = True) -> pa.Array:
    """Element ``n`` (1-based) of each list; '' when out of range.  NULL lists
    become '' when ``null_empty`` (DuckDB ``split_part``) else stay NULL
    (DuckDB ``regexp_split_to_array(...)[1]``).  Vectorized via a flat take
    with guard indices."""
    lists = _arr(lists)
    flat = lists.values  # full child buffer — offsets below index into it
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offsets)
    valid = np.asarray(pc.is_valid(lists))
    want = offsets[:-1] + (n - 1)
    in_range = (n - 1 >= 0) & ((n - 1) < lengths) & valid
    # guard: rows out of range take element 0 (any valid slot), then get ''
    idx = np.where(in_range, want, 0)
    if len(flat) == 0:
        taken = pa.array([""] * len(lists), type=pa.string())
    else:
        taken = pc.take(flat, pa.array(idx, type=pa.int64()))
    out = pc.if_else(pa.array(in_range), taken, pa.scalar("", type=pa.string()))
    if null_empty:
        return out  # NULL list -> '' (DuckDB split_part(NULL, ...) = '')
    return pc.if_else(pa.array(valid), out, pa.scalar(None, type=pa.string()))


def split_part(col: pa.Array | pa.ChunkedArray, sep: str, n: int) -> pa.Array:
    """DuckDB-compatible ``split_part`` (literal separator, 1-based)."""
    if n < 1:
        raise ValueError("split_part index is 1-based")
    lists = pc.split_pattern(_arr(col), pattern=sep)
    return _nth_from_lists(lists, n)


def regexp_split_first(col: pa.Array | pa.ChunkedArray, pattern: str) -> pa.Array:
    """``regexp_split_to_array(col, pattern)[1]`` — the text before the first
    match (whole string when the pattern never matches).  The credits
    "Updated:" split (mv_books_dc.sql:361-374)."""
    lists = pc.split_pattern_regex(_arr(col), pattern=pattern)
    return _nth_from_lists(lists, 1, null_empty=False)


def parse_struct_fields(col: pa.Array | pa.ChunkedArray, sep: str = " ",
                        fields: tuple[str, ...] = ("a", "b", "c")) -> pa.StructArray:
    """Publisher ``$a/$b/$c``-style parse (mv_books_dc.sql:271-291): the first
    ``len(fields)`` separator-delimited parts as a struct column, missing
    parts as ''."""
    src = _arr(col)
    lists = pc.split_pattern(src, pattern=sep)
    arrays = [_nth_from_lists(lists, i + 1) for i in range(len(fields))]
    return pa.StructArray.from_arrays(arrays, names=list(fields))


def concat_ws(sep: str, *cols: pa.Array | pa.ChunkedArray) -> pa.Array:
    """DuckDB-compatible ``CONCAT_WS`` — NULL elements are skipped, not
    poisoned (mv_books_dc.sql:59-73 doc-text assembly).

    NOTE: not ``binary_join_element_wise(null_handling="skip")`` — in
    pyarrow 16.1 that kernel DROPS rows where every input is NULL (output
    shorter than input).  Explicit validity-masked fold instead."""
    arrays = [_arr(c) for c in cols]
    n = len(arrays[0])
    out = pa.array([""] * n, type=pa.string())
    started = np.zeros(n, dtype=bool)
    for a in arrays:
        valid = pc.is_valid(a).to_numpy(zero_copy_only=False)
        filled = pc.fill_null(a.cast(pa.string()), "")
        joined = pc.binary_join_element_wise(out, filled, pa.scalar(sep))
        appended = pc.if_else(pa.array(started), joined, filled)
        out = pc.if_else(pa.array(valid), appended, out)
        started |= valid
    return out


_HTML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                 ('"', "&quot;"), ("'", "&#x27;")]


def html_escape(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """html.escape-equivalent replace chain ('&' first), matching the oracle's
    nested ``replace(...)`` exactly (crosswalks.py:107-112 analog)."""
    out = _arr(col)
    for raw, esc in _HTML_ESCAPES:
        out = pc.replace_substring(out, pattern=raw, replacement=esc)
    return out


def html_escape_sql(expr: str) -> str:
    """The DuckDB expression mirroring ``html_escape`` for oracle SQL."""
    out = expr
    for raw, esc in _HTML_ESCAPES:
        raw_sql = raw.replace("'", "''")
        out = f"replace({out}, '{raw_sql}', '{esc}')"
    return out


def json_extract_int(col: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Integer value at top-level ``key`` of a flat JSON object column — the
    query-able analog of the reference's ``dc`` jsonb path extraction
    (full_text_search.py:215-253).  Vectorized RE2 extraction; NULL when the
    key is absent or non-integer."""
    # trailing [,}] delimiter (RE2 has no lookahead): without it the integer
    # PREFIX of a float/exponent value would match — 12.5 → 12, 1e3 → 1 —
    # instead of the documented NULL-for-non-integer
    pat = '"' + key + '"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}]'
    st = pc.extract_regex(_arr(col), pattern=pat)
    return pc.struct_field(st, "v").cast(pa.int64())
