"""Index + per-partition lineage manifests (checkpoint/resume).

The reference's "refresh" is an all-or-nothing transactional MV rebuild
(/root/reference/tables/mv_books_dc.sql:502-514).  At 100 TB that is not an
option, so per the north rule each index *segment* (a doc partition) writes an
atomic ``_SEG_MANIFEST.json`` recording its build fingerprint, row counts and
file list; a re-run with the same fingerprint skips the posting build + write
for completed segments (write-tmp-then-rename makes partial writes invisible).
The top-level ``manifest.json`` is written last and is the commit point for a
generation — queries only ever read through it.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

SEG_MANIFEST = "_SEG_MANIFEST.json"
INDEX_MANIFEST = "manifest.json"
FORMAT_VERSION = 1


def fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def parquet_input_fingerprint(paths: list[str]) -> str:
    """Stable fingerprint of parquet inputs: name + size + mtime_ns + num_rows
    per file (mtime catches in-place rewrites that preserve size/rows).
    Directories expand to their *.parquet members."""
    import glob as _glob

    import pyarrow.parquet as pq

    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(_glob.glob(os.path.join(p, "*.parquet")))
        else:
            expanded.append(p)
    parts = []
    for p in sorted(expanded):
        st = os.stat(p)
        nrows = pq.read_metadata(p).num_rows
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}:{nrows}")
    return fingerprint(*parts)


def atomic_write_json(path: str, obj: dict[str, Any]) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str) -> dict[str, Any] | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def seg_dir(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, f"seg={seg_id:05d}")


def seg_is_complete(index_dir: str, seg_id: int, build_fp: str) -> bool:
    m = read_json(os.path.join(seg_dir(index_dir, seg_id), SEG_MANIFEST))
    return bool(m) and m.get("fingerprint") == build_fp and m.get("status") == "complete"


def load_index_manifest(index_dir: str) -> dict[str, Any]:
    m = read_json(os.path.join(index_dir, INDEX_MANIFEST))
    if m is None:
        raise FileNotFoundError(f"no {INDEX_MANIFEST} in {index_dir} (index not built/committed)")
    if m.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"index format {m.get('format_version')} != {FORMAT_VERSION}")
    return m
