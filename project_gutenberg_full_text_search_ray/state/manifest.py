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


def parquet_input_fingerprint(paths: list[str], metas: dict | None = None) -> str:
    """Stable fingerprint of parquet inputs: ABSOLUTE path + size + mtime_ns
    + num_rows per file (mtime catches in-place rewrites that preserve
    size/rows; the full path catches pointing the build at a different
    directory holding same-named same-shaped files — the per-segment
    fingerprints already defend against that, and the commit-level fast
    path must agree).  Directories expand to their *.parquet members.
    ``metas`` (path → ParquetFileMetadata) reuses a caller's metadata pass
    instead of re-reading every footer."""
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
        md = metas.get(p) if metas is not None else None
        nrows = (md if md is not None else pq.read_metadata(p)).num_rows
        # realpath, not abspath: relative sources + a different refresh cwd
        # (or a symlinked mount) must not change the fingerprint and silently
        # miss the resume fast-path.  (One-time migration: pre-realpath
        # indexes whose paths contained symlinks re-fingerprint once.)
        parts.append(f"{os.path.realpath(p)}:{st.st_size}:{st.st_mtime_ns}:{nrows}")
    return fingerprint(*parts)


def atomic_write_json(path: str, obj: dict[str, Any]) -> None:
    """Write-tmp → fsync → rename → fsync(dir): without the fsyncs, delayed
    allocation can persist the rename before the data blocks, and a power
    loss would replace the COMMITTED manifest with a truncated file."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dir_fd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def read_json(path: str) -> dict[str, Any] | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def seg_dirname(seg_id: int, seg_fp: str | None = None) -> str:
    """Segment directory name.  With a fingerprint, the name is GENERATION-
    QUALIFIED (``seg=00001_ab12cd34``): a refresh that changes a segment
    writes a NEW directory and never touches the one the committed manifest
    references — the manifest swap stays the only commit point, readers of
    the old generation keep valid files, and a crash mid-refresh leaves the
    old generation fully intact.  The bare form is the pre-generation legacy
    layout, still readable."""
    return f"seg={seg_id:05d}" if not seg_fp else f"seg={seg_id:05d}_{seg_fp[:8]}"


def seg_dir(index_dir: str, seg_id: int, seg_fp: str | None = None) -> str:
    return os.path.join(index_dir, seg_dirname(seg_id, seg_fp))


def dict_dirname(build_fp: str | None = None) -> str:
    """Dictionary directory, generation-qualified like segments."""
    return "dict" if not build_fp else f"dict_{build_fp[:8]}"


def resolve_dirs(index_dir: str, manifest: dict[str, Any] | None = None,
                 ) -> tuple[dict[int, str], str]:
    """(seg_id → absolute segment dir, absolute dict dir) for the COMMITTED
    generation.  Every reader resolves paths through this — never by naming
    convention — so partially-written future generations are invisible."""
    m = manifest if manifest is not None else (read_json(os.path.join(index_dir, INDEX_MANIFEST)) or {})
    segs: dict[int, str] = {}
    for e in m.get("segments", []):
        d = e.get("dir") or seg_dirname(int(e["seg_id"]))
        segs[int(e["seg_id"])] = os.path.join(index_dir, d)
    dict_dir = os.path.join(index_dir, m.get("dict_dirname") or "dict")
    return segs, dict_dir


def vacuum_index(index_dir: str) -> list[str]:
    """Delete generation artifacts (``seg=*``, ``dict*``, ``dict_trigrams*``
    dirs) NOT referenced by the committed manifest.  Run only when no reader
    may still hold an older generation (the expire-snapshots analog).
    Returns the removed directory names."""
    import glob as _glob
    import shutil

    from ..stages.trigram import TRIGRAM_DIR, trigram_dirname

    m = load_index_manifest(index_dir)
    segs, dict_dir = resolve_dirs(index_dir, m)
    keep = {os.path.basename(p) for p in segs.values()}
    keep.add(os.path.basename(dict_dir))
    # the derived trigram cache of the COMMITTED generation — the name comes
    # from the same function ensure_trigram_index uses, so it cannot drift
    keep.add(trigram_dirname(m.get("fingerprint", "")))
    keep.add(TRIGRAM_DIR)  # legacy derived dir
    removed = []
    for p in _glob.glob(os.path.join(index_dir, "seg=*")) + \
            _glob.glob(os.path.join(index_dir, "dict*")):
        base = os.path.basename(p)
        if base not in keep and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(base)
    return sorted(removed)


def load_index_manifest(index_dir: str) -> dict[str, Any]:
    m = read_json(os.path.join(index_dir, INDEX_MANIFEST))
    if m is None:
        raise FileNotFoundError(f"no {INDEX_MANIFEST} in {index_dir} (index not built/committed)")
    if m.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"index format {m.get('format_version')} != {FORMAT_VERSION}")
    return m
