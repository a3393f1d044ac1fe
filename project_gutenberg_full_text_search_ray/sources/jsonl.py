"""JSONL transcript ingest — the second source format next to Parquet.

Agent/conversation transcripts in the wild are almost always newline-
delimited JSON, in one of two shapes:

* **flat**: one JSON object per TURN —
  ``{"conv_id": ..., "turn_idx": 0, "role": "user", "text": "...",
  "tool": null, "ts": "2026-01-01T00:00:00"}``
* **nested**: one JSON object per CONVERSATION —
  ``{"conv_id": ..., "turns": [{"role": ..., "text": ..., ...}, ...]}``
  where ``turn_idx`` is implicit in list position.

Both are normalized to the canonical transcript schema
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` (BASELINE.json ``input_hint``; the Parquet path's
schema, sources/transcripts.py) so everything downstream — ``build_index``,
the prep operators, the oracles — is format-agnostic.

Scale notes:

* ``ray.data.read_json`` streams files through ``pyarrow.json`` (which
  parses NDJSON natively, incl. ``.gz``/``.zst``/… by extension), so ingest
  is embarrassingly parallel over files — no driver-side parsing.
* The nested→flat explode is vectorized Arrow (``list_flatten`` +
  offsets arithmetic), never a Python loop over conversations.
* JSON carries no row-group metadata, so a JSONL-sourced build cannot use
  the Parquet path's footer-aligned segment planning or resume fast-path
  *directly*; ``jsonl_input_fingerprint`` (path+size+mtime) gives refresh
  the same no-op detection, and the recommended 100 TB route is
  ``jsonl_to_parquet`` once → resumable Parquet builds after (the CLI
  ``ingest`` subcommand).
"""

from __future__ import annotations

import glob as _glob
import os
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CANONICAL_FIELDS: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]
CANONICAL_SCHEMA = pa.schema(CANONICAL_FIELDS)
_REQUIRED_FLAT = ("conv_id", "turn_idx", "text")
_REQUIRED_NESTED = ("conv_id", "turns")
_JSONL_EXTS = ("jsonl", "jsonl.gz", "jsonl.zst", "jsonl.br", "jsonl.lz4",
               "json", "json.gz", "json.zst", "json.br", "json.lz4")


def expand_jsonl_paths(paths: str | list[str]) -> list[str]:
    """Directories expand to their ``*.jsonl*``/``*.json*`` members; globs
    expand; concrete paths pass through.  Sorted for stable fingerprints."""
    raw = [paths] if isinstance(paths, str) else list(paths)
    out: list[str] = []
    for p in raw:
        if os.path.isdir(p):
            for ext in _JSONL_EXTS:
                out.extend(_glob.glob(os.path.join(p, f"*.{ext}")))
        elif any(c in p for c in "*?"):
            out.extend(_glob.glob(p))
        else:
            out.append(p)
    return sorted(set(out))


def jsonl_input_fingerprint(paths: str | list[str]) -> str:
    """Stable fingerprint of JSONL inputs: realpath + size + mtime_ns per
    file (the Parquet twin also folds in num_rows from the footer; JSON has
    no footer, and size+mtime already catch appends and rewrites).  Passed
    to ``build_index(..., input_fp=...)`` it restores refresh's unchanged-
    input fast path for JSONL-sourced builds."""
    from ..state.manifest import fingerprint

    parts = []
    for p in expand_jsonl_paths(paths):
        st = os.stat(p)
        parts.append(f"{os.path.realpath(p)}:{st.st_size}:{st.st_mtime_ns}")
    return fingerprint("jsonl", *parts)


def _col(batch: pa.Table, name: str) -> pa.ChunkedArray | None:
    return batch.column(name) if name in batch.column_names else None


def _coerce_ts(arr: pa.Array | pa.ChunkedArray, ts_unit: str) -> pa.Array | pa.ChunkedArray:
    """ISO-8601 strings and epoch ints both appear as ``ts`` in real JSONL.

    * timestamp[*] → cast to µs (tz-aware inputs keep their UTC instant;
      the canonical column is naive-UTC like the Parquet fixture's).
    * string → Arrow's ISO-8601 parser via cast.
    * int → epoch ticks in ``ts_unit`` (explicit, never magnitude-guessed:
      a wrong unit is silent corruption — ADVICE r3 on sessionize).
    * all-null (JSON ``null``-typed) → null timestamps.
    """
    t = arr.type
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            arr = arr.cast(pa.timestamp("us", tz=t.tz)).cast(pa.timestamp("us"))
        return arr.cast(pa.timestamp("us"))
    if pa.types.is_null(t):
        return arr.cast(pa.timestamp("us"))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return arr.cast(pa.timestamp("us"))
    if pa.types.is_integer(t):
        return arr.cast(pa.int64()).cast(pa.timestamp(ts_unit)).cast(pa.timestamp("us"))
    raise TypeError(f"ts column has unsupported JSON type {t}; expected "
                    "timestamp, ISO-8601 string, or epoch int")


def normalize_turn_batch(batch: pa.Table, *, ts_unit: str = "us") -> pa.Table:
    """Coerce one flat-turn batch to CANONICAL_SCHEMA.

    Required: conv_id, turn_idx, text.  Optional: role (null when absent —
    no silent default), tool, ts.  Raises loudly on missing required
    columns: a typo'd field name must not index an empty corpus."""
    missing = [c for c in _REQUIRED_FLAT if c not in batch.column_names]
    if missing:
        raise ValueError(
            f"JSONL turn records missing required field(s) {missing}; "
            f"present: {batch.column_names} (nested per-conversation files "
            "need read_transcripts_jsonl(..., nested=True))")
    n = batch.num_rows
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    cols["conv_id"] = batch["conv_id"].cast(pa.string())
    cols["turn_idx"] = batch["turn_idx"].cast(pa.int32())
    cols["text"] = batch["text"].cast(pa.string())
    for name in ("role", "tool"):
        c = _col(batch, name)
        cols[name] = (c.cast(pa.string()) if c is not None
                      else pa.nulls(n, pa.string()))
    c = _col(batch, "ts")
    cols["ts"] = (_coerce_ts(c, ts_unit) if c is not None
                  else pa.nulls(n, pa.timestamp("us")))
    return pa.table({name: cols[name] for name, _ in CANONICAL_FIELDS})


def explode_conversations(batch: pa.Table) -> pa.Table:
    """One conversation row ``{conv_id, turns:[{role,text,tool,ts},...]}``
    → one row per turn with ``turn_idx`` = position in the list.

    Vectorized end to end: ``list_flatten`` for the struct payload, offsets
    arithmetic (cumsum/repeat) for parent ids and in-list positions — no
    Python loop over conversations, so million-conversation blocks explode
    at memory bandwidth.  Null/empty ``turns`` lists contribute no rows."""
    missing = [c for c in _REQUIRED_NESTED if c not in batch.column_names]
    if missing:
        raise ValueError(
            f"nested JSONL conversation records missing {missing}; "
            f"present: {batch.column_names}")
    turns = batch["turns"].combine_chunks()
    if isinstance(turns, pa.ChunkedArray):  # 0- or 1-chunk after combine
        turns = (turns.chunk(0) if turns.num_chunks
                 else pa.array([], type=turns.type))
    if not (pa.types.is_list(turns.type) or pa.types.is_large_list(turns.type)):
        raise TypeError(f"'turns' must be a list of structs, got {turns.type}")
    counts = pc.list_value_length(turns)
    counts = pc.fill_null(counts, 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
    total = int(counts.sum())
    ends = np.cumsum(counts)
    starts = ends - counts
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    turn_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)

    flat = pc.list_flatten(turns)  # StructArray of the non-null turns
    if not pa.types.is_struct(flat.type):
        raise TypeError(f"'turns' elements must be structs, got {flat.type}")
    present = {f.name for f in flat.type}

    def field(name: str) -> pa.Array:
        if name in present:
            return pc.struct_field(flat, name)
        return pa.nulls(total, pa.string())

    out = pa.table({
        "conv_id": batch["conv_id"].take(pa.array(parent)),
        "turn_idx": pa.array(turn_idx, type=pa.int64()),
        "role": field("role"),
        "text": field("text"),
        "tool": field("tool"),
        "ts": field("ts"),
    })
    # per-turn turn_idx overrides list position when the struct carries one
    # explicitly (partial-conversation files where position ≠ index)
    if "turn_idx" in present:
        explicit = pc.struct_field(flat, "turn_idx")
        out = out.set_column(1, "turn_idx",
                             pc.coalesce(explicit.cast(pa.int64()),
                                         out["turn_idx"]))
    return out


def read_transcripts_jsonl(
    paths: str | list[str],
    *,
    nested: bool = False,
    ts_unit: str = "us",
    **read_json_kwargs,
):
    """Read JSONL transcripts as a canonical-schema ``ray.data.Dataset``.

    ``nested=True`` for one-object-per-conversation files.  ``ts_unit``
    interprets integer ``ts`` values (``"s"``/``"ms"``/``"us"``/``"ns"``).
    Extra kwargs pass through to ``ray.data.read_json`` (compression is
    handled by file extension there)."""
    import ray.data as rd

    expanded = expand_jsonl_paths(paths)
    if not expanded:
        raise FileNotFoundError(f"no JSONL files match {paths!r}")
    ds = rd.read_json(expanded, **read_json_kwargs)
    if nested:
        ds = ds.map_batches(explode_conversations, batch_format="pyarrow")
    return ds.map_batches(partial(normalize_turn_batch, ts_unit=ts_unit),
                          batch_format="pyarrow")


def jsonl_to_parquet(
    src: str | list[str],
    out_dir: str,
    *,
    nested: bool = False,
    ts_unit: str = "us",
) -> str:
    """One-time JSONL → partitioned Parquet conversion (the resumable path:
    Parquet builds get footer-aligned segments + row-count fingerprints).
    Streaming write — nothing corpus-sized materializes anywhere."""
    ds = read_transcripts_jsonl(src, nested=nested, ts_unit=ts_unit)
    ds.write_parquet(out_dir)
    return out_dir
