"""Segment merge / compaction — the "merge" half of the north rule.

Real engines compact many small immutable segments into fewer large ones
(Lucene merge policy); the reference's analog is the monolithic MV rebuild.
Ours merges WITHOUT re-tokenizing: member postings are decoded, doc ordinals
remapped through the merged identity sort, entries re-sorted by
(term, new ord) and re-encoded through the same block writer as a fresh
build.  The merged generation gets its own fingerprint and manifest; sources
stay untouched (immutable generations).

Shape: one Ray task per merge group (``map_batches`` over group specs) —
embarrassingly parallel, like the build.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..corpus import CorpusSpec
from ..functions.codec import vbyte_decode
from .segment_build import (SegmentBuilder, _delta_in_place, dict_partials_table,
                            term_boundaries, term_ranks, write_segment_files)


def _undelta_with_resets(deltas: np.ndarray, reset_starts: np.ndarray) -> np.ndarray:
    """Inverse of ``_delta_in_place``: cumulative sums restarting at each
    ``reset_starts`` index — fully vectorized (one cumsum + one repeat)."""
    cs = np.cumsum(deltas)
    base = cs[reset_starts] - deltas[reset_starts]
    lens = np.diff(np.append(reset_starts, len(deltas)))
    return cs - np.repeat(base, lens)


def _decode_member_postings(postings_path: str) -> tuple:
    """→ flat (terms[pa.Array per entry], old_ord, tf, pos_raw[uint8],
    entry_byte_off[int64], have_pos).

    ords/tfs are VByte-decoded in ONE vectorized pass each.  The POSITION
    stream is NOT decoded: its per-entry delta encoding restarts at every
    entry (positions are doc-relative — remapping ordinals never changes
    them), so merge only needs each entry's BYTE RANGE, found by scanning the
    VByte terminator bits — one cheap pass over bytes instead of
    decode → un-delta → gather → re-delta → re-encode over int64s."""
    t = pq.read_table(postings_path)
    t = t.sort_by([("term", "ascending"), ("block", "ascending")]).combine_chunks()
    n_col = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total_entries = int(n_col.sum())
    if total_entries == 0:
        return (pa.array([], type=pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int32), np.empty(0, np.uint8),
                np.zeros(1, np.int64), True)
    block_entry_starts = np.concatenate(([0], np.cumsum(n_col)[:-1]))

    def concat_bin(col_name: str) -> np.ndarray:
        col = t[col_name]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        bufs = arr.buffers()
        width = 8 if pa.types.is_large_binary(arr.type) else 4
        odt = np.int64 if width == 8 else np.int32
        offs = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * width)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        return data[offs[0] : offs[-1]]

    # ords: per-block delta with absolute first value → decode all, reset cumsum per block
    ord_deltas = vbyte_decode(concat_bin("ords").tobytes()).astype(np.int32)
    old_ord = _undelta_with_resets(ord_deltas, block_entry_starts)
    tf = vbyte_decode(concat_bin("tfs").tobytes()).astype(np.int32)
    # entry terms: repeat each block's term over its n entries (Arrow take)
    idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_col)
    entry_terms = t["term"].take(pa.array(idx))
    # positions: terminator-bit scan → per-entry byte offsets, no decode
    pos_raw = np.ascontiguousarray(concat_bin("pos"))
    if len(pos_raw):
        ends = np.flatnonzero(pos_raw & 0x80)  # last byte index of each value
        tok_off = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))
        have_pos = len(ends) == int(tok_off[-1])
        if have_pos:
            entry_byte_off = np.empty(total_entries + 1, dtype=np.int64)
            entry_byte_off[0] = 0
            entry_byte_off[1:] = ends[tok_off[1:] - 1] + 1
        else:
            entry_byte_off = np.zeros(1, np.int64)
    else:
        have_pos = False
        entry_byte_off = np.zeros(1, np.int64)
    return entry_terms, old_ord, tf, pos_raw, entry_byte_off, have_pos


def merge_segment_group(
    src_dirs: dict[int, str],
    index_dir_out: str,
    member_seg_ids: list[int],
    new_seg_id: int,
    spec: CorpusSpec,
    build_fp: str,
    store_positions: bool = True,
) -> pa.Table:
    """Merge member segments into one; returns (term, df, cf) partials.

    ``src_dirs`` is the {seg_id: dir} mapping of the generation the
    compaction driver PLANNED against — resolved once by the driver and
    shipped into every task.  Re-resolving the committed manifest here would
    race a concurrent refresh commit: tasks would silently read a different
    generation than the one the plan (group membership, fingerprints) came
    from, mixing generations in the merged output."""
    import os
    import time as _time

    _t0 = _time.monotonic()

    docs_tables = []
    member_offsets = [0]
    for s in member_seg_ids:
        d = pq.read_table(os.path.join(src_dirs[s], "docs.parquet"))
        docs_tables.append(d)
        member_offsets.append(member_offsets[-1] + d.num_rows)
    concat = pa.concat_tables(docs_tables).combine_chunks()
    n_docs = concat.num_rows
    perm = pc.sort_indices(
        concat, sort_keys=[(c, "ascending") for c in spec.id_cols]
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    inv = np.empty(n_docs, dtype=np.int32)  # ords < 2^31 per segment
    inv[perm] = np.arange(n_docs, dtype=np.int32)
    merged_docs = concat.take(pa.array(perm))
    merged_docs = merged_docs.set_column(
        merged_docs.schema.get_field_index("ord"), "ord",
        pa.array(np.arange(n_docs, dtype=np.int32)),
    )
    dl = merged_docs["dl"].to_numpy(zero_copy_only=False).astype(np.int32)

    # flat entries across members with remapped ordinals
    term_arrays: list[pa.Array] = []
    ord_parts, tf_parts = [], []
    pos_blob_parts, pos_off_parts = [], []
    have_pos_all = store_positions
    blob_base = 0
    for mi, s in enumerate(member_seg_ids):
        terms_m, old_ord, tf_m, pos_raw, entry_boff, have_pos = _decode_member_postings(
            os.path.join(src_dirs[s], "postings.parquet")
        )
        if isinstance(terms_m, pa.ChunkedArray):
            terms_m = terms_m.combine_chunks()
        term_arrays.append(terms_m)
        ord_parts.append(inv[member_offsets[mi] + old_ord])
        tf_parts.append(tf_m)
        have_pos_all &= have_pos
        if have_pos:
            pos_blob_parts.append(pos_raw)
            pos_off_parts.append(entry_boff[:-1] + blob_base)
            blob_base += len(pos_raw)

    e_ord_flat = np.concatenate(ord_parts) if ord_parts else np.empty(0, np.int32)
    tf_flat = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int32)
    pos_all: tuple | None = None
    if have_pos_all and pos_blob_parts:
        pos_all = (np.concatenate(pos_blob_parts), np.concatenate(pos_off_parts))

    terms_pa = pa.concat_arrays([a.cast(pa.string()) for a in term_arrays]) if term_arrays else pa.array([], type=pa.string())
    sorted_terms, term_rank = term_ranks(terms_pa, rank_dtype=np.int64)

    # one composite-key argsort (term_rank << 32 | new_ord) instead of a
    # two-key lexsort — ~2× less key bandwidth over the entry space
    composite = (term_rank.astype(np.uint64) << np.uint64(32)) | e_ord_flat.astype(
        np.uint32).astype(np.uint64)
    entry_perm = np.argsort(composite, kind="stable")
    t_s = term_rank[entry_perm]
    e_ord = e_ord_flat[entry_perm].astype(np.uint32)
    tf = tf_flat[entry_perm]

    # reorder the position stream to the new entry order at the BYTE level:
    # per-entry delta encoding restarts at each entry and positions are
    # doc-relative, so each entry's encoded bytes move verbatim — one uint8
    # gather instead of decode/re-delta/re-encode over int64s
    pos_entry_bytes: tuple[np.ndarray, np.ndarray] | None = None
    tok_offsets = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))
    if pos_all is not None and len(entry_perm) == 0:
        # all members empty (docs tokenize to nothing): zero entries, and the
        # gather below would np.repeat a length-1 base against empty lens
        pos_entry_bytes = (pos_all[0][:0], np.zeros(1, dtype=np.int64))
    elif pos_all is not None:
        blob, entry_start = pos_all
        entry_len = np.empty(len(entry_start), dtype=np.int64)
        if len(entry_start):
            entry_len[:-1] = entry_start[1:] - entry_start[:-1]
            entry_len[-1] = len(blob) - entry_start[-1]
        # (member-seam diffs are correct: each member's last entry ends
        # exactly at its blob end, which is the next member's globalized
        # first offset)
        starts_p = entry_start[entry_perm]
        lens_p = entry_len[entry_perm]
        base = np.repeat(starts_p, lens_p)
        within = np.arange(int(lens_p.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens_p)[:-1])), lens_p
        )
        new_blob = blob[base + within]
        new_off = np.empty(len(lens_p) + 1, dtype=np.int64)
        new_off[0] = 0
        np.cumsum(lens_p, out=new_off[1:])
        pos_entry_bytes = (new_blob, new_off)

    term_starts, df, present_term_ids = term_boundaries(t_s)

    builder = SegmentBuilder(index_dir_out, spec, None, build_fp,
                             store_positions=pos_entry_bytes is not None)
    postings = builder._build_postings_table(
        sorted_terms, present_term_ids, term_starts, df, e_ord, tf, dl, None, tok_offsets,
        pos_entry_bytes=pos_entry_bytes,
    )
    write_segment_files(
        index_dir_out, new_seg_id, merged_docs, postings, build_fp,
        id0_col=spec.id_cols[0],
        extra={"n_terms": int(len(term_starts)), "n_posting_entries": int(len(e_ord)),
               "merged_from": list(member_seg_ids),
               "build_ms": int((_time.monotonic() - _t0) * 1000)},
    )
    return dict_partials_table(sorted_terms, present_term_ids, term_starts, df, tf)
