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
from .segment_build import SegmentBuilder, _delta_in_place, write_segment_files


def _undelta_with_resets(deltas: np.ndarray, reset_starts: np.ndarray) -> np.ndarray:
    """Inverse of ``_delta_in_place``: cumulative sums restarting at each
    ``reset_starts`` index — fully vectorized (one cumsum + one repeat)."""
    cs = np.cumsum(deltas)
    base = cs[reset_starts] - deltas[reset_starts]
    lens = np.diff(np.append(reset_starts, len(deltas)))
    return cs - np.repeat(base, lens)


def _decode_member_postings(postings_path: str) -> tuple:
    """→ flat (terms[pa.Array per entry], old_ord, tf, pos_flat, have_pos).

    Vectorized across ALL blocks of the file: each VByte column is
    concatenated and decoded in ONE pass, then un-delta'd with resets at the
    block/entry boundaries — no per-block Python loop."""
    t = pq.read_table(postings_path)
    t = t.sort_by([("term", "ascending"), ("block", "ascending")]).combine_chunks()
    n_col = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    total_entries = int(n_col.sum())
    if total_entries == 0:
        return (pa.array([], type=pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int32), np.empty(0, np.int64), True)
    block_entry_starts = np.concatenate(([0], np.cumsum(n_col)[:-1]))

    def concat_bin(col_name: str) -> bytes:
        col = t[col_name]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        bufs = arr.buffers()
        width = 8 if pa.types.is_large_binary(arr.type) else 4
        odt = np.int64 if width == 8 else np.int32
        offs = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * width)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        return data[offs[0] : offs[-1]].tobytes()

    # ords: per-block delta with absolute first value → decode all, reset cumsum per block
    ord_deltas = vbyte_decode(concat_bin("ords")).astype(np.int64)
    old_ord = _undelta_with_resets(ord_deltas, block_entry_starts)
    tf = vbyte_decode(concat_bin("tfs")).astype(np.int32)
    # entry terms: repeat each block's term over its n entries (Arrow take)
    idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_col)
    entry_terms = t["term"].take(pa.array(idx))
    # positions: delta-per-entry stream; resets at every entry's first token
    pos_bytes = concat_bin("pos")
    if pos_bytes:
        pos_deltas = vbyte_decode(pos_bytes).astype(np.int64)
        entry_tok_starts = np.concatenate(([0], np.cumsum(tf.astype(np.int64))[:-1]))
        pos_flat = _undelta_with_resets(pos_deltas, entry_tok_starts)
        have_pos = len(pos_deltas) == int(tf.sum())
    else:
        pos_flat = np.empty(0, np.int64)
        have_pos = False
    return entry_terms, old_ord, tf, pos_flat, have_pos


def merge_segment_group(
    index_dir_in: str,
    index_dir_out: str,
    member_seg_ids: list[int],
    new_seg_id: int,
    spec: CorpusSpec,
    build_fp: str,
    store_positions: bool = True,
) -> pa.Table:
    """Merge member segments into one; returns (term, df, cf) partials."""
    import os

    from ..state.manifest import seg_dir

    docs_tables = []
    member_offsets = [0]
    for s in member_seg_ids:
        d = pq.read_table(os.path.join(seg_dir(index_dir_in, s), "docs.parquet"))
        docs_tables.append(d)
        member_offsets.append(member_offsets[-1] + d.num_rows)
    concat = pa.concat_tables(docs_tables).combine_chunks()
    n_docs = concat.num_rows
    perm = pc.sort_indices(
        concat, sort_keys=[(c, "ascending") for c in spec.id_cols]
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    inv = np.empty(n_docs, dtype=np.int64)
    inv[perm] = np.arange(n_docs)
    merged_docs = concat.take(pa.array(perm))
    merged_docs = merged_docs.set_column(
        merged_docs.schema.get_field_index("ord"), "ord",
        pa.array(np.arange(n_docs, dtype=np.int32)),
    )
    dl = merged_docs["dl"].to_numpy(zero_copy_only=False).astype(np.int32)

    # flat entries across members with remapped ordinals
    term_arrays: list[pa.Array] = []
    ord_parts, tf_parts, pos_parts = [], [], []
    have_pos_all = store_positions
    for mi, s in enumerate(member_seg_ids):
        terms_m, old_ord, tf_m, pos_flat, have_pos = _decode_member_postings(
            os.path.join(seg_dir(index_dir_in, s), "postings.parquet")
        )
        if isinstance(terms_m, pa.ChunkedArray):
            terms_m = terms_m.combine_chunks()
        term_arrays.append(terms_m)
        ord_parts.append(inv[member_offsets[mi] + old_ord])
        tf_parts.append(tf_m)
        have_pos_all &= have_pos
        if have_pos:
            pos_parts.append(pos_flat)

    e_ord_flat = np.concatenate(ord_parts) if ord_parts else np.empty(0, np.int64)
    tf_flat = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int32)
    pos_all = np.concatenate(pos_parts) if (have_pos_all and pos_parts) else None

    terms_pa = pa.concat_arrays([a.cast(pa.string()) for a in term_arrays]) if term_arrays else pa.array([], type=pa.string())
    enc = terms_pa.dictionary_encode()
    dict_arr = enc.dictionary
    sort_ord = pc.sort_indices(dict_arr).to_numpy(zero_copy_only=False)
    rank = np.empty(len(sort_ord), dtype=np.int64)
    rank[sort_ord] = np.arange(len(sort_ord))
    term_rank = rank[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    sorted_terms = dict_arr.take(pa.array(sort_ord))

    entry_perm = np.lexsort((e_ord_flat, term_rank))
    t_s = term_rank[entry_perm]
    e_ord = e_ord_flat[entry_perm].astype(np.uint32)
    tf = tf_flat[entry_perm]

    # reorder the variable-length position stream to the new entry order
    pos_delta = None
    tok_offsets = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))
    if pos_all is not None:
        old_tok_off = np.concatenate(([0], np.cumsum(tf_flat, dtype=np.int64)))
        starts = old_tok_off[entry_perm]
        lens = tf_flat[entry_perm].astype(np.int64)
        # gather indices: for each new entry, range(starts[i], starts[i]+lens[i])
        base = np.repeat(starts, lens)
        within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        pos_sorted = pos_all[base + within].astype(np.uint64)
        pos_delta = _delta_in_place(pos_sorted, tok_offsets[:-1])

    term_first = np.empty(len(t_s), dtype=bool)
    if len(t_s):
        term_first[0] = True
        np.not_equal(t_s[1:], t_s[:-1], out=term_first[1:])
        term_starts = np.flatnonzero(term_first)
        df = np.diff(np.append(term_starts, len(t_s))).astype(np.int64)
        present_term_ids = t_s[term_starts]
    else:
        term_starts = np.empty(0, dtype=np.int64)
        df = np.empty(0, dtype=np.int64)
        present_term_ids = np.empty(0, dtype=np.int64)

    builder = SegmentBuilder(index_dir_out, spec, None, build_fp, store_positions=pos_delta is not None)
    postings = builder._build_postings_table(
        sorted_terms, present_term_ids, term_starts, df, e_ord, tf, dl, pos_delta, tok_offsets
    )
    write_segment_files(
        index_dir_out, new_seg_id, merged_docs, postings, build_fp,
        id0_col=spec.id_cols[0],
        extra={"n_terms": int(len(term_starts)), "n_posting_entries": int(len(e_ord)),
               "merged_from": list(member_seg_ids)},
    )
    cf_per_term = (
        np.add.reduceat(tf.astype(np.int64), term_starts) if len(term_starts) else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "term": sorted_terms.take(pa.array(present_term_ids)),
            "df": pa.array(df, type=pa.int64()),
            "cf": pa.array(cf_per_term, type=pa.int64()),
        }
    )
