"""Segment builder — the per-partition inverted-index construction stage.

Runs inside ``ds.groupby("__seg").map_groups(...)`` (the build's single heavy
shuffle).  One group == one *segment* == one hash partition of the document
space.  Inside the group everything is local + vectorized numpy/Arrow:

  sort by identity → dense local ordinals → tokenize (Arrow kernels) →
  lexsort (term, ord, pos) → run-length postings → delta+VByte encode in
  blocks with per-block (max_tf, min_dl) max-score metadata → atomic write.

Hot-term skew (SURVEY.md §4): the reference leans on GIN posting trees; we
handle it by *document-partitioning* the term space — a stopword-like term's
postings are split across all S segments, so no single group ever exceeds the
segment's document budget.  The later ``groupby("term")`` that builds the
global dictionary only sees pre-aggregated (term, df, cf) partials — the
classic combiner pattern — so the term-keyed shuffle moves vocabulary-sized
data, not token-sized data.

Replaces: tsvector build (mv_books_dc.sql:183-194), GIN index build
(mv_books_dc.sql:461-467), per-field tsvector aggregation (:135-161).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..corpus import CorpusSpec
from ..functions.analyzer import Analyzer
from ..functions.codec import vbyte_encode_with_lengths
from ..state.manifest import SEG_MANIFEST, atomic_write_json, read_json, seg_dir

SEG_COL = "__seg"
DEFAULT_BLOCK_SIZE = 1024


def limit_worker_arrow_threads() -> None:
    """Call at the top of every CPU-heavy Ray task/actor method that uses
    Arrow kernels.  Arrow sizes its default thread pool to ALL cores in
    EVERY worker process, so N concurrent tasks spawn N×cores threads and
    collapse under context-switch thrash (measured: 8 parallel segment
    merges 28 s → 4.5 s wall once capped).  The parallelism axis is Ray
    tasks; inside a task, one thread is right."""
    import pyarrow as _pa

    if _pa.cpu_count() != 1:
        _pa.set_cpu_count(1)
        _pa.set_io_thread_count(1)


@dataclass
class SegmentBuildResult:
    seg_id: int
    n_docs: int
    sum_dl: int
    n_terms: int


def _delta_in_place(vals: np.ndarray, reset_at: np.ndarray) -> np.ndarray:
    """Delta-encode int array; positions in ``reset_at`` keep absolute values.
    uint32 throughout (positions/ordinals are segment-local < 2^31)."""
    v = vals.astype(np.uint32, copy=False)
    if len(v) > 1:
        d = np.empty_like(v)
        d[0] = v[0]
        np.subtract(v[1:], v[:-1], out=d[1:])
        d[reset_at] = v[reset_at]
        return d
    return v.copy()


def write_segment_files(
    index_dir: str,
    seg_id: int,
    docs: pa.Table,
    postings: pa.Table,
    build_fp: str,
    *,
    id0_col: str,
    extra: dict | None = None,
    seg_fp: str | None = None,
) -> None:
    """Atomic segment commit: write docs/postings to a tmp dir, stamp the
    lineage manifest, rename into a GENERATION-QUALIFIED directory (named by
    the segment fingerprint) — an older generation's directory for the same
    seg_id is never touched (shared by fresh builds and segment merges)."""
    out_dir = seg_dir(index_dir, seg_id, seg_fp or build_fp)
    n_docs = docs.num_rows
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(tmp_dir, "docs.parquet"))
    pq.write_table(postings, os.path.join(tmp_dir, "postings.parquet"), row_group_size=1024)
    meta = {
        "seg_id": seg_id,
        "fingerprint": build_fp,
        "status": "complete",
        "n_docs": int(n_docs),
        "sum_dl": int(pc.sum(docs["dl"]).as_py() or 0),
        # per-field dl totals (derived from any dl__<field> doc columns) —
        # folded into per-field avgdl at manifest-commit time
        "sum_dl_fields": {
            c[len("dl__"):]: int(pc.sum(docs[c]).as_py() or 0)
            for c in docs.column_names if c.startswith("dl__")
        },
        # id-range zone map over the primary identity column (docs are
        # identity-sorted): drives segment pruning for point/range lookups
        "id0_min": docs[id0_col][0].as_py() if n_docs else None,
        "id0_max": docs[id0_col][n_docs - 1].as_py() if n_docs else None,
        "files": ["docs.parquet", "postings.parquet"],
        "dir": os.path.basename(out_dir),
    }
    meta.update(extra or {})
    atomic_write_json(os.path.join(tmp_dir, SEG_MANIFEST), meta)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)


def term_ranks(terms_pa: pa.Array, rank_dtype=np.int32) -> tuple[pa.Array, np.ndarray]:
    """Dictionary-encode a term column into lexicographic ranks: returns
    (sorted unique terms ascending, per-row rank ids).  SHARED by the fresh
    build and the compaction merge — the two must produce byte-identical
    dictionary order for merged segments to score like fresh ones."""
    enc = terms_pa.dictionary_encode()
    dict_arr = enc.dictionary
    sort_ord = pc.sort_indices(dict_arr).to_numpy(zero_copy_only=False)
    rank = np.empty(len(sort_ord), dtype=rank_dtype)
    rank[sort_ord] = np.arange(len(sort_ord), dtype=rank_dtype)
    term_ids = rank[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    return dict_arr.take(pa.array(sort_ord)), term_ids


def term_boundaries(t_s: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(term_starts, df, present_term_ids) over entry-ordered term ranks —
    the per-term boundary scan shared by build and merge."""
    if not len(t_s):
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    term_first = np.empty(len(t_s), dtype=bool)
    term_first[0] = True
    np.not_equal(t_s[1:], t_s[:-1], out=term_first[1:])
    term_starts = np.flatnonzero(term_first)
    df = np.diff(np.append(term_starts, len(t_s))).astype(np.int64)
    return term_starts, df, t_s[term_starts]


def dict_partials_table(sorted_terms: pa.Array, present_term_ids: np.ndarray,
                        term_starts: np.ndarray, df: np.ndarray,
                        tf: np.ndarray) -> pa.Table:
    """Per-segment (term, df, cf) dictionary partials — the combiner input
    of the vocabulary-sized dictionary merge; shared by build and merge."""
    cf_per_term = (
        np.add.reduceat(tf.astype(np.int64), term_starts)
        if len(term_starts) else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "term": sorted_terms.take(pa.array(present_term_ids)),
            "df": pa.array(df, type=pa.int64()),
            "cf": pa.array(cf_per_term, type=pa.int64()),
        }
    )


class SegmentBuilder:
    """Callable for ``map_groups`` — builds one segment, returns (term, df, cf)."""

    def __init__(
        self,
        index_dir: str,
        spec: CorpusSpec,
        analyzer: Analyzer,
        build_fp: str,
        store_positions: bool = True,
        block_size: int = DEFAULT_BLOCK_SIZE,
    ):
        self.index_dir = index_dir
        self.spec = spec
        self.analyzer = analyzer
        self.build_fp = build_fp
        self.store_positions = store_positions
        self.block_size = block_size

    def __call__(self, group: pa.Table) -> pa.Table:
        # sort-shuffle output blocks arrive heavily chunked (one chunk per
        # upstream block); defragment once so take/slice/tokenize run on
        # contiguous arrays
        group = group.combine_chunks()
        seg_id = int(group[SEG_COL][0].as_py())
        cached = self.resume_partials(seg_id)
        if cached is not None:
            return cached
        return self.build_segment(seg_id, group)

    def resume_partials(self, seg_id: int, fp: str | None = None) -> pa.Table | None:
        """If this segment is already complete for this fingerprint (per-
        segment content fp when given, else the generation fp), recover its
        dictionary partials from the existing postings file."""
        want = fp or self.build_fp
        out_dir = seg_dir(self.index_dir, seg_id, want)
        existing = read_json(os.path.join(out_dir, SEG_MANIFEST))
        if existing and existing.get("fingerprint") == want and existing.get("status") == "complete":
            t = pq.read_table(os.path.join(out_dir, "postings.parquet"), columns=["term", "n", "cf_part"])
            agg = t.group_by("term").aggregate([("n", "sum"), ("cf_part", "sum")])
            return pa.table(
                {
                    "term": agg["term"],
                    "df": agg["n_sum"].cast(pa.int64()),
                    "cf": agg["cf_part_sum"].cast(pa.int64()),
                }
            )
        return None

    def build_segment(self, seg_id: int, group: pa.Table, fp: str | None = None) -> pa.Table:
        import time as _time

        _t0 = _time.monotonic()
        seg_fp = fp or self.build_fp
        out_dir = seg_dir(self.index_dir, seg_id, seg_fp)
        spec = self.spec
        sort_keys = [(c, "ascending") for c in spec.id_cols]
        order = pc.sort_indices(group, sort_keys=sort_keys)
        order_np = order.to_numpy(zero_copy_only=False)
        if np.array_equal(order_np, np.arange(len(order_np))):
            table = group  # already identity-sorted (common for clean input
            # layouts) — skip the full-table gather/copy
        else:
            table = group.take(order)
        n_docs = table.num_rows

        terms_pa, doc_idx, positions = self.analyzer.tokenize_column_arrow(table[spec.text_col])
        dl = np.bincount(doc_idx, minlength=n_docs).astype(np.int32) if len(doc_idx) else np.zeros(n_docs, np.int32)

        # per-field postings (C1 per-field tsvector analog): each extra text
        # column's tokens enter the SAME posting structure under prefixed
        # "<field>\x1f<term>" keys with their own positions and a field-local
        # dl column — field-scoped queries then score against field-local
        # tf/df/dl/avgdl
        dl_fields: dict[str, np.ndarray] = {}
        if spec.field_cols:
            from ..corpus import FIELD_SEP

            t_parts, d_parts, p_parts = [terms_pa], [doc_idx], [positions]
            for f in spec.field_cols:
                tf_, df_, pf_ = self.analyzer.tokenize_column_arrow(table[f])
                dl_fields[f] = (
                    np.bincount(df_, minlength=n_docs).astype(np.int32)
                    if len(df_) else np.zeros(n_docs, np.int32)
                )
                if len(tf_):
                    pref = pc.binary_join_element_wise(
                        pa.scalar(f + FIELD_SEP), tf_, pa.scalar(""))
                    t_parts.append(pref.combine_chunks() if isinstance(pref, pa.ChunkedArray) else pref)
                    d_parts.append(df_)
                    p_parts.append(pf_)
            terms_pa = pa.concat_arrays([a.cast(pa.string()) for a in t_parts])
            doc_idx = np.concatenate(d_parts)
            positions = np.concatenate(p_parts)

        # ---- postings: everything vectorized — Arrow dictionary-encode for
        # term ids, lexsort, run-length entries, single-pass VByte with
        # per-block byte slicing (no per-term Python loop).
        if len(terms_pa):
            sorted_terms, term_ids = term_ranks(terms_pa, rank_dtype=np.int32)

            sort_idx = np.lexsort((positions, doc_idx, term_ids))
            t_s = term_ids[sort_idx]
            d_s = doc_idx[sort_idx].astype(np.int32, copy=False)
            p_s = positions[sort_idx]
            # entry boundary where (term, doc) changes — two int32 passes, no
            # wide composite key
            entry_first = np.empty(len(t_s), dtype=bool)
            entry_first[0] = True
            np.not_equal(t_s[1:], t_s[:-1], out=entry_first[1:])
            entry_first[1:] |= d_s[1:] != d_s[:-1]
            entry_starts = np.flatnonzero(entry_first)
            tf = np.diff(np.append(entry_starts, len(t_s))).astype(np.int32)
            e_term = t_s[entry_starts]
            e_ord = d_s[entry_starts].astype(np.uint32)
            term_starts, df, present_term_ids = term_boundaries(e_term)
            pos_delta = _delta_in_place(p_s, entry_starts) if self.store_positions else None
            tok_offsets = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))
        else:
            sorted_terms = pa.array([], type=pa.string())
            df = np.empty(0, dtype=np.int64)
            term_starts = np.empty(0, dtype=np.int64)
            e_ord = np.empty(0, dtype=np.uint32)
            tf = np.empty(0, dtype=np.int32)
            pos_delta = None
            tok_offsets = np.zeros(1, dtype=np.int64)
            present_term_ids = np.empty(0, dtype=np.int64)

        postings = self._build_postings_table(
            sorted_terms, present_term_ids, term_starts, df, e_ord, tf, dl, pos_delta, tok_offsets
        )

        docs = pa.table(
            {
                "ord": pa.array(np.arange(n_docs, dtype=np.int32)),
                **{c: table[c] for c in spec.id_cols},
                "dl": pa.array(dl),
                **{f"dl__{f}": pa.array(v) for f, v in dl_fields.items()},
                **{c: table[c] for c in spec.meta_cols},
            }
        )

        write_segment_files(
            self.index_dir, seg_id, docs, postings, seg_fp,
            id0_col=spec.id_cols[0],
            extra={"n_terms": int(len(term_starts)), "n_posting_entries": int(len(e_ord)),
                   "build_ms": int((_time.monotonic() - _t0) * 1000)},
        )

        return dict_partials_table(sorted_terms, present_term_ids, term_starts, df, tf)

    def _build_postings_table(
        self,
        sorted_terms: pa.Array,
        present_term_ids: np.ndarray,
        term_starts: np.ndarray,
        df: np.ndarray,
        e_ord: np.ndarray,
        tf: np.ndarray,
        dl: np.ndarray,
        pos_delta: np.ndarray | None,
        tok_offsets: np.ndarray,
        pos_entry_bytes: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> pa.Table:
        """Slice posting entries into ≤block_size-doc blocks and VByte-encode
        each column in ONE pass, carving per-block byte ranges zero-copy."""
        bs = self.block_size
        n_entries = len(e_ord)
        if n_entries == 0:
            empty_bin = pa.array([], type=pa.large_binary())
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "block": pa.array([], type=pa.int32()),
                    "n": pa.array([], type=pa.int32()),
                    "cf_part": pa.array([], type=pa.int64()),
                    "max_tf": pa.array([], type=pa.int32()),
                    "min_dl": pa.array([], type=pa.int32()),
                    "ords": empty_bin,
                    "tfs": empty_bin,
                    "pos": empty_bin,
                }
            )
        nterms = len(term_starts)
        nb = -(-df // bs)  # blocks per term
        total_blocks = int(nb.sum())
        first_block_of_term = np.concatenate(([0], np.cumsum(nb)[:-1]))
        block_term = np.repeat(np.arange(nterms, dtype=np.int64), nb)
        block_in_term = np.arange(total_blocks, dtype=np.int64) - first_block_of_term[block_term]
        block_start = term_starts[block_term] + block_in_term * bs
        term_end = term_starts[block_term] + df[block_term]
        block_end = np.minimum(block_start + bs, term_end)
        block_n = (block_end - block_start).astype(np.int32)

        # ords: delta with reset at each block start, one encode pass (uint32)
        d_ord = np.empty_like(e_ord)
        d_ord[0] = e_ord[0]
        np.subtract(e_ord[1:], e_ord[:-1], out=d_ord[1:])
        d_ord[block_start] = e_ord[block_start]
        ord_bytes, ord_lens = vbyte_encode_with_lengths(d_ord)
        ord_off = np.concatenate(([0], np.cumsum(ord_lens)))

        tf_u = tf.view(np.uint32)  # tf ≥ 1 always — zero-copy reinterpret
        tf_bytes, tf_lens = vbyte_encode_with_lengths(tf_u)
        tf_off = np.concatenate(([0], np.cumsum(tf_lens)))

        def bin_col(big: bytes, value_off: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Array:
            offs = np.empty(total_blocks + 1, dtype=np.int64)
            offs[:-1] = value_off[starts]
            offs[-1] = value_off[ends[-1]]
            # blocks tile the entry space contiguously, so consecutive byte
            # ranges line up: offs is monotone and ends[i] == starts[i+1]
            return pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), total_blocks,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(big)],
            )

        ords_col = bin_col(ord_bytes, ord_off, block_start, block_end)
        tfs_col = bin_col(tf_bytes, tf_off, block_start, block_end)
        if self.store_positions and pos_entry_bytes is not None:
            # merge path: already-encoded per-entry position bytes — slice
            # per-block byte ranges straight off the entry byte offsets
            blob, entry_boff = pos_entry_bytes
            pos_col = bin_col(blob, entry_boff, block_start, block_end)  # py_buffer is zero-copy on ndarray
        elif self.store_positions and pos_delta is not None:
            pos_bytes, pos_lens = vbyte_encode_with_lengths(pos_delta)
            pos_off = np.concatenate(([0], np.cumsum(pos_lens)))
            tok_starts = tok_offsets[block_start]
            tok_ends = tok_offsets[block_end]
            pos_col = bin_col(pos_bytes, pos_off, tok_starts, tok_ends)
        else:
            pos_col = pa.array([b""] * total_blocks, type=pa.large_binary())

        cf_part = np.add.reduceat(tf.astype(np.int64), block_start)
        max_tf = np.maximum.reduceat(tf, block_start)
        min_dl = np.minimum.reduceat(dl[e_ord.astype(np.int64)], block_start)
        term_col = sorted_terms.take(pa.array(present_term_ids[block_term]))

        return pa.table(
            {
                "term": term_col,
                "block": pa.array(block_in_term.astype(np.int32)),
                "n": pa.array(block_n),
                "cf_part": pa.array(cf_part),
                "max_tf": pa.array(max_tf.astype(np.int32)),
                "min_dl": pa.array(min_dl.astype(np.int32)),
                "ords": ords_col,
                "tfs": tfs_col,
                "pos": pos_col,
            }
        )
