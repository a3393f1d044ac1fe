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
from ..functions.codec import vbyte_encode
from ..state.manifest import SEG_MANIFEST, atomic_write_json, read_json, seg_dir

SEG_COL = "__seg"
DEFAULT_BLOCK_SIZE = 1024


@dataclass
class SegmentBuildResult:
    seg_id: int
    n_docs: int
    sum_dl: int
    n_terms: int


def _delta_in_place(vals: np.ndarray, reset_at: np.ndarray) -> np.ndarray:
    """Delta-encode int array; positions in ``reset_at`` keep absolute values."""
    v = vals.astype(np.uint64, copy=True)
    if len(v) > 1:
        d = v.copy()
        d[1:] = v[1:] - v[:-1]
        d[reset_at] = v[reset_at]
        return d
    return v


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
        seg_id = int(group[SEG_COL][0].as_py())
        out_dir = seg_dir(self.index_dir, seg_id)
        existing = read_json(os.path.join(out_dir, SEG_MANIFEST))
        if existing and existing.get("fingerprint") == self.build_fp and existing.get("status") == "complete":
            # resume: segment already built for this exact input+config —
            # recover the dictionary partials from the existing postings file.
            t = pq.read_table(os.path.join(out_dir, "postings.parquet"), columns=["term", "n", "cf_part"])
            agg = t.group_by("term").aggregate([("n", "sum"), ("cf_part", "sum")])
            return pa.table(
                {
                    "term": agg["term"],
                    "df": agg["n_sum"].cast(pa.int64()),
                    "cf": agg["cf_part_sum"].cast(pa.int64()),
                }
            )

        spec = self.spec
        sort_keys = [(c, "ascending") for c in spec.id_cols]
        order = pc.sort_indices(group, sort_keys=sort_keys)
        table = group.take(order)
        n_docs = table.num_rows

        terms, doc_idx, positions = self.analyzer.tokenize_column(table[spec.text_col])
        dl = np.bincount(doc_idx, minlength=n_docs).astype(np.int32) if len(doc_idx) else np.zeros(n_docs, np.int32)

        # ---- postings: group tokens by (term, ord), count tf, keep positions
        if len(terms):
            uniq_terms, term_ids = np.unique(terms, return_inverse=True)
            sort_idx = np.lexsort((positions, doc_idx, term_ids))
            t_s = term_ids[sort_idx]
            d_s = doc_idx[sort_idx]
            p_s = positions[sort_idx].astype(np.uint64)
            entry_key = t_s.astype(np.int64) * np.int64(n_docs) + d_s
            entry_first = np.empty(len(entry_key), dtype=bool)
            entry_first[0] = True
            np.not_equal(entry_key[1:], entry_key[:-1], out=entry_first[1:])
            entry_starts = np.flatnonzero(entry_first)
            tf = np.diff(np.append(entry_starts, len(entry_key))).astype(np.int32)
            e_term = t_s[entry_starts]
            e_ord = d_s[entry_starts].astype(np.uint64)
            # per-term entry ranges (entries are term-sorted)
            term_first = np.empty(len(e_term), dtype=bool)
            term_first[0] = True
            np.not_equal(e_term[1:], e_term[:-1], out=term_first[1:])
            term_starts = np.flatnonzero(term_first)
            df = np.diff(np.append(term_starts, len(e_term))).astype(np.int64)
            present_terms = uniq_terms[e_term[term_starts]]
            # positions delta-encoded per (term, doc) run
            pos_delta = _delta_in_place(p_s, entry_starts) if self.store_positions else None
            tok_offsets = np.concatenate(([0], np.cumsum(tf).astype(np.int64)))
        else:
            present_terms = np.empty(0, dtype=object)
            df = np.empty(0, dtype=np.int64)
            term_starts = np.empty(0, dtype=np.int64)
            e_ord = np.empty(0, dtype=np.uint64)
            tf = np.empty(0, dtype=np.int32)
            pos_delta = None
            tok_offsets = np.zeros(1, dtype=np.int64)

        rows_term: list[str] = []
        rows_block: list[int] = []
        rows_n: list[int] = []
        rows_cf: list[int] = []
        rows_maxtf: list[int] = []
        rows_mindl: list[int] = []
        rows_ords: list[bytes] = []
        rows_tfs: list[bytes] = []
        rows_pos: list[bytes] = []
        bs = self.block_size
        for ti in range(len(term_starts)):
            s = int(term_starts[ti])
            e = s + int(df[ti])
            term = str(present_terms[ti])
            for b, bstart in enumerate(range(s, e, bs)):
                bend = min(bstart + bs, e)
                ords_blk = e_ord[bstart:bend]
                tfs_blk = tf[bstart:bend]
                d = ords_blk.copy()
                if len(d) > 1:
                    d[1:] = ords_blk[1:] - ords_blk[:-1]
                rows_term.append(term)
                rows_block.append(b)
                rows_n.append(len(d))
                rows_cf.append(int(tfs_blk.sum()))
                rows_maxtf.append(int(tfs_blk.max()))
                rows_mindl.append(int(dl[ords_blk.astype(np.int64)].min()))
                rows_ords.append(vbyte_encode(d))
                rows_tfs.append(vbyte_encode(tfs_blk.astype(np.uint64)))
                if self.store_positions:
                    rows_pos.append(
                        vbyte_encode(pos_delta[tok_offsets[bstart] : tok_offsets[bend]])
                    )
                else:
                    rows_pos.append(b"")

        postings = pa.table(
            {
                "term": pa.array(rows_term, type=pa.string()),
                "block": pa.array(rows_block, type=pa.int32()),
                "n": pa.array(rows_n, type=pa.int32()),
                "cf_part": pa.array(rows_cf, type=pa.int64()),
                "max_tf": pa.array(rows_maxtf, type=pa.int32()),
                "min_dl": pa.array(rows_mindl, type=pa.int32()),
                "ords": pa.array(rows_ords, type=pa.binary()),
                "tfs": pa.array(rows_tfs, type=pa.binary()),
                "pos": pa.array(rows_pos, type=pa.binary()),
            }
        )

        docs = pa.table(
            {
                "ord": pa.array(np.arange(n_docs, dtype=np.int32)),
                **{c: table[c] for c in spec.id_cols},
                "dl": pa.array(dl),
                **{c: table[c] for c in spec.meta_cols},
            }
        )

        # ---- atomic write: tmp dir → rename over target
        tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(docs, os.path.join(tmp_dir, "docs.parquet"))
        pq.write_table(postings, os.path.join(tmp_dir, "postings.parquet"), row_group_size=4096)
        atomic_write_json(
            os.path.join(tmp_dir, SEG_MANIFEST),
            {
                "seg_id": seg_id,
                "fingerprint": self.build_fp,
                "status": "complete",
                "n_docs": int(n_docs),
                "sum_dl": int(dl.sum()),
                "n_terms": int(len(present_terms)),
                "files": ["docs.parquet", "postings.parquet"],
            },
        )
        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(tmp_dir, out_dir)

        cf_per_term = (
            np.add.reduceat(tf.astype(np.int64), term_starts) if len(term_starts) else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "term": pa.array(present_terms.tolist(), type=pa.string()),
                "df": pa.array(df, type=pa.int64()),
                "cf": pa.array(cf_per_term, type=pa.int64()),
            }
        )
