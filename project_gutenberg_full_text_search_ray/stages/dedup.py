"""Deduplication operators over a document Dataset — first-class components
for a 100 TB training-data pipeline.

All operators follow the same Ray-Data shape:

  1. a vectorized / actor-pool ``map_batches`` stage computes per-doc keys or
     signatures (cheap, embarrassingly parallel);
  2. ONE ``groupby`` shuffle co-locates candidate groups — and the exchange
     carries ONLY (id, key/signature) columns, never document text: at 10^12
     docs the all-to-all moves ~tens of bytes per doc;
  3. verification (exact equality / Jaccard / Hamming / cosine) re-fetches
     the candidate documents from the doc store (a pruned, filtered parquet
     read — candidates are a tiny fraction of the corpus) and computes the
     true metric — pairwise work only within bounded candidate buckets,
     never all-pairs across the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer
from ..functions.arrowutil import table_refs
from ..functions.textstats import (
    hamming64,
    minhash_params,
    minhash_signature,
    simhash64,
)


# ------------------------------------------------------------ doc-store fetch
class DocFetcher:
    """Targeted fetch of candidate rows by id — the 'doc store' side of the
    dedup split (signatures shuffle; text is re-read only for candidates).

    ``source`` is a parquet file/dir path (filtered, column-pruned read with
    row-group pushdown) or a ``ray.ObjectRef`` / ``pa.Table`` holding a small
    corpus (tests, already-broadcast dims)."""

    def __init__(self, source, id_col: str, columns: list[str]):
        self.source = source
        self.id_col = id_col
        self.columns = columns

    def fetch(self, ids: list) -> dict:
        """Return {id: (col values...)} for the requested ids (single column →
        bare value)."""
        import pyarrow.parquet as pq

        if isinstance(self.source, (str, list)):
            t = pq.read_table(
                self.source, columns=[self.id_col, *self.columns],
                filters=[(self.id_col, "in", list(ids))],
            )
        else:
            t = self.source
            if isinstance(t, ray.ObjectRef):
                t = ray.get(t)
            t = t.select([self.id_col, *self.columns]).filter(
                pc.is_in(t[self.id_col], pa.array(list(ids)))
            )
        out = {}
        cols = [t[c].to_pylist() for c in self.columns]
        for i, did in enumerate(t[self.id_col].to_pylist()):
            out[did] = cols[0][i] if len(cols) == 1 else tuple(c[i] for c in cols)
        return out


def _default_doc_source(ds: rd.Dataset, id_col: str, need_col: str,
                        max_rows: int = 200_000):
    """Doc-store default when the caller didn't pass one: the dataset's own
    parquet input files when it was read straight from parquet (targeted
    filtered fetches — nothing materializes), else a driver-broadcast copy
    CAPPED at ``max_rows`` (tests / small corpora).  A corpus-sized driver
    concat must never happen implicitly — above the cap this raises and the
    caller passes ``doc_source`` (the parquet path) explicitly.

    The file fallback is used ONLY when the dataset is an untransformed read
    (pure ``Dataset`` plan, or projection-only): verifying against the raw
    files after an upstream ``map_batches``/``filter`` would compute the true
    metric on DIFFERENT values than the signatures were built from — a
    silent wrong-pairs bug, not a performance issue.  Transformed datasets
    fall through to the row-capped broadcast (or the explicit-doc_source
    error)."""
    import pyarrow.parquet as pq

    def _untransformed(d: rd.Dataset) -> bool:
        # structural plan walk (validated on Ray 2.49.2): untransformed ⇔
        # every logical operator is a Read or a Project (select_columns /
        # column pruning — value-preserving).  A private-API change falls
        # back to the repr heuristic the r3 implementation used.
        try:
            ops, stack = [], [d._logical_plan.dag]
            while stack:
                op = stack.pop()
                ops.append(type(op).__name__)
                stack.extend(op.input_dependencies)
            return all(name in ("Read", "Project") for name in ops)
        except AttributeError:
            pass
        # repr fallback: operator lines precede the terminal "Dataset(...)"
        for line in repr(d).splitlines():
            s = line.strip().lstrip("+- ").strip()
            if s.startswith("Dataset("):
                return True
            if not s.split("(")[0] == "Project":
                return False
        return False

    files = [f for f in (ds.input_files() or []) if f.endswith(".parquet")]
    if files and _untransformed(ds):
        try:
            names = set(pq.read_schema(files[0]).names)
        except OSError:
            names = set()
        if id_col in names and need_col in names:
            return files
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"doc_source is required at this scale ({n} rows > {max_rows}): "
            f"refusing to materialize the corpus on the driver — pass the "
            f"parquet path(s) of the (id, {need_col}) store")
    # empty blocks bypass map UDFs and keep stale schemas/column order —
    # select per block and drop zero-row tables before the concat
    tabs = [t.select([id_col, need_col])
            for t in ray.get(table_refs(ds.select_columns([id_col, need_col])))
            if t.num_rows and id_col in t.column_names]
    if not tabs:
        raise ValueError("doc_source default: dataset produced no rows")
    return ray.put(pa.concat_tables(tabs))


def _pair_dedupe(pairs: rd.Dataset) -> rd.Dataset:
    """Distinct (id_a, id_b) rows — the same pair surfaces from several bands
    or buckets.  Implemented as a built-in grouped COUNT (vectorized
    sort-based aggregate): NEVER ``map_groups`` here — one Python call per
    pair group is minutes of pure interpreter overhead at 10⁶ candidates."""
    return pairs.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])


def _dedupe_pairs_min(pairs: rd.Dataset, metric_col: str) -> rd.Dataset:
    """Distinct VERIFIED pairs: grouped MIN over (id_a, id_b) — the metric is
    a function of the pair, so MIN just picks its value.  The shared tail of
    every verify-first near-dup operator (candidates flow into verification
    possibly duplicated; this restores the distinct-pair contract over the
    tiny verified output instead of a corpus-scale candidate exchange)."""
    from ray.data.aggregate import Min

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min(metric_col, alias_name=metric_col))


def _drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Materialize and strip 0-row blocks.  Ray Data bypasses map UDFs on
    empty blocks, leaving SCHEMA-LESS empties in the stream; a hash-join
    aggregator whose partition receives only those sees a table without the
    key column and dies with ArrowInvalid.  Every join input goes through
    here (refs stay in the object store — zero-copy block inspection only)."""
    mat = ds.materialize()
    keep, total = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            total += 1
            # metadata-only inspection: NEVER ray.get the block (that pulls
            # the whole dataset through the driver); unknown row counts are
            # kept (safe — an occupied block passing through is harmless)
            if meta.num_rows is None or meta.num_rows > 0:
                keep.append(ref)
    if len(keep) == total or not keep:
        # untouched, or fully empty (callers guard on .count() == 0)
        return mat
    return rd.from_arrow_refs(keep)


def _verify_num_cpus() -> int:
    """CPU declaration for the bandwidth-bound verify actors: 2 on real
    nodes (cores/2 concurrent verifiers — the compaction-merge lesson),
    but never more than the cluster offers, so a 1-CPU session schedules
    instead of hanging on an infeasible demand."""
    try:
        total = int(ray.cluster_resources().get("CPU", 2))
    except Exception:
        total = 2
    return 2 if total >= 2 else 1


def _pool_size(concurrency: int | None) -> int:
    """Default verify/signature actor-pool cap: half the cluster's CPUs,
    clamped to [4, 16] (pools are autoscaling ``(1, N)``, so small test
    sessions still start at one actor).  A fixed 8 left half of a 32-CPU
    node idle in the verify-bound near-dup pipelines; an explicit
    ``concurrency`` wins."""
    if concurrency is not None:
        return concurrency
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(16, cpus // 2))


def _join_args() -> dict:
    """Join sizing that cannot starve a small cluster: partitions scale with
    CPUs and aggregator actors take fractional CPUs so chained joins +
    groupbys never reserve every slot (a fixed 16×1-CPU aggregator pool
    deadlocks a 4-CPU test session)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return {
        "num_partitions": max(2, min(16, cpus // 2)),
        # fractional aggregator CPUs ONLY on small clusters (to keep chained
        # joins schedulable at num_cpus=4); on real cores a 0.25-CPU
        # aggregator pool throttles the shuffle to a quarter of the machine
        "aggregator_ray_remote_args": {"num_cpus": 0.25 if cpus <= 8 else 1},
    }


def _runs_pairs(ids_sorted: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                max_occupancy: int | None) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs within each run (ids sorted within runs) —
    fully vectorized repeat/arange construction, no per-run Python."""
    keep = lens >= 2
    if max_occupancy is not None:
        keep &= lens <= max_occupancy
    starts, lens = starts[keep], lens[keep]
    if not len(starts):
        return ids_sorted[:0], ids_sorted[:0]
    pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    gidx = np.repeat(starts, lens) + pos  # global row index of each run element
    cnt = np.repeat(lens, lens) - 1 - pos  # partners after each element
    total = int(cnt.sum())
    if total == 0:
        return ids_sorted[:0], ids_sorted[:0]
    a_idx = np.repeat(gidx, cnt)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
    b_idx = a_idx + off + 1
    return ids_sorted[a_idx], ids_sorted[b_idx]


def _candidate_pairs(
    keyed: rd.Dataset, id_col: str, key_col: str, max_occupancy: int | None,
    value_col: str | None = None, dedupe: bool = True,
) -> rd.Dataset:
    """Candidate pairs (id_a < id_b) among ids sharing a key.

    ``dedupe=True`` returns globally DISTINCT pairs (a grouped pass over the
    full pair set — one more all-to-all).  ``dedupe=False`` skips that
    exchange and returns locally-deduped pairs (exact within each sorted
    block; a pair surfacing under keys that land in different blocks may
    repeat).  Near-dup operators should verify FIRST and dedupe the verified
    output instead: the measured duplicate factor on candidate pairs is
    ~1.1× (a non-dup pair rarely shares two keys), so the global pre-verify
    dedupe costs a corpus-scale pair exchange to remove ~10% of cheap,
    cache-hit verify work — while the verified output is tiny and dedupes
    for free.

    SORT-based (one range-partitioning exchange, then everything stays
    vectorized inside blocks): ``sort(key)`` → per-block run-length pair
    generation (repeat/arange construction — no per-group Python, no
    self-join materialization) → the block-EDGE keys, whose runs may span
    blocks, are re-emitted as (key, id) rows and pair-generated in a tiny
    fixup (edge keys ≈ 2×blocks×occupancy rows) → grouped dedupe.

    ``value_col`` optionally rides along (e.g. a SimHash signature): pairs
    come back with ``val_a``/``val_b`` gathered through the same indices.

    Buckets above ``max_occupancy`` are skipped: a hot key (stopword
    shingle, degenerate band) would otherwise cost O(occupancy²); real
    near-dup pairs co-occur in their rare buckets too."""
    id_type = keyed.schema().base_schema.field(id_col).type
    key_type = keyed.schema().base_schema.field(key_col).type
    val_type = keyed.schema().base_schema.field(value_col).type if value_col else None
    srt = keyed.sort(key_col)

    def dedup_sorted(sh, ids, vals):
        """lexsort by (key, id), drop duplicate (key, id) rows."""
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        vals = vals[order] if vals is not None else None
        if len(sh) > 1:
            keep = np.empty(len(sh), dtype=bool)
            keep[0] = True
            keep[1:] = (sh[1:] != sh[:-1]) | (ids[1:] != ids[:-1])
            sh, ids = sh[keep], ids[keep]
            vals = vals[keep] if vals is not None else None
        return sh, ids, vals

    def run_pair_idx(sh):
        """(a_idx, b_idx) of all within-run pairs over rows sorted by key."""
        run_first = np.empty(len(sh), dtype=bool)
        run_first[0] = True
        np.not_equal(sh[1:], sh[:-1], out=run_first[1:])
        starts = np.flatnonzero(run_first)
        lens = np.diff(np.append(starts, len(sh)))
        return _runs_pairs(np.arange(len(sh), dtype=np.int64), starts, lens,
                           max_occupancy)

    def pair_cols(ids, vals, a_idx, b_idx, n_extra_edge=0, edge_ids=None,
                  edge_sh=None, edge_vals=None):
        n_pair = len(a_idx)
        cols = {
            "id_a": pa.concat_arrays([
                pa.array(ids[a_idx], type=id_type),
                pa.array(edge_ids if edge_ids is not None else ids[:0], type=id_type)]),
            "id_b": pa.concat_arrays([
                pa.array(ids[b_idx], type=id_type),
                pa.nulls(n_extra_edge, type=id_type)]),
            "__bkey": pa.concat_arrays([
                pa.nulls(n_pair, type=key_type),
                pa.array(edge_sh if edge_sh is not None else np.empty(0, dtype=object)[:0],
                         type=key_type)]),
        }
        if value_col:
            cols["val_a"] = pa.concat_arrays([
                pa.array(vals[a_idx], type=val_type), pa.nulls(n_extra_edge, type=val_type)])
            cols["val_b"] = pa.concat_arrays([
                pa.array(vals[b_idx], type=val_type), pa.nulls(n_extra_edge, type=val_type)])
            cols["__bval"] = pa.concat_arrays([
                pa.nulls(n_pair, type=val_type),
                pa.array(edge_vals if edge_vals is not None else (vals[:0] if vals is not None else []),
                         type=val_type)])
        return pa.table(cols)

    def block_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            empty = np.empty(0, dtype=np.int64)
            return pair_cols(empty, empty if value_col else None, empty, empty)
        sh = b[key_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        vals = b[value_col].to_numpy(zero_copy_only=False) if value_col else None
        sh, ids, vals = dedup_sorted(sh, ids, vals)
        edge = (sh == sh[0]) | (sh == sh[-1])
        if max_occupancy is not None:
            # a key whose LOCAL count already exceeds the occupancy cap is
            # certain to be skipped globally (local ≤ global) — don't ship
            # its rows to the driver fixup.  Bounds the collected edge set
            # to 2 × blocks × max_occupancy even when one hot key spans
            # every block (the degenerate all-same-signature corpus).
            if int((sh == sh[0]).sum()) > max_occupancy:
                edge &= sh != sh[0]
            if int((sh == sh[-1]).sum()) > max_occupancy:
                edge &= sh != sh[-1]
        inner = ~edge
        if inner.any():
            a_idx, b_idx = run_pair_idx(sh[inner])
            in_ids = ids[inner]
            in_vals = vals[inner] if vals is not None else None
            if len(a_idx) > 1:
                # local pair dedupe (vectorized lexsort): the same pair
                # surfaces once per shared key; within a sorted block those
                # duplicates collapse here, so the optional global dedupe
                # only pays for cross-block repeats
                pa_, pb_ = in_ids[a_idx], in_ids[b_idx]
                order = np.lexsort((pb_, pa_))
                sa, sb = pa_[order], pb_[order]
                keep_p = np.empty(len(order), dtype=bool)
                keep_p[0] = True
                keep_p[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
                sel = order[keep_p]
                a_idx, b_idx = a_idx[sel], b_idx[sel]
        else:
            a_idx = b_idx = np.empty(0, dtype=np.int64)
            in_ids = ids[:0]
            in_vals = vals[:0] if vals is not None else None
        return pair_cols(in_ids, in_vals, a_idx, b_idx,
                         n_extra_edge=int(edge.sum()), edge_ids=ids[edge],
                         edge_sh=sh[edge],
                         edge_vals=vals[edge] if vals is not None else None)

    out = srt.map_batches(block_pairs, batch_format="pyarrow").materialize()
    keep_cols = ["id_a", "id_b"] + (["val_a", "val_b"] if value_col else [])
    pairs = out.map_batches(
        lambda b: b.filter(pc.is_valid(b["id_b"])), batch_format="pyarrow"
    ).select_columns(keep_cols)
    # edge-key fixup: runs that may span block boundaries.  The edge subset
    # is tiny (≤ 2 × blocks × occupancy rows) but the mapped output holds
    # EVERY inner pair — filter distributed FIRST, collect only edge rows
    # (collecting the raw refs would pull the full pair set through the
    # driver: tens of GB at 10⁹ candidate pairs)
    edge_only = out.map_batches(
        lambda b: (b.filter(pc.is_valid(b["__bkey"]))
                   if "__bkey" in b.column_names else b.slice(0, 0)),
        batch_format="pyarrow",
    )
    edge_tabs = [t for t in ray.get(table_refs(edge_only))
                 if t.num_rows and "__bkey" in t.column_names]
    edge_rows = pa.concat_tables(edge_tabs) if edge_tabs else None
    if edge_rows is not None and edge_rows.num_rows:
        sh = edge_rows["__bkey"].to_numpy(zero_copy_only=False)
        ids = edge_rows["id_a"].to_numpy(zero_copy_only=False)
        vals = edge_rows["__bval"].to_numpy(zero_copy_only=False) if value_col else None
        sh, ids, vals = dedup_sorted(sh, ids, vals)
        a_idx, b_idx = run_pair_idx(sh)
        if len(a_idx):
            fcols = {"id_a": pa.array(ids[a_idx], type=id_type),
                     "id_b": pa.array(ids[b_idx], type=id_type)}
            if value_col:
                fcols["val_a"] = pa.array(vals[a_idx], type=val_type)
                fcols["val_b"] = pa.array(vals[b_idx], type=val_type)
            pairs = pairs.union(rd.from_arrow(pa.table(fcols)))
    if not dedupe:
        return pairs
    if value_col:
        # values are functions of the id, so MIN just picks the value
        agg = pairs.groupby(["id_a", "id_b"]).min(["val_a", "val_b"])
        return agg.rename_columns({"min(val_a)": "val_a", "min(val_b)": "val_b"})
    return _pair_dedupe(pairs)


class VerifyJaccardStage:
    """Actor stage over candidate-pair batches: fetch both documents from the
    doc store, compute TRUE shingle-Jaccard, keep pairs ≥ threshold.  Used as
    an AUTOSCALING actor pool (``concurrency=(1, N)``) so the per-actor
    shingle cache persists across batches — a doc appearing in thousands
    of candidate pairs is fetched + tokenized once per actor, not once per
    batch.  The cache is size-capped (clear-on-overflow: candidate batches
    are key-clustered, so cheap eviction barely costs hit rate).

    Shingles are cached as SORTED uint64 hash arrays (the shared
    ``shingle_hashes`` rolling polynomial — the same kernel the candidate
    generator uses) and the whole batch's intersections are computed in ONE
    vectorized lexsort pass over the concatenated (pair, hash) stream — no
    per-pair Python loop, no Python string sets.  Hash-Jaccard equals
    string-shingle Jaccard except under a 64-bit in-pair hash collision
    (~|A∪B|²/2⁶⁴ ≈ 1e-15 per pair), far below the 1e-4 output quantization."""

    CACHE_CAP = 200_000

    def __init__(self, source, id_col: str, text_col: str, k_shingle: int,
                 threshold: float, analyzer: Analyzer = DEFAULT_ANALYZER):
        self.fetcher = DocFetcher(source, id_col, [text_col])
        self.k = k_shingle
        self.threshold = threshold
        self.analyzer = analyzer
        self.sh_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        missing = (set(a) | set(b)) - self.sh_cache.keys()
        if missing:
            if len(self.sh_cache) + len(missing) > self.CACHE_CAP:
                # clearing evicts ids this batch still needs — refetch ALL of
                # the batch's ids, not just the pre-clear miss set
                self.sh_cache.clear()
                missing = set(a) | set(b)
            texts = self.fetcher.fetch(missing)
            absent = missing - texts.keys()
            if absent:
                # a candidate id the doc store can't produce is a stale/partial
                # store, not an empty document — treating it as '' would pair
                # ALL such ids at Jaccard 1.0 and delete real distinct docs
                raise KeyError(
                    f"doc store is missing {len(absent)} candidate id(s), "
                    f"e.g. {sorted(absent)[:5]} — stale or partial doc_source?")
            # ONE vectorized shingle pass over the fetched texts (NULL text
            # tokenizes to nothing, a real stored value).  The per-doc scalar
            # tokenize+hash loop this replaces was the cache-fill hot spot —
            # shingle_hashes_column is bit-identical per row (shared kernel).
            from ..functions.textstats import shingle_hashes_column

            ids_list = list(missing)
            fp, rows = shingle_hashes_column(
                pa.array([texts[d] for d in ids_list], type=pa.string()),
                self.k, self.analyzer)
            starts = np.searchsorted(rows, np.arange(len(ids_list) + 1))
            for i, did in enumerate(ids_list):
                self.sh_cache[did] = fp[starts[i]:starts[i + 1]]
        sh = self.sh_cache
        n_all = len(a)
        # EXACT length prefilter: jc = isect/union ≤ min(|A|,|B|)/max(|A|,|B|)
        # in the reals, and correctly-rounded float division is monotone, so
        # fl(jc) ≥ t ⟹ fl(min/max) ≥ t — dropping pairs with fl(min/max) < t
        # never drops a pair the full kernel would keep.  Candidate pairs are
        # mostly length-mismatched junk (one shared shingle), so this removes
        # the bulk of the flat-stream sort below for free (lengths come from
        # the cache that's already filled).
        lA = np.fromiter((len(sh[x]) for x in a), dtype=np.int64, count=n_all)
        lB = np.fromiter((len(sh[y]) for y in b), dtype=np.int64, count=n_all)
        mx = np.maximum(lA, lB)
        # both-empty ⇒ union 0 ⇒ Jaccard 1.0 (matches the scalar jaccard())
        cand = np.flatnonzero(
            (mx == 0)
            | ((np.minimum(lA, lB) / np.maximum(mx, 1)) >= self.threshold))
        n_pairs = len(cand)
        a = [a[i] for i in cand]
        b = [b[i] for i in cand]
        # one flat (pair_idx, hash) stream over both sides; a hash seen twice
        # within a pair is in the intersection (per-doc arrays are distinct)
        arrs = [sh[x] for x in a]
        arrs += [sh[y] for y in b]
        lens = np.fromiter(map(len, arrs), dtype=np.int64, count=2 * n_pairs)
        pair_of = np.repeat(np.tile(np.arange(n_pairs, dtype=np.int64), 2), lens)
        flat = (np.concatenate(arrs) if len(arrs)
                else np.empty(0, dtype=np.uint64))
        isect = np.zeros(n_pairs, dtype=np.int64)
        if len(flat):
            # rank-pack (pair, hash) into ONE int64 key and value-sort it —
            # measured 2.2× faster than the two-key lexsort (which was 85% of
            # the kernel).  No overflow: n_pairs × n_ranks < 2⁶³ for any batch
            # that fits in memory (16k pairs × even 10⁸ distinct hashes ≈ 2⁵¹).
            u, rank = np.unique(flat, return_inverse=True)
            key = pair_of * np.int64(len(u)) + rank
            key.sort()
            dup = key[1:] == key[:-1]
            if dup.any():
                isect = np.bincount(key[1:][dup] // np.int64(len(u)),
                                    minlength=n_pairs)
        union = lens[:n_pairs] + lens[n_pairs:] - isect
        jc = np.where(union > 0, isect / np.maximum(union, 1), 1.0)
        keep = jc >= self.threshold
        idx = pa.array(cand[keep])
        return pa.table({
            "id_a": batch["id_a"].take(idx),
            "id_b": batch["id_b"].take(idx),
            "jacc_i4": pa.array(
                np.floor(jc[keep] * 10000 + 0.5).astype(np.int64),
                type=pa.int64()),
        })


# --------------------------------------------------------------- exact dedup
def _hash128(batch: pa.Table, key_col: str) -> pa.Table:
    """Two independent 64-bit hashes of the key (128 bits total: collisions
    at 10^12 docs are ~1e-14-probable, so the text itself never needs to move).
    NULL keys get their own flag column — their own group, never merged with ''."""
    from ..functions.nputil import hash128

    s = batch[key_col].to_pandas().astype("string")
    isnull = s.isna().to_numpy()
    vals = s.fillna("").to_numpy(dtype=object)
    h1, h2 = hash128(vals)
    return (
        batch.append_column("__h1", pa.array(h1, type=pa.int64()))
        .append_column("__h2", pa.array(h2, type=pa.int64()))
        .append_column("__isnull", pa.array(isnull.astype(np.int8), type=pa.int8()))
    )


def exact_dedup_keyed(ds: rd.Dataset, id_col: str, key_col: str) -> rd.Dataset:
    """The pre-shuffle stage of exact_dedup, exposed for tests: rows carry
    ONLY (hash128, null-flag, id) into the exchange — never ``key_col``."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return _hash128(batch, key_col)

    return ds.map_batches(add_hash, batch_format="pyarrow").select_columns(
        ["__h1", "__h2", "__isnull", id_col]
    )


def exact_dedup(ds: rd.Dataset, id_col: str, key_col: str) -> rd.Dataset:
    """Exact dedup on ``key_col``: hash-partition on a 128-bit content hash,
    keep the smallest ``id_col`` per key (SURVEY §2.7).  Returns
    (keep_id, n_dups) per group.  The shuffle carries (hash, id) only — at
    corpus scale the key bytes (document text) never enter the exchange."""

    from ray.data.aggregate import Count, Min

    # built-in vectorized aggregates — NOT map_groups (one Python call per
    # distinct key would be pure interpreter overhead at corpus scale)
    return (
        exact_dedup_keyed(ds, id_col, key_col)
        .groupby(["__h1", "__h2", "__isnull"])
        .aggregate(Min(id_col, alias_name="keep_id"),
                   Count(alias_name="n_dups"))
        .select_columns(["keep_id", "n_dups"])
    )


# --------------------------------------------------------------- MinHash-LSH
class MinHashStage:
    """Actor stage: tokenize + k-shingle + MinHash signature per doc.
    Permutation params built once per actor (__init__), applied per batch."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, k: int = 3,
                 analyzer: Analyzer = DEFAULT_ANALYZER, seed: int = 7):
        self.text_col, self.id_col, self.k = text_col, id_col, k
        self.analyzer = analyzer
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textstats import minhash_signature_column

        # one vectorized column pass (tokenize → flat shingle polynomial →
        # per-perm mulmod + reduceat mins), bit-identical to the per-doc
        # scalar minhash_signature fold
        S = minhash_signature_column(batch[self.text_col], self.a, self.b,
                                     k=self.k, analyzer=self.analyzer)
        flat = pa.array(S.reshape(-1), type=pa.uint64())
        sig_col = pa.FixedSizeListArray.from_arrays(flat, S.shape[1]).cast(
            pa.list_(pa.uint64()))
        return pa.table({self.id_col: batch[self.id_col], "sig": sig_col})


def band_key_matrix(sig_flat: np.ndarray, n: int, num_perm: int,
                    bands: int) -> np.ndarray:
    """Packed LSH band keys from ``n`` flattened MinHash signatures —
    ``(n·bands,)`` int64, row-major per doc: ``(band << 58) | (xor of
    golden-ratio-mixed band entries & mask58)``.  Shared by the in-corpus
    LSH pair source and the snapshot store (stages/snapshot.py), whose SQL
    twin replays this exact packing — change it in lockstep with
    driver_api._snapshot_dedup_sql.  Remainder perms past
    ``bands · (num_perm // bands)`` are ignored (only full bands hash)."""
    rows_per_band = num_perm // bands
    with np.errstate(over="ignore"):
        mixed = (sig_flat.reshape(n, num_perm)[:, : bands * rows_per_band]
                 * np.uint64(0x9E3779B97F4A7C15))
    bh = np.bitwise_xor.reduce(mixed.reshape(n, bands, rows_per_band), axis=2)
    keys = ((np.arange(bands, dtype=np.uint64) << np.uint64(58))[None, :]
            | (bh & np.uint64((1 << 58) - 1))).ravel()
    return keys.view(np.int64)


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    doc_source=None,
    num_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 3,
    threshold: float = 0.5,
    concurrency: int | None = None,
    max_bucket_occupancy: int | None = 1024,
) -> rd.Dataset:
    """Near-duplicate pairs via MinHash + LSH banding:
    shingle→minhash (actor pool) → (id, band_key) rows → groupby band bucket
    → candidate pairs → dedupe → verify TRUE shingle-Jaccard against the doc
    store → (id_a, id_b, jacc_i4).

    The band shuffle carries (id, band_key) ONLY — document text never enters
    an exchange; verification re-fetches just the candidate docs via
    ``doc_source`` (parquet path / small table; defaults to the dataset's own
    parquet input files when it was read from parquet, else to a
    driver-capped broadcast — pass the path explicitly at scale)."""
    concurrency = _pool_size(concurrency)
    rows_per_band = num_perm // bands
    if bands > 31:
        raise ValueError(f"bands={bands} > 31: band tag overflows the int64 key")
    if doc_source is None:
        doc_source = _default_doc_source(ds, id_col, text_col)

    def explode_bands(batch: pa.Table) -> pa.Table:
        # fully vectorized banding (band_key_matrix): one reshape + per-band
        # xor-reduce over the (n, num_perm) signature matrix, int64
        # (band << 58 | hash) keys.  The 58-bit truncation (vs this
        # operator's oracle, which hashes bands at 63 bits) can only MERGE
        # buckets (extra candidates, removed by the TRUE-Jaccard verify),
        # never split an oracle bucket — recall is preserved.
        sig = batch["sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        n = len(sig)
        flat = sig.flatten().to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        keys = band_key_matrix(flat, n, num_perm, bands)
        take = pa.array(np.repeat(np.arange(n), bands))
        return pa.table({id_col: batch[id_col].take(take),
                         "band_key": pa.array(keys, type=pa.int64())})

    keyed = (
        # autoscaling actor pool (1, N): a FIXED pool of N would reserve N
        # whole CPUs for the pipeline's lifetime and can deadlock the
        # downstream task stages on a small cluster
        ds.map_batches(MinHashStage, fn_constructor_kwargs={
            "text_col": text_col, "id_col": id_col, "num_perm": num_perm, "k": k_shingle},
            batch_format="pyarrow", concurrency=(1, concurrency))
        .map_batches(explode_bands, batch_format="pyarrow")
    )
    # verify FIRST (duplicate candidate instances are cache-hit cheap),
    # dedupe the TINY verified output — not the corpus-scale candidate set
    candidates = _candidate_pairs(keyed, id_col, "band_key",
                                  max_bucket_occupancy, dedupe=False)
    verified = candidates.map_batches(
        VerifyJaccardStage,
        fn_constructor_kwargs={"source": doc_source, "id_col": id_col,
                               "text_col": text_col, "k_shingle": k_shingle,
                               "threshold": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, concurrency),
        # the intersection kernel (np.unique argsort over the flat shingle
        # stream) is memory-bandwidth-bound like the compaction merge
        # (build.py cpus_per_merge_task): declare 2 CPUs per actor so a full
        # node runs cores/2 verifiers instead of thrashing the controllers
        num_cpus=_verify_num_cpus(),
    )
    return _dedupe_pairs_min(verified, "jacc_i4")


# --------------------------------------------------------------- SimHash
def simhash_pairs(
    ds: rd.Dataset, text_col: str, id_col: str, *, max_hamming: int = 8,
    analyzer: Analyzer = DEFAULT_ANALYZER,
    max_bucket_occupancy: int | None = 65_536,
) -> rd.Dataset:
    """SimHash near-dup pairs: 64-bit signature per doc, block on 4×16-bit
    bands, Hamming verified with a vectorized popcount.  Banding recall: a
    pair sharing ≥1 exact band is a candidate — GUARANTEED only for Hamming
    ≤ 3 (pigeonhole over 4 bands); pairs with 4 ≤ Hamming ≤ ``max_hamming``
    are found iff their differing bits miss some band (most do in practice,
    none are guaranteed).  Caveat: signatures are tf-weighted, so a corpus
    with a DOMINANT shared token (boilerplate) collapses toward one
    signature and every pair becomes a true near-dup by SimHash semantics —
    scrub boilerplate first (``corpus_prep.frequent_span_scrub``) when that
    isn't the intent.  Only (id, band_key, sig8bytes) is shuffled — text
    stays at rest; candidates come from the same sort-based run generator as
    the other dedup operators, with the signature riding along as the value
    column."""

    def sig_fn(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import simhash64_column

        # vectorized signatures (one tokenize/hash/vote pass per batch),
        # bit-identical to the scalar simhash64 fold; int64 reinterpret of
        # the uint64 signature is transport-friendly
        sv = simhash64_column(batch[text_col], analyzer).view(np.int64)
        return pa.table({id_col: batch[id_col], "sim": pa.array(sv, type=pa.int64())})

    def explode(batch: pa.Table) -> pa.Table:
        # fully vectorized 4×16-bit banding: int64 (band << 16 | chunk) keys
        # — injective over (band, chunk), so bucket equality is IDENTICAL to
        # the string keys this replaced (no per-row Python loop)
        u = batch["sim"].to_numpy(zero_copy_only=False).view(np.uint64)
        bands = np.arange(4, dtype=np.uint64)
        keys = ((bands << np.uint64(16))[None, :]
                | ((u[:, None] >> (np.uint64(16) * bands)[None, :])
                   & np.uint64(0xFFFF))).ravel()
        take = pa.array(np.repeat(np.arange(len(u)), 4))
        return pa.table({id_col: batch[id_col].take(take),
                         "band_key": pa.array(keys.view(np.int64), type=pa.int64()),
                         "sim": batch["sim"].take(take)})

    keyed = ds.map_batches(sig_fn, batch_format="pyarrow").map_batches(
        explode, batch_format="pyarrow")
    cands = _candidate_pairs(keyed, id_col, "band_key", max_bucket_occupancy,
                             value_col="sim", dedupe=False)

    def ham(b: pa.Table) -> pa.Table:
        sa = b["val_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        sb = b["val_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        x = np.bitwise_xor(sa, sb)
        # vectorized popcount: xor'd uint64s viewed as bytes, unpacked, summed
        h = (np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
             if len(x) else np.empty(0, dtype=np.int64))
        keep = h <= max_hamming
        t = b.filter(pa.array(keep))
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "hamming": pa.array(h[keep].astype(np.int64))})

    return _dedupe_pairs_min(cands.map_batches(ham, batch_format="pyarrow"),
                             "hamming")


# ------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    doc_source=None,
    k_shingle: int = 3,
    threshold: float = 0.5,
    max_bucket_occupancy: int | None = 1024,
    analyzer: Analyzer = DEFAULT_ANALYZER,
    concurrency: int | None = None,
) -> rd.Dataset:
    """EXACT n-gram-Jaccard near-dup pairs (vs MinHash's probabilistic
    candidates): docs sharing ≥1 shingle-hash become candidates — the bucket
    key is the raw 64-bit shingle hash, so bucket occupancy equals the
    shingle's doc frequency (any pair with Jaccard > 0 shares a shingle,
    hence a bucket → recall is exact down to Jaccard > 0, modulo buckets
    skipped by ``max_bucket_occupancy``).  The shuffle carries
    (id, shingle_hash) only; TRUE Jaccard is verified against the doc store
    (``doc_source`` defaults like ``minhash_lsh_pairs``: input parquet files,
    else a row-capped broadcast — pass the path explicitly at scale)."""
    verified = _verified_jaccard_stream(
        ds, text_col, id_col, doc_source=doc_source, k_shingle=k_shingle,
        threshold=threshold, max_bucket_occupancy=max_bucket_occupancy,
        analyzer=analyzer, concurrency=concurrency)
    return _dedupe_pairs_min(verified, "jacc_i4")


def _verified_jaccard_stream(
    ds: rd.Dataset, text_col: str, id_col: str, *, doc_source, k_shingle: int,
    threshold: float, max_bucket_occupancy: int | None, analyzer: Analyzer,
    concurrency: int | None, candidate_filter=None,
) -> rd.Dataset:
    """The shared body of the exact-Jaccard family: shingle-hash explode →
    ONE sort-based candidate exchange → doc-store verify.  Emits the
    verified (id_a, id_b, jacc_i4) stream POSSIBLY STILL DUPLICATED (a pair
    sharing several shingles surfaces once per run) — ``ngram_jaccard_pairs``
    restores the distinct-pair contract with a grouped MIN; consumers whose
    fold is duplicate-insensitive (argmax in ``jaccard_similarity_join``)
    skip that whole extra exchange."""
    concurrency = _pool_size(concurrency)
    if doc_source is None:
        doc_source = _default_doc_source(ds, id_col, text_col)

    def explode_shingle_hashes(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import shingle_hashes_column

        # one vectorized column pass: flat rolling polynomial + per-doc
        # dedupe (identical hashes to the per-row shingle_hashes fold);
        # uint64 reinterpreted as int64 group key for transport
        fp, doc_rows = shingle_hashes_column(batch[text_col], k_shingle, analyzer)
        return pa.table({id_col: batch[id_col].take(pa.array(doc_rows)),
                         "sh": pa.array(fp.view(np.int64), type=pa.int64())})

    keyed = ds.map_batches(explode_shingle_hashes, batch_format="pyarrow")
    candidates = _candidate_pairs(keyed, id_col, "sh", max_bucket_occupancy,
                                  dedupe=False)
    if candidate_filter is not None:
        # drop candidates that can never appear in the result BEFORE the
        # doc-store verify (e.g. the similarity join's same-side pairs)
        candidates = candidates.map_batches(candidate_filter,
                                            batch_format="pyarrow")
    return candidates.map_batches(
        VerifyJaccardStage,
        fn_constructor_kwargs={"source": doc_source, "id_col": id_col,
                               "text_col": text_col, "k_shingle": k_shingle,
                               "threshold": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, concurrency),
        # bandwidth-bound intersection kernel (see minhash note)
        num_cpus=_verify_num_cpus(),
    )


# similarity-join default doc-source ceiling: below it the encoded union is
# driver-broadcast; above it the union spills to a temp parquet store the
# verify actors fetch from (reclaimed at interpreter exit).  Module-level so
# tests can exercise the spill branch at toy scale.
SIMJOIN_BROADCAST_CAP = 200_000


def jaccard_similarity_join(
    left: rd.Dataset,
    right: rd.Dataset,
    text_col: str,
    left_id_col: str,
    right_id_col: str,
    *,
    threshold: float = 0.3,
    k: int = 1,
    doc_source=None,
    k_shingle: int = 3,
    max_bucket_occupancy: int | None = 1024,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Text SIMILARITY JOIN (record linkage / entity matching): for every
    left row, its ``k`` most-similar right rows by EXACT n-gram Jaccard ≥
    ``threshold`` (ties → smallest right id).  Left rows with no qualifying
    match are absent from the output (semi-join semantics).

    ``k=1`` (default) returns ``(left_id, right_id, jacc_i4)`` via ONE
    grouped MAX over a packed key — the scalable exchange path.  ``k>1``
    returns ``(left_id, right_id, jacc_i4, rank)`` (rank 1 = best): the
    verified pairs first pass the distinct-pair grouped MIN (top-k is NOT
    duplicate-insensitive, unlike the argmax) and then the ``grouped_topk``
    combiner fold — its documented output-sized-fold regime applies.

    Built on the shared near-dup machinery: both sides are tagged into one
    stream by ENCODING the id (``sid = 2·id + side`` — ids must be
    non-negative int64 < 2^62), ``ngram_jaccard_pairs`` generates and
    verifies candidates (one (id, shingle-hash) sort exchange, doc-store
    verify), cross-side pairs survive a parity filter, and the per-left
    argmax folds through ONE grouped MAX over a packed
    ``jacc_i4·2^32 + (2^32−1−right_id)`` key — no per-group Python.  Right
    ids must be < 2^32 for the packing (checked).

    ``doc_source`` must map the ENCODED sid to text at scale (a combined
    parquet); the default row-capped broadcast covers test/driver corpora.
    Returns ``(left_id, right_id, jacc_i4)``."""
    from ray.data.aggregate import Max

    def enc(id_col: str, side: int):
        def f(b: pa.Table) -> pa.Table:
            sid = pc.add(pc.multiply(pc.cast(b[id_col], pa.int64()), 2), side)
            return pa.table({"sid": sid, text_col: b[text_col]})
        return f

    union = left.map_batches(enc(left_id_col, 0), batch_format="pyarrow") \
        .union(right.map_batches(enc(right_id_col, 1), batch_format="pyarrow"))
    if doc_source is None:
        # the default doc-source path executes its input twice more (row-cap
        # count + broadcast collect); pin the encoded union once instead.
        union = union.materialize()
        if union.count() > SIMJOIN_BROADCAST_CAP:
            # above the broadcast cap the verify stage needs a fetchable
            # (sid, text) store keyed by the ENCODED id — no caller-side
            # file can provide that, so spill the union to a temp parquet
            # store.  The returned dataset is lazy, so the dir must outlive
            # this call; it is reclaimed at interpreter exit (atexit) —
            # pass doc_source explicitly to control placement/lifetime at
            # scale.
            import atexit
            import shutil
            import tempfile

            store = tempfile.mkdtemp(prefix="pgfts_simjoin_store_")
            atexit.register(shutil.rmtree, store, ignore_errors=True)
            union.write_parquet(store)
            doc_source = store
    def cross_side_only(b: pa.Table) -> pa.Table:
        # same-side candidates can never appear in the result — drop them
        # before the doc-store verify pays for them (parity of the encoded
        # sid is the side bit)
        a64 = pc.cast(b["id_a"], pa.int64())
        b64 = pc.cast(b["id_b"], pa.int64())
        return b.filter(pc.not_equal(pc.bit_wise_and(a64, 1),
                                     pc.bit_wise_and(b64, 1)))

    # the pre-dedupe verified stream: the argmax fold below is
    # duplicate-insensitive (a pair re-verified from several shared shingles
    # scores identically), so the distinct-pair grouped MIN — a whole hash
    # exchange — is skipped
    pairs = _verified_jaccard_stream(
        union, text_col, "sid", doc_source=doc_source, k_shingle=k_shingle,
        threshold=threshold, max_bucket_occupancy=max_bucket_occupancy,
        analyzer=DEFAULT_ANALYZER, concurrency=concurrency,
        candidate_filter=cross_side_only)

    def orient(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ja = b["jacc_i4"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ((a & 1) == (bb & 1)).any():
            # cross_side_only runs upstream of the verify — a same-side pair
            # here means the candidate filter was bypassed, not a data issue
            raise AssertionError("similarity join: same-side pair reached "
                                 "orient(); candidate filter missing")
        left_sid = np.where(a & 1 == 0, a, bb)
        right_sid = np.where(a & 1 == 0, bb, a)
        rid = right_sid >> 1
        if len(rid) and (int(rid.min()) < 0 or int(rid.max()) >= (1 << 32)):
            raise ValueError("jaccard_similarity_join: right ids must be "
                             "in [0, 2^32) for the argmax packing")
        pack = ja * (1 << 32) + ((1 << 32) - 1 - rid)
        return pa.table({"left_id": pa.array(left_sid >> 1),
                         "pack": pa.array(pack)})

    if k > 1:
        def orient_plain(b: pa.Table) -> pa.Table:
            a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            left_sid = np.where(a & 1 == 0, a, bb)
            right_sid = np.where(a & 1 == 0, bb, a)
            return pa.table({"left_id": pa.array(left_sid >> 1),
                             "right_id": pa.array(right_sid >> 1),
                             "jacc_i4": b["jacc_i4"]})

        from .topk import grouped_topk

        distinct = _dedupe_pairs_min(pairs, "jacc_i4")
        oriented = _drop_empty_blocks(
            distinct.map_batches(orient_plain, batch_format="pyarrow"))
        cols = ["left_id", "right_id", "jacc_i4", "rank"]
        if oriented.count() == 0:
            return rd.from_arrow(pa.table(
                {c: pa.array([], type=pa.int64()) for c in cols}))
        top = grouped_topk(oriented, "left_id", "jacc_i4", "right_id",
                           k=k, descending=True)
        # rank within each left group (grouped_topk output is sorted by
        # (group ASC, jacc DESC, right_id ASC))
        g = top["left_id"].to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.flatnonzero(g[1:] != g[:-1]) + 1]
        rank = np.arange(len(g), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(g)])) + 1
        return rd.from_arrow(top.append_column("rank", pa.array(rank)))

    folded = _drop_empty_blocks(
        pairs.map_batches(orient, batch_format="pyarrow"))
    if folded.count() == 0:
        empty = pa.table({"left_id": pa.array([], type=pa.int64()),
                          "right_id": pa.array([], type=pa.int64()),
                          "jacc_i4": pa.array([], type=pa.int64())})
        return rd.from_arrow(empty)
    best = folded.groupby("left_id").aggregate(Max("pack", alias_name="pack"))

    def unpack(b: pa.Table) -> pa.Table:
        pk = b["pack"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"left_id": b["left_id"],
                         "right_id": pa.array((1 << 32) - 1 - (pk & ((1 << 32) - 1))),
                         "jacc_i4": pa.array(pk >> 32)})

    return best.map_batches(unpack, batch_format="pyarrow")


# ------------------------------------------------------- connected components
def connected_components(pairs: pa.Table, id_a: str = "id_a", id_b: str = "id_b") -> pa.Table:
    """Duplicate-cluster representatives from a near-dup pair list:
    union-find → (id, rep) with rep = min id of the component.  Driver-side
    variant for small (post-LSH) pair lists; ``connected_components_ds`` is
    the distributed min-label-propagation form."""
    a = pairs[id_a].to_pylist()
    b = pairs[id_b].to_pylist()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    ids = sorted(parent)
    reps = [find(i) for i in ids]
    return pa.table({"id": pa.array(ids), "rep": pa.array(reps)})


def connected_components_ds(
    pairs: rd.Dataset, id_a: str = "id_a", id_b: str = "id_b", *, max_rounds: int = 64,
    driver_threshold: int = 200_000,
) -> rd.Dataset:
    """Connected components over a pairs Dataset → (id, rep).

    Hybrid: pair lists at or below ``driver_threshold`` rows run driver-side
    union-find (near-dup pair lists have already been shrunk by LSH+verify;
    a handful of label-propagation ROUNDS of cluster-wide joins costs far
    more than one linear pass over a small edge list).  Larger graphs run
    the distributed path: iterated min-label propagation — each round every
    node's current min label is offered to all its neighbors (one hash join
    to attach labels to edges + one grouped MIN to fold offers; rounds =
    graph diameter; everything vectorized, no per-node Python).  Labels only
    decrease, so the exact sum of labels is a convergence fixpoint detector
    (one tiny aggregate per round).  Pass ``driver_threshold=0`` to force
    the distributed path."""

    def fwd(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch[id_a], "peer": batch[id_b]})

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch[id_b], "peer": batch[id_a]})

    edges = pairs.select_columns([id_a, id_b]).materialize()
    if driver_threshold and edges.count() <= driver_threshold:
        tables = [t for t in ray.get(table_refs(edges))
                  if t.num_rows and id_a in t.column_names]
        if not tables:
            return rd.from_arrow(pa.table({"id": [], "rep": []}))
        return rd.from_arrow(connected_components(pa.concat_tables(tables), id_a, id_b))

    adj = _drop_empty_blocks(
        edges.map_batches(fwd, batch_format="pyarrow").union(
            edges.map_batches(rev, batch_format="pyarrow"))
    )
    if adj.count() == 0:  # no edges → no components (join would choke on empty)
        id_type = pairs.schema().base_schema.field(id_a).type
        return rd.from_arrow(pa.table({"id": pa.array([], type=id_type),
                                       "rep": pa.array([], type=id_type)}))
    # labels start as self-labels over every endpoint; schema manipulation is
    # logical (select/rename) so empty-block UDF bypass can't poison the join
    labels = _drop_empty_blocks(
        adj.select_columns(["id"]).map_batches(
            lambda b: b.append_column("lbl", b["id"]), batch_format="pyarrow")
        .groupby("id").min("lbl").rename_columns({"min(lbl)": "lbl"})
    ).materialize()
    # ONE self-loop per unique node: each node offers its own label to
    # itself every round, so the per-round fold is one join + one grouped
    # MIN over offers alone (no labels∪offered union + extra materialize)
    adj = _drop_empty_blocks(adj.union(
        labels.map_batches(
            lambda b: pa.table({"id": b["id"], "peer": b["id"]}),
            batch_format="pyarrow")))

    prev = int(labels.sum("lbl") or 0)
    converged = False
    for _ in range(max_rounds):
        # each node offers its current label to every neighbor (one hash join
        # + one grouped MIN per round — no per-node Python)
        offers = adj.join(labels, join_type="inner", on=("id",), **_join_args())
        offered = offers.select_columns(["peer", "lbl"]).rename_columns({"peer": "id"})
        labels = _drop_empty_blocks(
            offered.groupby("id").min("lbl").rename_columns({"min(lbl)": "lbl"})
        )
        cur = int(labels.sum("lbl") or 0)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # returning unconverged labels would silently split clusters (and
        # downstream dedup would keep extra copies) — diameter > max_rounds
        # is a caller decision, not a silent degradation
        raise RuntimeError(
            f"connected_components_ds: min-label propagation did not reach a "
            f"fixpoint in max_rounds={max_rounds} (graph diameter exceeds the "
            f"round budget) — raise max_rounds")
    return labels.rename_columns({"lbl": "rep"})


def exact_dedup_labels(ds: rd.Dataset, id_col: str, key_col: str) -> rd.Dataset:
    """``(id, rep)`` cluster labels for EXACT duplicates of ``key_col`` —
    one row per member of every ≥2-member identical-key group, ``rep`` =
    min id.  Output shape matches ``connected_components_ds``, so
    ``apply_dedup`` materializes the surviving corpus from it directly.

    Same exchange discipline as ``exact_dedup``: the grouped Min/Count runs
    over (hash128, id) rows; the members-to-groups INNER join re-shuffles
    only (hash128, id) + the small dup-group side — 24 B/row either way,
    never the key bytes.  Unique documents never appear in the output."""
    from ray.data.aggregate import Count, Min

    hash_cols = ["__h1", "__h2", "__isnull"]
    # pinned once: both the grouped aggregate AND the members join consume
    # it — unmaterialized, the corpus read + 128-bit hashing would run twice
    keyed = exact_dedup_keyed(ds, id_col, key_col).materialize()
    groups = (
        keyed.groupby(hash_cols)
        .aggregate(Min(id_col, alias_name="rep"), Count(alias_name="n"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["n"], 1)).select([*hash_cols, "rep"]),
            batch_format="pyarrow")
    )
    groups = _drop_empty_blocks(groups)
    if groups.count() == 0:  # no duplicates anywhere
        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(pa.table({"id": pa.array([], type=id_type),
                                       "rep": pa.array([], type=id_type)}))
    def widen(b: pa.Table) -> pa.Table:
        # the grouped aggregate widens __isnull int8 → int64 in its output;
        # Arrow hash joins need exactly-matching key types
        i = b.column_names.index("__isnull")
        return b.set_column(i, "__isnull", pc.cast(b["__isnull"], pa.int64()))

    members = _drop_empty_blocks(
        keyed.map_batches(widen, batch_format="pyarrow")).join(
        groups, join_type="inner", on=tuple(hash_cols), **_join_args())
    return members.map_batches(
        lambda b: pa.table({"id": b[id_col], "rep": b["rep"]}),
        batch_format="pyarrow")


def apply_dedup(
    ds: rd.Dataset,
    labels: rd.Dataset,
    id_col: str = "doc_id",
    *,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Materialize the deduplicated corpus from near-dup component labels —
    the keep-canonical tail of the dedup family (pairs → components → THIS).

    ``labels`` is the ``(id, rep)`` output of ``connected_components_ds`` (or
    any cluster map with those columns): every row whose id appears with
    ``rep != id`` is a non-canonical duplicate and is dropped; the canonical
    (min-id) member of each cluster and every unpaired document pass through
    untouched.  On the broadcast route columns and order are preserved
    (streaming filter — no re-sort); the anti-join route is a hash exchange
    and does NOT preserve row or column order.

    Physical route is chosen by the DROP-SET size, not the corpus size:

    - broadcast (drop set ≤ ``broadcast_threshold``): drop ids collect into
      ONE sorted int64 array in the object store (8 bytes/id — 5M ids is
      40 MB) and every corpus block filters via a vectorized membership
      test.  No corpus row ever enters an exchange; at a realistic near-dup
      rate this is the 100-TB route.
    - native left-anti join (above the threshold): corpus ⟕̸ drop on id.
      Moves corpus rows through one hash exchange — only chosen when the
      drop set itself is too big to broadcast.
    """
    drop = _drop_empty_blocks(labels.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["id"], b["rep"]))).select(["id"]),
        batch_format="pyarrow"))
    n_drop = drop.count()
    if n_drop == 0:
        return ds
    if n_drop <= broadcast_threshold:
        tabs = [t for t in ray.get(table_refs(drop))
                if t.num_rows and "id" in t.column_names]
        drop_col = pa.concat_tables(tabs)["id"].combine_chunks()
        if pa.types.is_integer(drop_col.type):
            ids = np.sort(drop_col.to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            drop_ref = ray.put(ids)
            drop_arr_ref = ray.put(drop_col)

            def keep(batch: pa.Table) -> pa.Table:
                col = batch[id_col]
                if col.null_count:
                    # NULL ids round-trip through float64 NaN in to_numpy
                    # and compare as an undefined sentinel — use the Arrow
                    # membership kernel for such batches (NULL is never in
                    # the drop set → is_in false → row kept)
                    return batch.filter(pc.invert(pc.is_in(
                        col, value_set=ray.get(drop_arr_ref))))
                dropset = ray.get(drop_ref)
                vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.searchsorted(dropset, vals)
                pos[pos == len(dropset)] = 0
                return batch.filter(pa.array(dropset[pos] != vals))
        else:
            # string/binary ids: Arrow hash-set membership instead of the
            # int64 searchsorted fast path (same broadcast discipline)
            drop_ref = ray.put(drop_col)

            def keep(batch: pa.Table) -> pa.Table:
                dropset = ray.get(drop_ref)
                return batch.filter(
                    pc.invert(pc.is_in(batch[id_col], value_set=dropset)))

        return ds.map_batches(keep, batch_format="pyarrow")
    # the corpus side streams into the join UNmaterialized: the anti-join
    # path only triggers when the drop set is object-store-sized, i.e. at
    # exactly the scale a _drop_empty_blocks materialize must not happen.
    # Parquet-read blocks carry their schema even when empty; only
    # map-produced empties are schema-less (the `drop` side above went
    # through _drop_empty_blocks for that reason).
    return ds.join(
        drop, join_type="left_anti", on=(id_col,), right_on=("id",),
        **_join_args())


# --------------------------------------------------------------- embeddings
def embedding_neardup_pairs(
    ds: rd.Dataset, vec_col: str, id_col: str, *, threshold: float = 0.98,
    concurrency: int = 2,
) -> pa.Table:
    """EXACT embedding-cosine near-dup pairs, distributed: the normalized
    matrix lives in the OBJECT STORE (block refs — never collected on the
    driver); each ``map_batches`` task scores its own batch against the full
    matrix (one numpy matmul) and emits only its qualifying pairs.  Work is
    O(N²/B) per task, memory is O(N·dim) shared via the object store.
    Inherently all-pairs — for corpus scale use
    ``embedding_neardup_pairs_lsh`` (bucketed, approximate)."""
    refs = table_refs(ds.select_columns([id_col, vec_col]))
    refs_handle = ray.put(refs)
    id_type = ds.schema().base_schema.field(id_col).type

    from .similarity import _matrix, _normalize, quantize_i4

    class ScoreBlock:
        def __init__(self):
            tables = [t for t in ray.get(ray.get(refs_handle)) if t.num_rows]
            tbl = pa.concat_tables(tables)
            # object ndarray keeps string/int ids alike comparable
            ids = np.asarray(tbl[id_col].to_pylist())
            order = np.argsort(ids)
            self.ids = ids[order]
            self.Mn = _normalize(_matrix(tbl[vec_col])[order])

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch[id_col].to_pylist())
            sims = _normalize(_matrix(batch[vec_col])) @ self.Mn.T
            # vectorized pair emit: all qualifying (row, col) at once,
            # a < b kept once, no per-row Python loop
            ai, aj = np.nonzero(sims >= threshold)
            keep = self.ids[aj] > bids[ai]
            ai, aj = ai[keep], aj[keep]
            return pa.table({"id_a": pa.array(bids[ai], type=id_type),
                             "id_b": pa.array(self.ids[aj], type=id_type),
                             "cos_i4": pa.array(quantize_i4(sims[ai, aj]))})

    # materialized: counted for the guard, then collected — re-running the
    # lineage would score the O(N²/B) similarity matrix twice
    pairs = ds.map_batches(ScoreBlock, batch_format="pyarrow",
                           concurrency=(1, concurrency)).materialize()
    # the driver collect is OUTPUT-sized (threshold-filtered pairs), but a
    # too-low threshold makes the output quadratic — fail loudly instead of
    # OOM-ing the driver; the LSH path streams and has no such collect
    n_pairs = pairs.count()
    if n_pairs > 5_000_000:
        raise ValueError(
            f"embedding_neardup_pairs: {n_pairs} pairs ≥ threshold "
            f"{threshold} — the exact path collects its output on the "
            f"driver; raise the threshold or use "
            f"embedding_neardup_pairs_lsh (streaming) at this density")
    out = pairs.to_pandas()
    if "id_a" not in out.columns:
        # zero pairs anywhere: all-empty blocks lose their schema through
        # to_pandas — return the typed empty result instead of KeyError-ing
        return pa.table({"id_a": pa.array([], type=id_type),
                         "id_b": pa.array([], type=id_type),
                         "cos_i4": pa.array([], type=pa.int64())})
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({"id_a": pa.array(out["id_a"], type=id_type),
                     "id_b": pa.array(out["id_b"], type=id_type),
                     "cos_i4": pa.array(out["cos_i4"], type=pa.int64())})


class VecCache:
    """Per-actor (id → normalized row) vector cache over a ``DocFetcher``
    — the shared state of the cosine-verify stages (in-corpus
    ``VerifyCosineStage`` and the cross-store stage in
    ``stages/snapshot.py``).  Candidate batches are bucket-clustered, so
    a vector appearing in thousands of pairs is fetched once per actor;
    above ``CACHE_CAP`` the cache clears and refetches what the call
    still needs (clearing barely costs hit rate)."""

    CACHE_CAP = 200_000

    def __init__(self, source, id_col: str, vec_col: str):
        self.fetcher = DocFetcher(source, id_col, [vec_col])
        self._ids: np.ndarray | None = None  # sorted id keys
        self._M: np.ndarray | None = None    # normalized rows, id-sorted

    def ensure(self, need: set) -> None:
        from .similarity import _normalize

        have = set() if self._ids is None else set(self._ids.tolist())
        missing = need - have
        if not missing:
            return
        if len(have) + len(missing) > self.CACHE_CAP:
            self._ids, self._M = None, None
            missing = set(need)
        vecs = self.fetcher.fetch(missing)
        absent = missing - vecs.keys()
        if absent:
            # an id the vector store can't produce is a stale/partial store —
            # a zero-filled fallback would silently pair NOTHING or everything
            raise KeyError(
                f"vector store is missing {len(absent)} candidate id(s), "
                f"e.g. {sorted(absent)[:5]} — stale or partial vec_source?")
        mids = sorted(missing)
        Mnew = _normalize(np.asarray([vecs[i] for i in mids], dtype=np.float64))
        if self._ids is None:
            self._ids, self._M = np.asarray(mids), Mnew
        else:
            all_ids = np.concatenate([self._ids, np.asarray(mids)])
            order = np.argsort(all_ids, kind="stable")
            self._ids = all_ids[order]
            self._M = np.concatenate([self._M, Mnew])[order]

    def rows(self, ids: np.ndarray) -> np.ndarray:
        """Normalized rows for ``ids`` (must be covered by a prior
        ``ensure``) — sorted-id searchsorted gather, no per-id Python."""
        return self._M[np.searchsorted(self._ids, ids)]


class VerifyCosineStage:
    """Actor stage over candidate-pair batches: fetch both vectors from the
    vector store (shared ``VecCache``), exact cosine (dot of normalized
    rows, fully vectorized per batch), keep pairs ≥ threshold.  Mirrors
    ``VerifyJaccardStage``."""

    def __init__(self, source, id_col: str, vec_col: str, threshold: float):
        self.cache = VecCache(source, id_col, vec_col)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import quantize_i4

        if batch.num_rows == 0:
            return pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"],
                             "cos_i4": pa.array([], type=pa.int64())})
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        self.cache.ensure(set(a.tolist()) | set(b.tolist()))
        sims = np.einsum("ij,ij->i", self.cache.rows(a), self.cache.rows(b))
        keep = sims >= self.threshold
        t = batch.filter(pa.array(keep))
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "cos_i4": pa.array(quantize_i4(sims[keep]), type=pa.int64())})


def embedding_neardup_pairs_lsh(
    ds: rd.Dataset, vec_col: str, id_col: str, *, threshold: float = 0.9,
    n_planes: int = 16, bands: int = 4, seed: int = 11,
    max_bucket_occupancy: int | None = 4096,
    vec_source=None, concurrency: int | None = None,
    plane_mode: str = "gaussian",
) -> rd.Dataset:
    """Scale path: banded sign-LSH bucketing (like MinHash bands — a pair is
    a candidate if ANY band of hyperplane signs matches exactly), exact
    cosine verified per candidate pair.  The exchange carries (id, int64
    band_key) ONLY — vectors stay at rest and are re-fetched just for
    candidate ids via ``vec_source`` (same contract as the text dedup
    operators' ``doc_source``).  Candidates come from the shared sort-based
    run generator (``_candidate_pairs``) — no per-bucket ``map_groups``.
    Approximate — recall rises with bands and falls with tighter buckets
    (asserted ≥ baseline in pytest).

    ``plane_mode="hash"`` projects ×10⁴-quantized INTEGER vectors onto the
    deterministic ±1 FNV planes (``similarity.hash_planes``) instead of
    seeded Gaussian planes over normalized floats — sign(∑ int·±1) is
    exact integer arithmetic (a positive scaling never flips a dot
    product's sign, so skipping normalization is exact), which makes the
    bucket structure bit-for-bit re-expressible in a SQL oracle
    (driver_api._semantic_dedup_lsh_sql), the same trick as
    ``similarity.lsh_bucket_topk``."""
    from .similarity import _matrix, _normalize, hash_planes, quantize_i4

    concurrency = _pool_size(concurrency)
    planes_by_dim: dict[int, np.ndarray] = {}
    per_band = n_planes // bands
    if per_band < 1:
        raise ValueError(f"n_planes={n_planes} < bands={bands}")
    # the int64 key is (band << per_band | code); both parts must fit without
    # overlap or distinct buckets silently merge (and a merged bucket can
    # trip max_bucket_occupancy, dropping real pairs)
    if per_band + max(1, (bands - 1).bit_length()) > 62:
        raise ValueError(f"n_planes={n_planes}/bands={bands}: band key overflows int64")
    used_planes = bands * per_band  # remainder planes are ignored, like the
    # scalar banding this replaced (only full bands hash)
    pow2 = (1 << np.arange(per_band - 1, -1, -1)).astype(np.int64)
    band_tag = (np.arange(bands, dtype=np.int64) << np.int64(per_band))
    if vec_source is None:
        vec_source = _default_doc_source(ds, id_col, vec_col)

    if plane_mode not in ("gaussian", "hash"):
        raise ValueError(f"plane_mode={plane_mode!r}: 'gaussian' or 'hash'")

    def bucketize(batch: pa.Table) -> pa.Table:
        if plane_mode == "hash":
            M = quantize_i4(_matrix(batch[vec_col]))  # int64, exact signs
        else:
            M = _normalize(_matrix(batch[vec_col]))
        dim = M.shape[1]
        if dim not in planes_by_dim:
            planes_by_dim[dim] = (
                hash_planes(dim, n_planes, seed) if plane_mode == "hash"
                else np.random.default_rng(seed).standard_normal((dim, n_planes)))
        bits = (M @ planes_by_dim[dim]) > 0
        # vectorized band codes: (n, bands, per_band) · 2-powers, then an
        # int64 (band << per_band | code) key — no per-row Python loop
        codes = bits[:, :used_planes].reshape(len(M), bands, per_band) @ pow2
        keys = (band_tag[None, :] | codes).ravel()
        take = pa.array(np.repeat(np.arange(batch.num_rows), bands))
        return pa.table({id_col: batch[id_col].take(take),
                         "band_key": pa.array(keys, type=pa.int64())})

    keyed = ds.map_batches(bucketize, batch_format="pyarrow")
    candidates = _candidate_pairs(keyed, id_col, "band_key",
                                  max_bucket_occupancy, dedupe=False)
    verified = candidates.map_batches(
        VerifyCosineStage,
        fn_constructor_kwargs={"source": vec_source, "id_col": id_col,
                               "vec_col": vec_col, "threshold": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, concurrency),
    )
    return _dedupe_pairs_min(verified, "cos_i4")
