"""Distributed k-means over embedding columns + the cluster-scoped
SemDeDup pair source.

K-means is the workhorse of embedding-space data curation (SemDeDup
clusters before comparing pairs — Abbas et al. 2023; IVF trains coarse
quantizers — Jégou et al. 2011; mixture recipes balance over clusters),
but a naive distributed Lloyd's has a reproducibility problem: float
centroid sums depend on block boundaries and reduction order, so the
same corpus can cluster differently at different parallelism.  This
implementation is DETERMINISTIC BY CONSTRUCTION under any parallelism /
partitioning:

- vectors are ×10⁴ integer-quantized (``similarity.quantize_i4``, the
  repo-wide score convention) and per-cluster sums are exact int64 —
  integer addition is associative, so the fold result is independent of
  block geometry (the float-sum version is NOT: ``(a+b)+c != a+(b+c)``);
- centroids are ``sum/count`` in float64 — ONE rounding from exact
  integers, identical everywhere;
- per-point squared distances accumulate DIM-BY-DIM LEFT-TO-RIGHT (a
  fixed float64 expression order), so a SQL oracle's left-associative
  ``+`` chain reproduces every comparison bit-for-bit (driver query
  ``kmeans_clusters`` — the oracle unrolls the Lloyd iterations as plain
  CTEs and hash-matches the full assignment);
- distance ties pick the LOWEST cluster id (np.argmin first-minimum ==
  SQL ``row_number() ... ORDER BY dist, cid``);
- seeds are the ``k`` corpus rows with the smallest
  ``splitmix64(FNV-1a64(f"{seed}|{id}"))`` — the split_assign hash:
  uniform over the corpus, independent of row order and partitioning —
  ties broken by id.

Scale shape: each Lloyd iteration is ONE streaming, column-pruned pass
over the corpus emitting k×(dim+1) integers per block (combiner-shaped;
no shuffle anywhere); assignment is one pass.  int64 headroom: per-dim
cluster sums stay exact up to ~9·10¹⁴ rows per cluster at the 10⁴
quantization scale.

Reference anchor: the reference keeps every derived search structure as
a built-once index (tables/mv_books_dc.sql:438-494); this applies the
same discipline to an embedding-space partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.arrowutil import table_refs

KMEANS_DEFAULT_SEED = 29
KMEANS_DEFAULT_ITERS = 2


def assign_rows(Xq_f: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin-distance cluster per row of ``Xq_f`` (float64 view of the
    ×10⁴-quantized vectors) against centroids ``C`` (k × dim float64).

    The squared distance accumulates dim-by-dim LEFT-TO-RIGHT — the one
    float64 expression order the SQL oracle's ``+`` chain shares — rather
    than a BLAS matmul (whose pairwise/SIMD summation order is
    unspecified).  Ties resolve to the lowest cluster id (np.argmin
    first-minimum)."""
    n = len(Xq_f)
    k = len(C)
    D = np.zeros((n, k), dtype=np.float64)
    for d in range(C.shape[1]):
        diff = Xq_f[:, d, None] - C[None, :, d]
        D += diff * diff
    return np.argmin(D, axis=1).astype(np.int64)


def _quantized(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    from .similarity import _matrix, quantize_i4

    return quantize_i4(_matrix(col))


def _valid_vecs(ds: rd.Dataset, vec_col: str, cols: list[str]) -> rd.Dataset:
    """Column-pruned view with NULL-vector rows dropped (a NULL embedding
    has no position in the space; callers that must SURFACE such rows use
    cluster_assign, which emits cluster=NULL for them instead)."""

    def keep(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        if t.num_rows == 0:
            return t
        if pa.types.is_null(t.schema.field(vec_col).type):
            return t.slice(0, 0)  # an all-null block has no usable vectors
        return t.filter(pc.is_valid(t[vec_col]))

    return ds.select_columns(cols).map_batches(keep, batch_format="pyarrow")


def _seed_centroids(ds: rd.Dataset, vec_col: str, id_col: str, k: int,
                    seed: int) -> np.ndarray:
    """(k × dim) int64 quantized seed vectors: the k corpus rows with the
    smallest (splitmix64(FNV-1a64(f"{seed}|{id}")), id) — per-batch bottom-k
    partials (k rows each), one driver merge.  Cluster id j = rank j in
    that order (the SQL oracle's ``row_number() OVER (ORDER BY h, id)``)."""
    from ..functions.textstats import mix64, token_hashes

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = mix64(token_hashes([f"{seed}|{v}" for v in ids.to_pylist()]))
        idnp = ids.to_numpy(zero_copy_only=False)
        if idnp.dtype == object:
            # string ids: total order via one stable argsort per key level
            order = np.argsort(h, kind="stable")[:k]
        else:
            order = np.lexsort((idnp, h))[:k]
        take = pa.array(order)
        return pa.table({"__h": pa.array(h[order], type=pa.uint64()),
                         "__sid": ids.take(take),
                         "__vec": batch[vec_col].take(take)})

    parts = _valid_vecs(ds, vec_col, [id_col, vec_col]).map_batches(
        bottomk, batch_format="pyarrow")
    tabs = [t for t in ray.get(table_refs(parts))
            if t.num_rows and "__h" in t.column_names]
    if not tabs:
        raise ValueError("kmeans_train: dataset has no non-null vectors")
    merged = pa.concat_tables(tabs)
    rows = sorted(
        zip(merged["__h"].to_pylist(), merged["__sid"].to_pylist(),
            merged["__vec"].to_pylist()),
        key=lambda r: (r[0], r[1]))[:k]
    if len(rows) < k:
        raise ValueError(
            f"kmeans_train: k={k} exceeds the corpus ({len(rows)} rows)")
    from .similarity import quantize_i4

    return quantize_i4(np.asarray([r[2] for r in rows], dtype=np.float64))


def kmeans_train(
    ds: rd.Dataset, vec_col: str, id_col: str, k: int, *,
    iters: int = KMEANS_DEFAULT_ITERS, seed: int = KMEANS_DEFAULT_SEED,
) -> np.ndarray:
    """Lloyd's k-means over a ``list<float>`` column → (k × dim) float64
    centroids, bit-identical at any parallelism (module docstring).  Each
    iteration streams the corpus once; the exchange is k×(dim+1) integers
    per block."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    seeds = _seed_centroids(ds, vec_col, id_col, k, seed)
    C = seeds.astype(np.float64)
    dim = C.shape[1]
    src = _valid_vecs(ds, vec_col, [vec_col])
    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            empty = pa.table({"cid": pa.array([], type=pa.int64()),
                              "n": pa.array([], type=pa.int64()),
                              "s": pa.array([], type=pa.list_(pa.int64()))})
            if batch.num_rows == 0:
                return empty
            Cc = ray.get(_cref)
            Xq = _quantized(batch[vec_col])
            if Xq.shape[1] != dim:
                raise ValueError(
                    f"kmeans_train: vector dim {Xq.shape[1]} != seed dim {dim}")
            a = assign_rows(Xq.astype(np.float64), Cc)
            # exact int64 per-cluster sums: sort + reduceat (no float path)
            order = np.argsort(a, kind="stable")
            a_s, X_s = a[order], Xq[order]
            starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
            S = np.zeros((k, dim), dtype=np.int64)
            S[a_s[starts]] = np.add.reduceat(X_s, starts, axis=0)
            n = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({"cid": pa.array(np.arange(k, dtype=np.int64)),
                             "n": pa.array(n),
                             "s": pa.array(S.tolist(),
                                           type=pa.list_(pa.int64()))})

        parts = src.map_batches(partial, batch_format="pyarrow")
        S_tot = np.zeros((k, dim), dtype=np.int64)
        n_tot = np.zeros(k, dtype=np.int64)
        for t in ray.get(table_refs(parts)):
            if t.num_rows == 0 or "cid" not in t.column_names:
                continue
            cid = t["cid"].to_numpy(zero_copy_only=False)
            np.add.at(n_tot, cid, t["n"].to_numpy(zero_copy_only=False))
            S_tot[cid] += np.asarray(t["s"].to_pylist(), dtype=np.int64)
        nz = n_tot > 0
        Cn = C.copy()
        # one rounding from exact integers — order-independent
        Cn[nz] = S_tot[nz].astype(np.float64) / n_tot[nz, None].astype(np.float64)
        C = Cn  # empty clusters keep their previous centroid
    return C


def cluster_assign(
    ds: rd.Dataset, vec_col: str, id_col: str, centroids: np.ndarray,
) -> rd.Dataset:
    """(id, cluster) per row — nearest-centroid assignment, one streaming
    column-pruned pass.  Rows with a NULL vector come back with
    ``cluster = NULL`` (they have no position in the space)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    id_type = ds.schema().base_schema.field(id_col).type

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=id_type),
                             "cluster": pa.array([], type=pa.int64())})
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type) or col.null_count == len(col):
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.nulls(batch.num_rows,
                                                 type=pa.int64())})
        if col.null_count:
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            a = assign_rows(
                _quantized(col.filter(pa.array(valid))).astype(np.float64), C)
            out = np.zeros(len(col), dtype=np.int64)
            out[valid] = a
            arr = pa.array(out, type=pa.int64(), mask=~valid)
        else:
            arr = pa.array(assign_rows(_quantized(col).astype(np.float64), C),
                           type=pa.int64())
        return pa.table({id_col: batch[id_col], "cluster": arr})

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow")


def embedding_neardup_pairs_clustered(
    ds: rd.Dataset, vec_col: str, id_col: str, centroids: np.ndarray, *,
    threshold: float = 0.9, vec_source=None, concurrency: int | None = None,
    max_cluster_occupancy: int | None = None,
) -> rd.Dataset:
    """SemDeDup's pair source proper: candidate pairs are ids sharing a
    k-means cluster, each verified by exact cosine ≥ ``threshold`` —
    O(Σ nᵢ²) over cluster sizes instead of the exact path's O(N²), with
    the cluster count k as the knob (SemDeDup uses k ≈ 10⁴ at web scale).

    Same machinery as the LSH pair source (stages/dedup.py): the exchange
    carries (id, int64 cluster) only, candidates come from the shared
    sort-based run generator, vectors are re-fetched per candidate id by
    the verify actor pool.  Approximate by partitioning — a true near-dup
    pair split across a cluster boundary is missed (pytest asserts recall
    vs the exact path; k=1 degenerates to the exact all-pairs output).

    Partitioning assumption: per-cluster candidate generation is quadratic
    in cluster size — pick k so clusters stay ≪ √(pair budget), or bound
    the damage with ``max_cluster_occupancy`` (hot clusters are skipped,
    like hot LSH buckets)."""
    from .dedup import (
        VerifyCosineStage,
        _candidate_pairs,
        _dedupe_pairs_min,
        _default_doc_source,
        _pool_size,
    )

    concurrency = _pool_size(concurrency)
    if vec_source is None:
        vec_source = _default_doc_source(ds, id_col, vec_col)
    keyed = cluster_assign(ds, vec_col, id_col, centroids).map_batches(
        lambda b: b.filter(pc.is_valid(b["cluster"])), batch_format="pyarrow")
    candidates = _candidate_pairs(keyed, id_col, "cluster",
                                  max_cluster_occupancy, dedupe=False)
    verified = candidates.map_batches(
        VerifyCosineStage,
        fn_constructor_kwargs={"source": vec_source, "id_col": id_col,
                               "vec_col": vec_col, "threshold": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, concurrency),
    )
    return _dedupe_pairs_min(verified, "cos_i4")
