"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch does one numpy matmul and emits its LOCAL
  top-k per query (partial top-k combiner), a final tiny merge picks the
  global top-k.  Per-batch work is O(batch × dim × n_queries) with zero
  shuffle — the scalable baseline.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH signs bucket
  the corpus (one groupby); queries probe only their own bucket (+ optional
  multi-probe).  Approximate; recall grows with planes/probes.
* ``IVFIndex`` — PERSISTED IVF: one corpus pass writes list-partitioned
  parquet + centroids; a query then reads only its probed partitions
  (~n_probe/n_lists of the bytes).  The serving shape for repeated queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ..functions.arrowutil import table_refs


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _matrix(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(n, dim) float64 matrix from a ``list<float>`` column — zero-copy
    flatten + reshape when the lists are uniform (the common case), instead
    of ``to_pylist`` (which builds n×dim Python floats)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray) and col.null_count == 0:
        # flatten() is offset-aware; .values would span a sliced array's
        # whole child buffer and misalign the reshape
        flat = np.asarray(col.flatten(), dtype=np.float64)
        return flat.reshape(len(col), col.type.list_size)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and col.null_count == 0:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        lengths = np.diff(offsets)
        if len(lengths) and (lengths == lengths[0]).all() and lengths[0] > 0:
            flat = np.asarray(col.values, dtype=np.float64)
            return flat[offsets[0]: offsets[-1]].reshape(len(col), int(lengths[0]))
    return np.asarray(col.to_pylist(), dtype=np.float64)


def brute_force_topk(
    ds: rd.Dataset, vec_col: str, id_col: str, query_vecs: np.ndarray, k: int = 10,
    exclude_ids: set | None = None,
) -> pa.Table:
    """Exact cosine top-k for each query vector → (query_idx, id, cos_i4).
    Accepts a single 1-D query vector or an (n_q, dim) matrix."""
    Q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(Q)
    excl = exclude_ids or set()

    def partial_topk(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        M = _normalize(_matrix(batch[vec_col]))
        sims = Qm @ M.T  # (n_q, n_batch)
        out_q, out_id, out_cos = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            kk = min(k + len(excl), len(ids))
            idx = np.argpartition(-row, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            for j in idx:
                if int(ids[j]) in excl:
                    continue
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_cos.append(row[j])
        return pa.table(
            {
                "query_idx": pa.array(out_q, type=pa.int32()),
                id_col: pa.array(out_id, type=pa.int64()),
                "cos": pa.array(out_cos, type=pa.float64()),
            }
        )

    blocks = [ray.get(r) for r in table_refs(
        ds.map_batches(partial_topk, batch_format="pyarrow"))]
    # Ray Data can pass empty input blocks through without calling the UDF —
    # drop any block that doesn't carry the UDF's output schema
    blocks = [b for b in blocks if b.num_rows and "cos" in b.column_names]
    if not blocks:
        return pa.table(
            {"query_idx": pa.array([], type=pa.int32()), id_col: pa.array([], type=pa.int64()),
             "cos_i4": pa.array([], type=pa.int64())}
        )
    parts = pa.concat_tables(blocks)
    # global merge: per query, top-k by (cos desc, id asc) — convert ONCE,
    # slice per query with numpy masks (no per-query Arrow→Python round trip)
    all_q = parts["query_idx"].to_numpy(zero_copy_only=False)
    all_cos = parts["cos"].to_numpy(zero_copy_only=False)
    all_ids = parts[id_col].to_numpy(zero_copy_only=False)
    out_tables = []
    for qi in range(len(Q)):
        m = all_q == qi
        cos = all_cos[m]
        ids = all_ids[m]
        order = np.lexsort((ids, -cos))[:k]
        out_tables.append(
            pa.table(
                {
                    "query_idx": pa.array(np.full(len(order), qi, dtype=np.int32)),
                    id_col: pa.array(ids[order], type=pa.int64()),
                    "cos_i4": pa.array(np.floor(cos[order] * 10000 + 0.5).astype(np.int64)),
                }
            )
        )
    return pa.concat_tables(out_tables)


def _sign_keys(bits: np.ndarray) -> np.ndarray:
    """uint64 bucket key from an (n, n_planes ≤ 64) sign-bit matrix — folds
    ALL packed bytes (np.packbits(...)[:, 0] would silently ignore planes
    past the first 8)."""
    if bits.shape[1] > 64:
        raise ValueError("at most 64 hyperplanes per key")
    packed = np.packbits(bits, axis=1, bitorder="little")
    out = np.zeros(len(bits), dtype=np.uint64)
    for i in range(packed.shape[1]):
        out |= packed[:, i].astype(np.uint64) << np.uint64(8 * i)
    return out


def kmeans_lite(sample: np.ndarray, k: int, iters: int = 8, seed: int = 13) -> np.ndarray:
    """Deterministic seeded k-means (numpy, few iterations) for IVF coarse
    quantization — trains on a driver-side sample, centroids broadcast."""
    rng = np.random.default_rng(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    cent = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def _train_sample_vectors(ds: rd.Dataset, vec_col: str, id_col: str,
                          train_sample: int) -> np.ndarray:
    """UNBIASED deterministic k-means training sample: per-batch bottom-k by
    a hash of the id (hash order statistics = a uniform sample without
    replacement, independent of how the corpus is sorted or partitioned),
    then one tiny distributed sort picks the global bottom ``train_sample``.

    Replaces ``ds.limit(train_sample)``: the FIRST blocks of a sorted /
    partitioned corpus are one biased corner of the vector space — centroids
    trained there skew list occupancy (probe-all stays correct, which is why
    an exactness oracle can't see the skew)."""
    from pandas.util import hash_array

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # to_numpy: zero-copy int64 for integer ids, object array for strings
        # — hash_array vectorizes both.  The int64 VIEW is the one total
        # order used both here and by the global sort: selecting locally in
        # uint64 order but sorting globally in int64 order would keep the
        # wrong local winners (only small blocks would contribute negative-
        # int64 hashes — exactly the bias this sampler exists to remove)
        h = hash_array(ids.to_numpy(zero_copy_only=False),
                       categorize=False).view(np.int64)
        vecs = batch[vec_col]
        if len(h) > train_sample:
            idx = np.argpartition(h, train_sample - 1)[:train_sample]
            h = h[idx]
            vecs = vecs.take(pa.array(idx))
        return pa.table({"__h": pa.array(h, type=pa.int64()),
                         vec_col: vecs})

    from .dedup import _drop_empty_blocks

    keyed = _drop_empty_blocks(
        ds.select_columns([id_col, vec_col]).map_batches(bottomk, batch_format="pyarrow"))
    if keyed.count() == 0:  # empty corpus — callers fall back / raise
        return np.empty(0, dtype=np.float64)
    rows = keyed.sort("__h").limit(train_sample).take_all()
    return np.asarray([r[vec_col] for r in rows], dtype=np.float64)


def ivf_topk(
    ds: rd.Dataset, vec_col: str, id_col: str, query_vecs: np.ndarray, k: int = 10,
    n_lists: int = 8, n_probe: int = 2, train_sample: int = 1024, seed: int = 13,
    exclude_ids: set | None = None,
) -> pa.Table:
    """IVF ANN scale path: train coarse centroids on a sample, assign every
    batch to its nearest list (vectorized argmax — no shuffle), and score only
    the vectors whose list is among the query's ``n_probe`` closest lists."""
    sample = _train_sample_vectors(ds, vec_col, id_col, train_sample)
    if sample.size == 0:  # empty corpus → empty result, not an AxisError
        return brute_force_topk(ds, vec_col, id_col, query_vecs, k, exclude_ids)
    cent = kmeans_lite(sample, n_lists, seed=seed)
    c_ref = ray.put(cent)
    Q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probe_lists = set()
    for qi in range(len(Q)):
        sims = Q[qi] @ cent.T
        probe_lists.update(np.argsort(-sims)[:n_probe].tolist())

    def keep_probed(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        M = _normalize(_matrix(batch[vec_col]))
        assign = np.argmax(M @ C.T, axis=1)
        return batch.filter(pa.array(np.isin(assign, list(probe_lists))))

    pruned = ds.map_batches(keep_probed, batch_format="pyarrow")
    return brute_force_topk(pruned, vec_col, id_col, query_vecs, k, exclude_ids)


def _fnv1a_str(s: str) -> int:
    """Scalar FNV-1a-64 over codepoints — the same fold the DuckDB oracles
    re-express in HUGEINT mod-2^64 arithmetic (driver_api._fnv_sql)."""
    h = 0xCBF29CE484222325
    for ch in s:
        h = ((h ^ ord(ch)) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) hyperplane matrix (dim, n_planes):
    entry sign = bit 32 of FNV-1a("d|p|seed").  Sign-random-projection with
    ±1 entries is a standard angular LSH; hash-derived entries make the
    bucketing machine- and library-independent AND re-expressible in SQL,
    so the whole approximate operator is oracle-checkable."""
    W = np.empty((dim, n_planes), dtype=np.int64)
    for d in range(dim):
        for p in range(n_planes):
            W[d, p] = 1 if (_fnv1a_str(f"{d}|{p}|{seed}") >> 32) & 1 else -1
    return W


def quantize_i4(M: np.ndarray) -> np.ndarray:
    """Round-half-up ×10⁴ integer quantization — signatures computed on
    integers are exact (no float-summation-order dependence between numpy
    matmul and a SQL oracle's sequential sum)."""
    return np.floor(M * 10000 + 0.5).astype(np.int64)


def lsh_bucket_topk(
    ds: rd.Dataset, vec_col: str, id_col: str, query_vecs: np.ndarray, k: int = 10,
    n_planes: int = 8, seed: int = 11, exclude_ids: set | None = None,
) -> pa.Table:
    """Approximate top-k: sign-LSH bucket assignment (vectorized per batch),
    then exact scoring within the query's bucket only.

    Signatures are sign(quantize_i4(raw_vec) @ hash_planes) — integer
    arithmetic on hash-derived ±1 planes, so bucket membership is bit-exact
    reproducible (scaling never changes a dot product's sign, so skipping
    normalization here is exact, not an approximation)."""
    Qraw = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    planes = hash_planes(Qraw.shape[1], n_planes, seed)
    p_ref = ray.put(planes)
    q_bits = ((quantize_i4(Qraw) @ planes) > 0).astype(np.uint8)
    q_keys = np.unique(_sign_keys(q_bits))

    def bucketize(batch: pa.Table) -> pa.Table:
        P = ray.get(p_ref)
        M = quantize_i4(_matrix(batch[vec_col]))
        bits = ((M @ P) > 0).astype(np.uint8)
        keep = np.isin(_sign_keys(bits), q_keys)
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(bucketize, batch_format="pyarrow")
    return brute_force_topk(pruned, vec_col, id_col, query_vecs, k, exclude_ids)


class IVFIndex:
    """PERSISTED IVF index: centroids + the corpus partitioned by nearest
    list, written once, probed many times.

    ``ivf_topk`` re-assigns the whole corpus per query call; the persisted
    form is the serving shape — build pays the one corpus pass, and a query
    then reads ONLY its ``n_probe`` list partitions (Parquet directory
    pruning), i.e. ~n_probe/n_lists of the bytes.  At 100 TB that
    partition-pruned read is the difference between an ANN query and a full
    corpus scan.

    Layout (all under ``index_dir``):
      meta.json                         {vec_col, id_col, n_lists, dim, seed}
      centroids.parquet                 one row per list: (ivf_list, centroid)
      lists/ivf_list=<i>/*.parquet      (id_col, vec_col) rows of that list
    """

    def __init__(self, index_dir: str):
        import json
        import os

        import pyarrow.parquet as pq

        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        cent = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        order = np.argsort(np.asarray(cent["ivf_list"].to_pylist()))
        self.centroids = _matrix(cent["centroid"])[order]
        self.index_dir = index_dir
        self.vec_col = self.meta["vec_col"]
        self.id_col = self.meta["id_col"]

    @staticmethod
    def build(ds: rd.Dataset, vec_col: str, id_col: str, index_dir: str,
              n_lists: int = 8, train_sample: int = 1024, seed: int = 13) -> "IVFIndex":
        import json
        import os

        sample = _train_sample_vectors(ds, vec_col, id_col, train_sample)
        if sample.size == 0:
            raise ValueError("IVFIndex.build: dataset has no vectors")
        cent = kmeans_lite(sample, n_lists, seed=seed)
        c_ref = ray.put(cent)

        def assign(batch: pa.Table) -> pa.Table:
            C = ray.get(c_ref)
            M = _normalize(_matrix(batch[vec_col]))
            lst = np.argmax(M @ C.T, axis=1).astype(np.int32)
            return batch.append_column("ivf_list", pa.array(lst))

        import shutil

        lists_dir = os.path.join(index_dir, "lists")
        # meta.json is written LAST (the commit point).  On rebuild, retract
        # the PREVIOUS commit first — otherwise a crash mid-rebuild leaves a
        # stale meta.json marking the half-written index as committed
        for f in ("meta.json", "centroids.parquet"):
            fp_ = os.path.join(index_dir, f)
            if os.path.exists(fp_):
                os.remove(fp_)
        if os.path.exists(lists_dir):
            shutil.rmtree(lists_dir)
        os.makedirs(index_dir, exist_ok=True)
        ds.select_columns([id_col, vec_col]) \
          .map_batches(assign, batch_format="pyarrow") \
          .write_parquet(lists_dir, partition_cols=["ivf_list"])
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({
                "ivf_list": pa.array(np.arange(len(cent), dtype=np.int32)),
                "centroid": pa.array([c.tolist() for c in cent],
                                     type=pa.list_(pa.float64())),
            }),
            os.path.join(index_dir, "centroids.parquet"))
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump({"vec_col": vec_col, "id_col": id_col,
                       "n_lists": int(len(cent)), "dim": int(cent.shape[1]),
                       "seed": seed}, f)
        return IVFIndex(index_dir)

    def probe_paths(self, query_vecs: np.ndarray, n_probe: int = 2) -> list[str]:
        """The list-partition directories a query set must read."""
        import os

        Q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
        probe: set[int] = set()
        for qi in range(len(Q)):
            sims = Q[qi] @ self.centroids.T
            probe.update(np.argsort(-sims)[:n_probe].tolist())
        paths = [os.path.join(self.index_dir, "lists", f"ivf_list={i}")
                 for i in sorted(probe)]
        return [p for p in paths if os.path.isdir(p)]

    def topk(self, query_vecs: np.ndarray, k: int = 10, n_probe: int = 2,
             exclude_ids: set | None = None) -> pa.Table:
        import glob
        import os

        dirs = self.probe_paths(query_vecs, n_probe)
        # expand to files: ray.data read_parquet accepts ONE directory or a
        # list of FILES, not a list of directories (2.49)
        files = sorted(f for d in dirs
                       for f in glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            return pa.table({"query_idx": pa.array([], type=pa.int32()),
                             self.id_col: pa.array([], type=pa.int64()),
                             "cos_i4": pa.array([], type=pa.int64())})
        probed = rd.read_parquet(files, columns=[self.id_col, self.vec_col])
        return brute_force_topk(probed, self.vec_col, self.id_col,
                                query_vecs, k, exclude_ids)


# exact-path pool ceiling, matching the similarity-join doc store's
# broadcast cap (stages/dedup.py): above it, refuse loudly and point at the
# scale path instead of letting per-actor pool copies exhaust the heap
KNN_POOL_CAP = 200_000


def knn_join(
    queries: rd.Dataset, vec_col: str, id_col: str, k: int = 5, *,
    pool: rd.Dataset | None = None, concurrency=(1, 8),
) -> rd.Dataset:
    """kNN self/semi-join: for EACH query row, its exact top-k cosine
    neighbors from ``pool`` (default: the query dataset itself — a true
    self-join; the query row never matches itself, by id).  The primitive
    behind semantic dedup clustering and "nearest training doc" audits.

    Output columns: ``(id_col, rank, neighbor_id, cos_i4)`` — rank 1..k by
    (cosine desc, neighbor id asc); cosine round-half-up ×10⁴ (oracle-exact
    vs DuckDB ``list_cosine_similarity``).

    Shape: the pool's ``(id, vector)`` blocks stay in the OBJECT STORE
    (block refs — never collected on the driver); each ``map_batches`` task
    normalizes once per actor, scores its query batch with ONE numpy matmul
    and selects per-row top-k via argpartition + a single whole-batch
    lexsort (no per-row Python).  Work is O(|Q|·|pool|/B) per task, memory
    O(|pool|·dim) shared via the object store — the oracle-grade exact
    path; at corpus scale route through ``IVFIndex`` (partition-pruned) or
    ``lsh_bucket_topk`` (banded sign-LSH) instead."""
    src = pool if pool is not None else queries
    mat = src.select_columns([id_col, vec_col]).materialize()
    n_pool = mat.count()
    if n_pool > KNN_POOL_CAP:
        # every actor concat-materializes the full pool in __init__ — above
        # the cap that's heap-sized × concurrency, not a kNN join anymore
        raise ValueError(
            f"knn_join: pool has {n_pool} rows > {KNN_POOL_CAP} — the exact "
            f"path holds the whole pool per actor; at this scale build a "
            f"persisted IVFIndex and use knn_join_ivf (partition-pruned "
            f"probes), or lsh_bucket_topk for ad-hoc top-k")
    refs_handle = ray.put(table_refs(mat))
    id_type = queries.schema().base_schema.field(id_col).type

    class KnnBlock:
        def __init__(self):
            tables = [t for t in ray.get(ray.get(refs_handle)) if t.num_rows]
            tbl = pa.concat_tables(tables)
            ids = np.asarray(tbl[id_col].to_pylist())
            order = np.argsort(ids)
            self.ids = ids[order]
            self.Mn = _normalize(_matrix(tbl[vec_col])[order])

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch[id_col].to_pylist())
            nb = len(bids)
            sims = _normalize(_matrix(batch[vec_col])) @ self.Mn.T
            # self-exclusion by id equality (no-op for disjoint pools)
            pos = np.searchsorted(self.ids, bids)
            inb = pos < len(self.ids)
            hit = np.zeros(nb, dtype=bool)
            hit[inb] = self.ids[pos[inb]] == bids[inb]
            sims[np.nonzero(hit)[0], pos[hit]] = -np.inf
            kk = min(k, sims.shape[1] - 1) if sims.shape[1] > 1 else 0
            if kk <= 0:
                return pa.table({id_col: pa.array([], type=id_type),
                                 "rank": pa.array([], type=pa.int64()),
                                 "neighbor_id": pa.array([], type=id_type),
                                 "cos_i4": pa.array([], type=pa.int64())})
            idx = (np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                   if kk < sims.shape[1] else
                   np.broadcast_to(np.arange(kk), (nb, kk)).copy())
            part = np.take_along_axis(sims, idx, axis=1)
            nid = self.ids[idx]
            # one whole-batch lexsort orders every row's k candidates by
            # (cos desc, neighbor id asc) without a per-row Python loop
            rowkey = np.repeat(np.arange(nb), kk)
            flat = np.lexsort((nid.ravel(), -part.ravel(), rowkey))
            return pa.table({
                id_col: pa.array(np.repeat(bids, kk), type=id_type),
                "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64), nb)),
                "neighbor_id": pa.array(nid.ravel()[flat], type=id_type),
                "cos_i4": pa.array(quantize_i4(part.ravel()[flat])),
            })

    return queries.map_batches(KnnBlock, batch_format="pyarrow",
                               concurrency=concurrency)


def knn_join_ivf(
    queries: rd.Dataset, index_dir: str, k: int = 5, n_probe: int = 2, *,
    concurrency=(1, 8),
) -> rd.Dataset:
    """kNN join via the PERSISTED IVF index — the scale path for
    ``knn_join``.  For each query row: pick its ``n_probe`` nearest
    centroids, score ONLY those list partitions, merge per-row top-k.

    Same output contract as ``knn_join`` (``(id_col, rank, neighbor_id,
    cos_i4)``, rank by cos desc / neighbor id asc, ×10⁴ round-half-up);
    with ``n_probe = n_lists`` the result is EXACTLY the brute-force join
    (every partition is read), which is what the hard SQL oracle checks —
    the pruned n_probe<n_lists path is recall-tested in pytest.

    Shape: each actor loads centroids once in ``__init__`` and caches list
    partitions lazily as its query batches probe them (cache is bounded by
    the lists this actor ever probes — at serving n_probe, a skewed query
    stream touches few).  Per batch the rows probing a given list are
    scored with ONE matmul against that list's matrix; candidates from all
    probed lists merge with a single whole-batch lexsort.  Lists partition
    the pool, so a neighbor can appear at most once per query — no dedup
    pass.  Work per batch is O(|Q|·(probed bytes)/B) instead of
    O(|Q|·|pool|/B): at 100 TB the n_probe/n_lists read fraction is the
    operator."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    id_type = queries.schema().base_schema.field(
        IVFIndex(index_dir).id_col).type

    class KnnIvfBlock:
        def __init__(self):
            idx = IVFIndex(index_dir)
            self.cent = idx.centroids
            self.id_col, self.vec_col = idx.id_col, idx.vec_col
            self.lists_dir = _os.path.join(index_dir, "lists")
            self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def _list(self, li: int) -> tuple[np.ndarray, np.ndarray]:
            got = self._cache.get(li)
            if got is None:
                files = sorted(_glob.glob(_os.path.join(
                    self.lists_dir, f"ivf_list={li}", "*.parquet")))
                if not files:
                    got = (np.empty(0, dtype=object),
                           np.empty((0, self.cent.shape[1])))
                else:
                    t = pa.concat_tables([
                        _pq.read_table(f, columns=[self.id_col, self.vec_col])
                        for f in files])
                    got = (np.asarray(t[self.id_col].to_pylist()),
                           _normalize(_matrix(t[self.vec_col])))
                self._cache[li] = got
            return got

        def _empty(self) -> pa.Table:
            return pa.table({self.id_col: pa.array([], type=id_type),
                             "rank": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=id_type),
                             "cos_i4": pa.array([], type=pa.int64())})

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch[self.id_col].to_pylist())
            nb = len(bids)
            if nb == 0:
                return self._empty()
            Qn = _normalize(_matrix(batch[self.vec_col]))
            simc = Qn @ self.cent.T  # (nb, n_lists)
            npb = min(n_probe, simc.shape[1])
            probe = (np.argpartition(-simc, npb - 1, axis=1)[:, :npb]
                     if npb < simc.shape[1] else
                     np.broadcast_to(np.arange(simc.shape[1]), simc.shape))
            cr, ci, cc = [], [], []
            for li in np.unique(probe):
                rows = np.nonzero((probe == li).any(axis=1))[0]
                ids, M = self._list(int(li))
                if not len(ids):
                    continue
                sims = Qn[rows] @ M.T
                # k+1 local survivors so self-exclusion can't starve a row
                kk = min(k + 1, sims.shape[1])
                idx = (np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                       if kk < sims.shape[1] else
                       np.broadcast_to(np.arange(kk),
                                       (len(rows), kk)).copy())
                cr.append(np.repeat(rows, kk))
                ci.append(ids[idx].ravel())
                cc.append(np.take_along_axis(sims, idx, axis=1).ravel())
            if not cr:
                return self._empty()
            row = np.concatenate(cr)
            nid = np.concatenate(ci)
            cos = np.concatenate(cc)
            keep = nid != bids[row]  # self-exclusion by id equality
            row, nid, cos = row[keep], nid[keep], cos[keep]
            if not len(row):
                return self._empty()
            # one whole-batch lexsort + vectorized rank-within-row → top-k
            order = np.lexsort((nid, -cos, row))
            r = row[order]
            newgrp = np.r_[True, r[1:] != r[:-1]]
            starts = np.flatnonzero(newgrp)
            rank = (np.arange(len(r))
                    - starts[np.cumsum(newgrp) - 1]).astype(np.int64)
            keep2 = rank < k
            return pa.table({
                self.id_col: pa.array(bids[r[keep2]], type=id_type),
                "rank": pa.array(rank[keep2] + 1),
                "neighbor_id": pa.array(nid[order][keep2], type=id_type),
                "cos_i4": pa.array(quantize_i4(cos[order][keep2])),
            })

    return queries.map_batches(KnnIvfBlock, batch_format="pyarrow",
                               concurrency=concurrency)
