"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch does one numpy matmul and emits its LOCAL
  top-k per query (partial top-k combiner), a final tiny merge picks the
  global top-k.  Per-batch work is O(batch × dim × n_queries) with zero
  shuffle — the scalable baseline.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH signs bucket
  the corpus (one groupby); queries probe only their own bucket (+ optional
  multi-probe).  Approximate; recall grows with planes/probes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def brute_force_topk(
    ds: rd.Dataset, vec_col: str, id_col: str, query_vecs: np.ndarray, k: int = 10,
    exclude_ids: set | None = None,
) -> pa.Table:
    """Exact cosine top-k for each query vector → (query_idx, id, cos_i4)."""
    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(Q)
    excl = exclude_ids or set()

    def partial_topk(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        M = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
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

    blocks = [ray.get(r) for r in ds.map_batches(partial_topk, batch_format="pyarrow").to_arrow_refs()]
    # Ray Data can pass empty input blocks through without calling the UDF —
    # drop any block that doesn't carry the UDF's output schema
    blocks = [b for b in blocks if b.num_rows and "cos" in b.column_names]
    if not blocks:
        return pa.table(
            {"query_idx": pa.array([], type=pa.int32()), id_col: pa.array([], type=pa.int64()),
             "cos_i4": pa.array([], type=pa.int64())}
        )
    parts = pa.concat_tables(blocks)
    # global merge: per query, top-k by (cos desc, id asc)
    out_tables = []
    for qi in range(len(Q)):
        mask = np.asarray(parts["query_idx"].to_pylist()) == qi
        sub = parts.filter(pa.array(mask))
        cos = np.asarray(sub["cos"].to_pylist())
        ids = np.asarray(sub[id_col].to_pylist())
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


def ivf_topk(
    ds: rd.Dataset, vec_col: str, id_col: str, query_vecs: np.ndarray, k: int = 10,
    n_lists: int = 8, n_probe: int = 2, train_sample: int = 1024, seed: int = 13,
    exclude_ids: set | None = None,
) -> pa.Table:
    """IVF ANN scale path: train coarse centroids on a sample, assign every
    batch to its nearest list (vectorized argmax — no shuffle), and score only
    the vectors whose list is among the query's ``n_probe`` closest lists."""
    sample_rows = ds.limit(train_sample).select_columns([vec_col]).take_all()
    sample = np.asarray([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_lite(sample, n_lists, seed=seed)
    c_ref = ray.put(cent)
    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_lists = set()
    for qi in range(len(Q)):
        sims = Q[qi] @ cent.T
        probe_lists.update(np.argsort(-sims)[:n_probe].tolist())

    def keep_probed(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        M = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        assign = np.argmax(M @ C.T, axis=1)
        return batch.filter(pa.array(np.isin(assign, list(probe_lists))))

    pruned = ds.map_batches(keep_probed, batch_format="pyarrow")
    return brute_force_topk(pruned, vec_col, id_col, query_vecs, k, exclude_ids)


def lsh_bucket_topk(
    ds: rd.Dataset, vec_col: str, id_col: str, query_vecs: np.ndarray, k: int = 10,
    n_planes: int = 8, seed: int = 11, exclude_ids: set | None = None,
) -> pa.Table:
    """Approximate top-k: sign-LSH bucket assignment (vectorized per batch),
    then exact scoring within the query's bucket only."""
    rng = np.random.default_rng(seed)
    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    planes = rng.standard_normal((Q.shape[1], n_planes))
    p_ref = ray.put(planes)
    q_buckets = ((Q @ planes) > 0).astype(np.uint8)
    q_keys = {int(np.packbits(q_buckets[i], bitorder="little")[0]) for i in range(len(Q))}

    def bucketize(batch: pa.Table) -> pa.Table:
        P = ray.get(p_ref)
        M = _normalize(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
        bits = ((M @ P) > 0).astype(np.uint8)
        keys = np.packbits(bits, axis=1, bitorder="little")[:, 0].astype(np.int32)
        keep = np.isin(keys, list(q_keys))
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(bucketize, batch_format="pyarrow")
    return brute_force_topk(pruned, vec_col, id_col, query_vecs, k, exclude_ids)
