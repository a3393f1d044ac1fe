"""Distributed k-means (stages/clustering.py): determinism across block
geometry, single-node reference identity, empty-cluster/NULL edge cases,
and the cluster-scoped SemDeDup pair source's exact-path containment."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
K, ITERS, SEED = 10, 2, 29


def _emb_ds(columns=("vec_id", "embedding")):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=list(columns))


def _reference_kmeans(M, ids, k, iters, seed):
    """Independent single-process re-derivation of the spec: quantize ×10⁴,
    seeds = bottom-k by (splitmix64(fnv('{seed}|{id}')), id), Lloyd with
    exact integer sums and dim-by-dim left-to-right float64 distances."""
    from project_gutenberg_full_text_search_ray.functions.textstats import (
        mix64, token_hashes)

    h = mix64(token_hashes([f"{seed}|{v}" for v in ids]))
    order = np.lexsort((ids, h))[:k]
    Xq = np.floor(M * 10000 + 0.5).astype(np.int64)
    Xf = Xq.astype(np.float64)
    C = Xq[order].astype(np.float64)

    def assign(C):
        D = np.zeros((len(Xq), k), dtype=np.float64)
        for d in range(M.shape[1]):
            diff = Xf[:, d, None] - C[None, :, d]
            D += diff * diff
        return np.argmin(D, axis=1)

    for _ in range(iters):
        a = assign(C)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = Xq[m].sum(axis=0).astype(np.float64) / float(m.sum())
    return C, assign(C)


def test_kmeans_matches_reference_and_block_geometry(ray_session):
    """Distributed result == single-process reference, bit-for-bit, and
    invariant under repartitioning (the integer-sum determinism claim)."""
    from project_gutenberg_full_text_search_ray.stages.clustering import (
        cluster_assign, kmeans_train)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    C_ref, a_ref = _reference_kmeans(M, ids, K, ITERS, SEED)

    ds = _emb_ds()
    C1 = kmeans_train(ds, "embedding", "vec_id", K, iters=ITERS, seed=SEED)
    C2 = kmeans_train(ds.repartition(17), "embedding", "vec_id", K,
                      iters=ITERS, seed=SEED)
    assert np.array_equal(C1, C2)
    assert np.array_equal(C1, C_ref)

    out = (cluster_assign(ds, "embedding", "vec_id", C1)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    got = out["cluster"].to_numpy()
    assert np.array_equal(got, a_ref[np.argsort(ids, kind="stable")])
    assert len(np.unique(got)) > 1  # the fixture actually partitions


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """k > distinct points: the starved cluster holds its previous centroid
    instead of collapsing to NaN (both sides of the SQL oracle's COALESCE)."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.clustering import (
        kmeans_train)

    # 3 distinct points, each duplicated — k=4 cannot fill every cluster
    base = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    vecs = [v for v in base for _ in range(2)]
    t = pa.table({"vec_id": list(range(6)),
                  "embedding": pa.array(vecs, type=pa.list_(pa.float32()))})
    C = kmeans_train(rd.from_arrow(t), "embedding", "vec_id", 4,
                     iters=2, seed=SEED)
    assert C.shape == (4, 2)
    assert np.isfinite(C).all()
    # every surviving centroid sits on one of the quantized input points
    q = np.floor(np.asarray(base) * 10000 + 0.5)
    assert all(any(np.array_equal(c, p) for p in q) for c in C)


def test_kmeans_k_exceeds_corpus_raises(ray_session):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.clustering import (
        kmeans_train)

    t = pa.table({"vec_id": [0, 1],
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                        type=pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="exceeds the corpus"):
        kmeans_train(rd.from_arrow(t), "embedding", "vec_id", 3)


def test_cluster_assign_null_vectors(ray_session):
    """NULL embeddings come back with cluster = NULL; valid rows are
    assigned normally and training skips the NULL rows."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.clustering import (
        cluster_assign, kmeans_train)

    t = pa.table({
        "vec_id": [0, 1, 2, 3],
        "embedding": pa.array([[1.0, 0.0], None, [-1.0, 0.0], None],
                              type=pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    C = kmeans_train(ds, "embedding", "vec_id", 2, iters=1, seed=SEED)
    out = (cluster_assign(ds, "embedding", "vec_id", C)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert out["cluster"].isna().tolist() == [False, True, False, True]
    assert out["cluster"][0] != out["cluster"][2]


def test_clustered_pairs_k1_equals_exact(ray_session):
    """k=1 puts every id in one cluster → the clustered pair source must
    reproduce the exact all-pairs output row-for-row (same verify kernel,
    same quantized scores)."""
    from project_gutenberg_full_text_search_ray.stages.clustering import (
        embedding_neardup_pairs_clustered, kmeans_train)
    from project_gutenberg_full_text_search_ray.stages.dedup import (
        embedding_neardup_pairs)

    ds = _emb_ds()
    exact = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                    threshold=0.45).to_pandas()
    C = kmeans_train(ds, "embedding", "vec_id", 1, iters=1, seed=SEED)
    got = (embedding_neardup_pairs_clustered(
        ds, "embedding", "vec_id", C, threshold=0.45)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(exact) > 0
    assert got[["id_a", "id_b", "cos_i4"]].values.tolist() == \
        exact[["id_a", "id_b", "cos_i4"]].values.tolist()


def test_clustered_pairs_subset_of_exact(ray_session):
    """Cluster partitioning can only MISS pairs, never invent them: every
    clustered pair is exact-cosine verified, so the k=10 output is a subset
    of the exact threshold pairs with identical scores."""
    from project_gutenberg_full_text_search_ray.stages.clustering import (
        embedding_neardup_pairs_clustered, kmeans_train)
    from project_gutenberg_full_text_search_ray.stages.dedup import (
        embedding_neardup_pairs)

    ds = _emb_ds()
    exact = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                    threshold=0.45).to_pandas()
    exact_map = {(a, b): c for a, b, c in
                 zip(exact["id_a"], exact["id_b"], exact["cos_i4"])}
    C = kmeans_train(ds, "embedding", "vec_id", K, iters=ITERS, seed=SEED)
    got = embedding_neardup_pairs_clustered(
        ds, "embedding", "vec_id", C, threshold=0.45).to_pandas()
    for a, b, c in zip(got["id_a"], got["id_b"], got["cos_i4"]):
        assert exact_map.get((a, b)) == c
