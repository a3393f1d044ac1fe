"""Incremental snapshot dedup — dedupe a NEW corpus snapshot against an
EXISTING corpus via persisted MinHash fingerprint stores, without ever
re-reading the old corpus's text.

This is how web-scale pipelines actually run dedup across crawls: each
snapshot's signatures + LSH band keys are built once and kept
(`build_minhash_store`); deduping snapshot N against snapshots 0..N−1
probes their stores (`snapshot_dedup_pairs`) — the old TEXT never moves
again, only its 8-byte band keys and 512-byte signatures.  The
in-corpus analog (`dedup.minhash_lsh_pairs`) verifies candidates with
true shingle Jaccard against a doc store; across snapshots the verify
is the standard MinHash ESTIMATE instead (fraction of agreeing
signature entries — Broder 1997), precisely so no text fetch is
needed.  Reference anchor: the reference's "index over the whole
corpus" discipline (mv_books_dc.sql — never rescan what is already
indexed), applied to dedup state.

Store layout (one directory per snapshot):

- ``manifest.json`` — {num_perm, bands, k_shingle, seed}: two stores
  are comparable iff these match; `snapshot_dedup_pairs` refuses
  mismatched stores loudly.
- ``sigs/*.parquet`` — (id, sig list<uint64>[num_perm]).
- ``bands/*.parquet`` — (band_key int64, id), sorted by band_key so
  probes prune row groups.

Determinism/oracle contract: signatures are the exact seeded Mersenne
mulmod minima the in-corpus operator shares (bit-identical to the
DuckDB HUGEINT oracle), band keys are the exact
``(band << 58) | (xor-mix & mask58)`` packing (`dedup.band_key_matrix`
— the SQL twin replays the same packing, so the candidate SET matches
exactly, unlike the in-corpus oracle where banding only needs to be
recall-safe), and the estimate is an integer agreement count over
``num_perm`` entries — every comparison both sides make is exact.

Shape at 100 TB: store build is one streaming signature pass + one
sort of (band_key, id) rows (24 B/row × bands — the only exchange);
probing joins the two band tables on band_key (hash exchange of key+id
rows only), verifies candidate pairs in an actor pool fetching
signatures by id from the column-pruned sig stores, and nothing
corpus-sized ever reaches the driver."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer
from .dedup import (
    DocFetcher,
    MinHashStage,
    _dedupe_pairs_min,
    _join_args,
    _pool_size,
    apply_dedup,
    band_key_matrix,
)

SCORE_SCALE = 10_000  # est_i4 quantization, the dedup-family convention


def build_minhash_store(
    ds: rd.Dataset, text_col: str, id_col: str, store_dir: str, *,
    num_perm: int = 64, bands: int = 16, k_shingle: int = 3, seed: int = 7,
    analyzer: Analyzer = DEFAULT_ANALYZER, concurrency: int | None = None,
) -> dict:
    """Build a snapshot's fingerprint store: one streaming MinHash pass →
    ``sigs/`` parquet, then one band explode + sort → ``bands/`` parquet,
    then the manifest (written LAST — a crashed build leaves no manifest,
    so a half-written store is never probed).  Returns the manifest."""
    if analyzer is not DEFAULT_ANALYZER:
        raise ValueError(
            "build_minhash_store pins the default analyzer: the manifest "
            "records only hash params, so a custom analyzer would produce "
            "stores that compare as compatible but hash different tokens")
    concurrency = _pool_size(concurrency)
    _clear_store_dir(store_dir)
    sig_dir = os.path.join(store_dir, "sigs")
    band_dir = os.path.join(store_dir, "bands")
    ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage, fn_constructor_kwargs={
            "text_col": text_col, "id_col": id_col,
            "num_perm": num_perm, "k": k_shingle, "seed": seed},
        batch_format="pyarrow", concurrency=(1, concurrency),
    ).write_parquet(sig_dir)

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch["sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        n = len(sig)
        if n == 0:
            return pa.table({"band_key": pa.array([], type=pa.int64()),
                             id_col: batch[id_col]})
        flat = sig.flatten().to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False)
        keys = band_key_matrix(flat, n, num_perm, bands)
        take = pa.array(np.repeat(np.arange(n), bands))
        return pa.table({"band_key": pa.array(keys, type=pa.int64()),
                         id_col: batch[id_col].take(take)})

    (rd.read_parquet(sig_dir)
     .map_batches(explode, batch_format="pyarrow")
     .sort("band_key")
     .write_parquet(band_dir))
    manifest = {"num_perm": num_perm, "bands": bands,
                "k_shingle": k_shingle, "seed": seed, "id_col": id_col}
    with open(os.path.join(store_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


_STORE_ENTRIES = {"sigs", "bands", "vecs", "manifest.json"}


def _clear_store_dir(store_dir: str) -> None:
    """Reset the build target: Ray's ``write_parquet`` APPENDS UUID-named
    files, so rebuilding into a dir holding a crashed attempt's partial
    output would merge stale rows under a fresh manifest — DocFetcher
    would then return an arbitrary one of two rows per id, silently.
    The manifest-written-LAST contract only works if the builder starts
    from nothing.  Refuses to delete a directory that doesn't look like
    a (possibly partial) store — a typo'd ``store_dir`` must not erase
    arbitrary data."""
    import shutil

    if not os.path.exists(store_dir):
        return
    extra = set(os.listdir(store_dir)) - _STORE_ENTRIES
    if extra:
        raise ValueError(
            f"refusing to rebuild into {store_dir}: it contains non-store "
            f"entries {sorted(extra)[:5]} — pass an empty/new directory or "
            f"a previous store")
    shutil.rmtree(store_dir, ignore_errors=True)


def _load_manifest(store_dir: str) -> dict:
    path = os.path.join(store_dir, "manifest.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{store_dir} is not a finished fingerprint store (no "
            f"manifest.json — interrupted build_minhash_store?)")
    with open(path) as f:
        return json.load(f)


class VerifySigAgreementStage:
    """Actor stage: estimated-Jaccard verify of (id_a=new, id_b=old)
    candidate pairs against the two signature stores.  Fetches only the
    batch's candidate signatures (column-pruned, row-group-pushdown
    parquet reads), compares all pairs in one (m, num_perm) equality —
    agreement counts are exact integers, ``est_i4 =
    floor(agree / num_perm · 10⁴ + 0.5)``."""

    def __init__(self, new_sigs: str, old_sigs: str, id_col: str,
                 num_perm: int, threshold: float):
        self.new = DocFetcher(_parquet_files(new_sigs), id_col, ["sig"])
        self.old = DocFetcher(_parquet_files(old_sigs), id_col, ["sig"])
        self.num_perm = num_perm
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=batch["id_a"].type),
                          "id_b": pa.array([], type=batch["id_b"].type),
                          "est_i4": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        a_ids = batch["id_a"].to_pylist()
        b_ids = batch["id_b"].to_pylist()
        a_sig = self.new.fetch(set(a_ids))
        b_sig = self.old.fetch(set(b_ids))
        A = np.asarray([a_sig[i] for i in a_ids], dtype=np.uint64)
        B = np.asarray([b_sig[i] for i in b_ids], dtype=np.uint64)
        agree = (A == B).sum(axis=1).astype(np.int64)
        # exact: num_perm is a small power of two, agree ≤ num_perm — both
        # the division and the ×10⁴ round-trip are float64-exact, and the
        # SQL twin evaluates the same expressions
        frac = agree.astype(np.float64) / self.num_perm
        keep = frac >= self.threshold
        est = np.floor(frac * SCORE_SCALE + 0.5).astype(np.int64)
        return pa.table({"id_a": batch["id_a"].filter(pa.array(keep)),
                         "id_b": batch["id_b"].filter(pa.array(keep)),
                         "est_i4": pa.array(est[keep])})


def _parquet_files(path: str) -> list[str]:
    import glob

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    return files


def _store_id_type(store: str, subdir: str, id_col: str):
    import pyarrow.parquet as pq

    return pq.read_schema(
        _parquet_files(os.path.join(store, subdir))[0]).field(id_col).type


def _probe_band_stores(
    new_store: str, old_store: str, id_col: str,
    max_bucket_occupancy: int | None,
) -> rd.Dataset | None:
    """Shared probe: join the two stores' band tables on band_key →
    (id_a=new, id_b=old) candidate rows, with the hot-bucket occupancy
    cap applied per side first.  Returns ``None`` when the capped join
    is provably empty (an all-hot side leaves only map-produced empty
    blocks, which Ray's hash join cannot key — and the result is
    definitionally empty anyway; the count guard costs one scan of the
    already-filtered 16 B/row band tables, paid only on this rare
    path)."""
    import pyarrow.compute as pc

    def side(store: str, out_id: str) -> rd.Dataset:
        b = rd.read_parquet(os.path.join(store, "bands"))
        return b.map_batches(
            lambda t, oi=out_id: pa.table({"band_key": t["band_key"],
                                           oi: t[id_col]}),
            batch_format="pyarrow")

    new_b, old_b = side(new_store, "id_a"), side(old_store, "id_b")
    if max_bucket_occupancy is not None:
        hot = []
        for b in (new_b, old_b):
            # the per-key count table is bands × docs distinct keys — filter
            # vectorized per block, collect only the (rare) hot keys
            hot_t = b.groupby("band_key").count().map_batches(
                lambda t, c=max_bucket_occupancy:
                    t.filter(pc.greater(t["count()"], c))
                    .select(["band_key"]),
                batch_format="pyarrow")
            df = hot_t.to_pandas()
            if len(df) and "band_key" in df.columns:
                hot.extend(df["band_key"].tolist())
        if hot:
            hot_arr = pa.array(sorted(set(hot)), type=pa.int64())

            def cold(t: pa.Table) -> pa.Table:
                return t.filter(pc.invert(
                    pc.is_in(t["band_key"], value_set=hot_arr)))

            new_b = new_b.map_batches(cold, batch_format="pyarrow")
            old_b = old_b.map_batches(cold, batch_format="pyarrow")
            if new_b.count() == 0 or old_b.count() == 0:
                return None
    return new_b.join(old_b, join_type="inner", on=("band_key",),
                      **_join_args()).select_columns(["id_a", "id_b"])


def snapshot_dedup_pairs(
    new_store: str, old_store: str, *, threshold: float = 0.25,
    max_bucket_occupancy: int | None = 1024,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Cross-snapshot near-duplicate pairs ``(id_a=new, id_b=old,
    est_i4)``: join the two stores' band tables on band_key, verify
    candidates by signature agreement ≥ ``threshold``, distinct pairs
    out.  Never touches either corpus's text.

    ``max_bucket_occupancy`` drops band keys holding more rows than the
    cap ON EITHER SIDE before the join (a stopword-heavy boilerplate
    bucket would otherwise explode the candidate product) — same
    recall trade as the in-corpus LSH source, the verified estimate is
    unaffected for surviving candidates.  Ids must be comparable across
    snapshots only in the sense that equal ids are the same document;
    overlapping id SPACES are fine (sides never mix)."""
    m_new, m_old = _load_manifest(new_store), _load_manifest(old_store)
    for m, d in ((m_new, new_store), (m_old, old_store)):
        if m.get("kind", "minhash") != "minhash":
            raise ValueError(
                f"{d} is not a MinHash store (kind={m.get('kind')!r}) — "
                f"snapshot_semdedup_pairs probes embedding stores")
    if m_new != m_old:
        raise ValueError(
            f"incompatible fingerprint stores: {m_new} vs {m_old} — "
            f"rebuild one side with matching params")
    id_col = m_new["id_col"]
    cands = _probe_band_stores(new_store, old_store, id_col,
                               max_bucket_occupancy)
    if cands is None:
        id_type = _store_id_type(new_store, "sigs", id_col)
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=id_type),
            "id_b": pa.array([], type=id_type),
            "est_i4": pa.array([], type=pa.int64())}))
    verified = cands.map_batches(
        VerifySigAgreementStage,
        fn_constructor_kwargs={
            "new_sigs": os.path.join(new_store, "sigs"),
            "old_sigs": os.path.join(old_store, "sigs"),
            "id_col": id_col, "num_perm": m_new["num_perm"],
            "threshold": threshold},
        batch_format="pyarrow", batch_size=4096,
        concurrency=(1, _pool_size(concurrency)))
    return _dedupe_pairs_min(verified, "est_i4")


def build_embedding_store(
    ds: rd.Dataset, vec_col: str, id_col: str, store_dir: str, *,
    n_planes: int = 48, bands: int = 12, seed: int = 11,
) -> dict:
    """Embedding analog of :func:`build_minhash_store`: persist a
    snapshot's vectors (``vecs/``) and their banded sign-LSH keys
    (``bands/``, sorted) + manifest — the state cross-snapshot SEMANTIC
    dedup probes.  Signs come from the deterministic ±1 FNV planes over
    ×10⁴-quantized INTEGER vectors (``similarity.hash_planes`` —
    sign(Σ int·±1) is exact integer arithmetic, so the bucket structure
    is bit-for-bit SQL-replicable, the ``plane_mode='hash'`` trick of
    ``dedup.embedding_neardup_pairs_lsh``)."""
    from .similarity import _matrix, hash_planes, quantize_i4

    per_band = n_planes // bands
    if per_band < 1:
        raise ValueError(f"n_planes={n_planes} < bands={bands}")
    if per_band + max(1, (bands - 1).bit_length()) > 62:
        raise ValueError(
            f"n_planes={n_planes}/bands={bands}: band key overflows int64")
    _clear_store_dir(store_dir)
    vec_dir = os.path.join(store_dir, "vecs")
    band_dir = os.path.join(store_dir, "bands")
    ds.select_columns([id_col, vec_col]).write_parquet(vec_dir)

    used = bands * per_band
    pow2 = (1 << np.arange(per_band - 1, -1, -1)).astype(np.int64)
    band_tag = (np.arange(bands, dtype=np.int64) << np.int64(per_band))
    planes_by_dim: dict[int, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"band_key": pa.array([], type=pa.int64()),
                             id_col: batch[id_col]})
        M = quantize_i4(_matrix(batch[vec_col]))
        dim = M.shape[1]
        if dim not in planes_by_dim:
            planes_by_dim[dim] = hash_planes(dim, n_planes, seed)
        bits = (M @ planes_by_dim[dim]) > 0
        codes = bits[:, :used].reshape(len(M), bands, per_band) @ pow2
        keys = (band_tag[None, :] | codes).ravel()
        take = pa.array(np.repeat(np.arange(batch.num_rows), bands))
        return pa.table({"band_key": pa.array(keys, type=pa.int64()),
                         id_col: batch[id_col].take(take)})

    (rd.read_parquet(vec_dir)
     .map_batches(bucketize, batch_format="pyarrow")
     .sort("band_key")
     .write_parquet(band_dir))
    manifest = {"kind": "embedding", "n_planes": n_planes, "bands": bands,
                "seed": seed, "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(store_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


class VerifyCosineCrossStage:
    """Cross-store exact-cosine verify of (id_a=new, id_b=old) candidate
    pairs: one ``dedup.VecCache`` PER SIDE (the sides' id spaces may
    overlap, so they must never share a cache), one einsum row-wise dot
    per batch — the ``VerifyCosineStage`` kernel with a store per
    side."""

    def __init__(self, new_vecs: str, old_vecs: str, id_col: str,
                 vec_col: str, threshold: float):
        from .dedup import VecCache

        self.a_cache = VecCache(_parquet_files(new_vecs), id_col, vec_col)
        self.b_cache = VecCache(_parquet_files(old_vecs), id_col, vec_col)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import quantize_i4

        if batch.num_rows == 0:
            return pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"],
                             "cos_i4": pa.array([], type=pa.int64())})
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        self.a_cache.ensure(set(a.tolist()))
        self.b_cache.ensure(set(b.tolist()))
        sims = np.einsum("ij,ij->i", self.a_cache.rows(a),
                         self.b_cache.rows(b))
        keep = sims >= self.threshold
        t = batch.filter(pa.array(keep))
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "cos_i4": pa.array(quantize_i4(sims[keep]),
                                            type=pa.int64())})


def snapshot_semdedup_pairs(
    new_store: str, old_store: str, *, threshold: float = 0.9,
    max_bucket_occupancy: int | None = 4096,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Cross-snapshot SEMANTIC near-duplicate pairs ``(id_a=new,
    id_b=old, cos_i4)``: join the two embedding stores' band tables,
    verify candidates by exact cosine over the stored vectors.  Same
    probe shape, cap semantics and id contract as
    :func:`snapshot_dedup_pairs`."""
    m_new, m_old = _load_manifest(new_store), _load_manifest(old_store)
    for m, d in ((m_new, new_store), (m_old, old_store)):
        if m.get("kind") != "embedding":
            raise ValueError(
                f"{d} is not an embedding store (kind="
                f"{m.get('kind', 'minhash')!r}) — build it with "
                f"build_embedding_store")
    if m_new != m_old:
        raise ValueError(
            f"incompatible embedding stores: {m_new} vs {m_old} — "
            f"rebuild one side with matching params")
    cands = _probe_band_stores(new_store, old_store, m_new["id_col"],
                               max_bucket_occupancy)
    if cands is None:
        id_type = _store_id_type(new_store, "vecs", m_new["id_col"])
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=id_type),
            "id_b": pa.array([], type=id_type),
            "cos_i4": pa.array([], type=pa.int64())}))
    verified = cands.map_batches(
        VerifyCosineCrossStage,
        fn_constructor_kwargs={
            "new_vecs": os.path.join(new_store, "vecs"),
            "old_vecs": os.path.join(old_store, "vecs"),
            "id_col": m_new["id_col"], "vec_col": m_new["vec_col"],
            "threshold": threshold},
        batch_format="pyarrow", batch_size=4096,
        concurrency=(1, _pool_size(concurrency)))
    return _dedupe_pairs_min(verified, "cos_i4")


def snapshot_dedup_apply(
    new_ds: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id", *,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Materialize the deduplicated NEW snapshot: drop every new document
    that matched ANY old document (the old copy is canonical by
    definition — it is already in the corpus).  Reuses apply_dedup's
    broadcast-drop-set / anti-join routing by presenting each matched
    pair as an (id=new, rep=old) label.  A match whose ids are EQUAL is
    the same record re-ingested and is KEPT (apply_dedup's id == rep
    rule) — re-applying a snapshot against its own store is a no-op, so
    the operator is idempotent."""
    labels = pairs.map_batches(
        lambda t: pa.table({"id": t["id_a"], "rep": t["id_b"]}),
        batch_format="pyarrow")
    return apply_dedup(new_ds, labels, id_col,
                       broadcast_threshold=broadcast_threshold)
