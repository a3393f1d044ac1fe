"""Deduplication operators over a document Dataset — first-class components
for a 100 TB training-data pipeline.

All operators follow the same Ray-Data shape:

  1. a vectorized / actor-pool ``map_batches`` stage computes per-doc keys or
     signatures (cheap, embarrassingly parallel);
  2. ONE ``groupby`` shuffle co-locates candidate groups (key = content hash /
     LSH band bucket / SimHash band), whose sizes are bounded by construction
     (hash buckets), so skew cannot blow up a worker;
  3. verification (exact equality / Jaccard / Hamming / cosine) runs inside
     the group — pairwise work only within small candidate buckets, never
     all-pairs across the corpus.

Scale notes: at 10^12 docs the band groupby is the only all-to-all move and
carries ~bytes/doc, not the documents themselves (signatures only); the
verify stage re-reads text for candidate groups via the doc store.  At
sandbox scale we keep text in the shuffled rows for simplicity — the split is
noted per operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer
from ..functions.textstats import (
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    shingles,
    simhash64,
)


def _hash_text_col(batch: pa.Table, text_expr_col: str) -> pa.Table:
    from pandas.util import hash_array

    s = batch[text_expr_col].to_pandas().astype("string").fillna("")
    h = hash_array(s.to_numpy(dtype=object), hash_key="0123456789abcdef", categorize=False)
    return batch.append_column("__key_hash", pa.array(h.astype(np.uint64)))


# --------------------------------------------------------------- exact dedup
def exact_dedup(
    ds: rd.Dataset, id_col: str, key_col: str
) -> rd.Dataset:
    """Exact dedup on ``key_col``: hash-partition the key, keep the smallest
    ``id_col`` per key (SURVEY §2.7).  Returns (keep_id, n_dups) per group.
    The shuffle key is the 64-bit key hash; equality is verified on the real
    key inside the group (collision-safe)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return _hash_text_col(batch, key_col)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(key_col, sort=False, dropna=False)[id_col]
            .agg(["min", "size"])
            .reset_index(drop=True)
            .rename(columns={"min": "keep_id", "size": "n_dups"})
        )
        return out

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .select_columns(["__key_hash", key_col, id_col])
        .groupby("__key_hash")
        .map_groups(keep_first, batch_format="pandas")
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
        ids = batch[self.id_col].to_pylist()
        sigs = []
        for txt in batch[self.text_col].to_pylist():
            toks = self.analyzer.tokenize(txt or "")
            sigs.append(minhash_signature(shingle_hashes(toks, self.k), self.a, self.b))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64())),
                self.text_col: batch[self.text_col],
            }
        )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 3,
    threshold: float = 0.5,
    concurrency: int = 4,
) -> rd.Dataset:
    """Near-duplicate pairs via MinHash + LSH banding:
    shingle→minhash (actor pool) → explode (band, band_hash) → groupby band
    bucket → verify true shingle-Jaccard within bucket → (id_a, id_b, jacc_i4).
    """
    rows_per_band = num_perm // bands
    stage = MinHashStage(text_col, id_col, num_perm, k_shingle)

    def sigs_fn(batch: pa.Table) -> pa.Table:
        return stage(batch)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = batch["sig"].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_band, out_hash, out_text = [], [], [], []
        for i, sig in enumerate(sigs):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
                bh = int(np.bitwise_xor.reduce(chunk * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1))
                out_id.append(ids[i])
                out_band.append(b)
                out_hash.append(bh)
                out_text.append(texts[i])
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band_key": pa.array([f"{b}:{h}" for b, h in zip(out_band, out_hash)]),
                text_col: pa.array(out_text),
            }
        )

    analyzer = DEFAULT_ANALYZER

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jacc_i4": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        texts = g[text_col].tolist()
        sh = [shingles(analyzer.tokenize(t or ""), k_shingle) for t in texts]
        ra, rb, rj = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jc = jaccard(sh[i], sh[j])
                if jc >= threshold:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    rj.append(int(np.floor(jc * 10000 + 0.5)))
        return pd.DataFrame({"id_a": ra, "id_b": rb, "jacc_i4": rj})

    pairs = (
        ds.map_batches(sigs_fn, batch_format="pyarrow", concurrency=concurrency)
        .map_batches(explode_bands, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify_bucket, batch_format="pandas")
    )

    # distinct pairs (same pair can surface from several bands): tiny result →
    # dedupe with one more groupby
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    def add_pair_key(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        return batch.append_column("pair", pa.array([f"{x}|{y}" for x, y in zip(a, b)]))

    return (
        pairs.map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["pair"])
    )


# --------------------------------------------------------------- SimHash
def simhash_pairs(
    ds: rd.Dataset, text_col: str, id_col: str, *, max_hamming: int = 8,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> rd.Dataset:
    """SimHash near-dup pairs: 64-bit signature per doc, block on 4×16-bit
    bands (any doc pair within Hamming ≤ 16/band-count shares ≥1 exact band),
    verify Hamming inside buckets."""

    def sig_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = [simhash64(analyzer.tokenize(t or "")) for t in batch[text_col].to_pylist()]
        return pa.table({id_col: pa.array(ids), "sim": pa.array(sigs, type=pa.uint64())})

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = batch["sim"].to_pylist()
        oi, ob, os_ = [], [], []
        for i, s in enumerate(sigs):
            for b in range(4):
                oi.append(ids[i])
                ob.append(f"{b}:{(s >> (16 * b)) & 0xFFFF}")
                os_.append(s)
        return pa.table({id_col: pa.array(oi), "band_key": pa.array(ob), "sim": pa.array(os_, type=pa.uint64())})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        sims = g["sim"].tolist()
        ra, rb, rh = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming64(int(sims[i]), int(sims[j]))
                if h <= max_hamming:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    rh.append(h)
        return pd.DataFrame({"id_a": ra, "id_b": rb, "hamming": rh})

    def add_pair_key(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        return batch.append_column("pair", pa.array([f"{x}|{y}" for x, y in zip(a, b)]))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return (
        ds.map_batches(sig_fn, batch_format="pyarrow")
        .map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
        .map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["pair"])
    )


# ------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    k_shingle: int = 3,
    threshold: float = 0.5,
    n_buckets: int = 64,
    analyzer: Analyzer = DEFAULT_ANALYZER,
) -> rd.Dataset:
    """EXACT n-gram-Jaccard near-dup pairs (vs MinHash's probabilistic
    candidates): docs sharing ≥1 shingle-hash bucket become candidates
    (any pair with Jaccard > 0 shares a shingle, hence a bucket → recall is
    exact down to Jaccard > 0), then true Jaccard is computed in-bucket and
    thresholded.  One groupby on bucket ids; per-bucket pair work is bounded
    by bucket occupancy (shingle-hash spreading), deduped by a second tiny
    groupby."""

    def explode_shingle_buckets(batch: pa.Table) -> pa.Table:
        ids_out, bkt_out, text_out = [], [], []
        for did, txt in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sh = shingle_hashes(analyzer.tokenize(txt or ""), k_shingle)
            buckets = np.unique(sh % np.uint64(n_buckets))
            for b in buckets:
                ids_out.append(did)
                bkt_out.append(int(b))
                text_out.append(txt)
        return pa.table(
            {id_col: pa.array(ids_out), "bucket": pa.array(bkt_out, type=pa.int32()),
             text_col: pa.array(text_out)}
        )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jacc_i4": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].tolist()
        sh = [shingles(analyzer.tokenize(t or ""), k_shingle) for t in g[text_col].tolist()]
        ra, rb, rj = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jc = jaccard(sh[i], sh[j])
                if jc >= threshold:
                    ra.append(ids[i])
                    rb.append(ids[j])
                    rj.append(int(np.floor(jc * 10000 + 0.5)))
        return pd.DataFrame({"id_a": ra, "id_b": rb, "jacc_i4": rj})

    def add_pair_key(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        return batch.append_column("pair", pa.array([f"{x}|{y}" for x, y in zip(a, b)]))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return (
        ds.map_batches(explode_shingle_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify_bucket, batch_format="pandas")
        .map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(first, batch_format="pandas")
        .drop_columns(["pair"])
    )


# ------------------------------------------------------- connected components
def connected_components(pairs: pa.Table, id_a: str = "id_a", id_b: str = "id_b") -> pa.Table:
    """Duplicate-cluster representatives from a near-dup pair list:
    min-label propagation to fixpoint → (id, rep) with rep = min id of the
    component.  Driver-side union-find here (pair lists are tiny relative to
    the corpus — they already passed an LSH+verify filter); the documented
    scale path is the same min-label propagation as iterated
    groupby(id).min(label) rounds over a pairs Dataset."""
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


# --------------------------------------------------------------- embeddings
def embedding_neardup_pairs(
    ds: rd.Dataset, vec_col: str, id_col: str, *, threshold: float = 0.98,
    block: int = 2048,
) -> pa.Table:
    """Embedding-cosine near-dup pairs.  Sandbox path: materialize the (small)
    normalized matrix and do blocked numpy matmuls.  Scale path (documented):
    LSH-bucket by sign-projection first (see similarity.lsh_bucket_topk) and
    run this only within buckets."""
    t = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    import ray

    tables = [ray.get(r) for r in t]
    tbl = pa.concat_tables(tables)
    ids = np.asarray(tbl[id_col].to_pylist())
    M = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Mn = M / norms
    ra, rb, rc = [], [], []
    for i0 in range(0, len(ids), block):
        sims = Mn[i0 : i0 + block] @ Mn.T
        for ii in range(sims.shape[0]):
            gi = i0 + ii
            js = np.flatnonzero(sims[ii] >= threshold)
            js = js[js > gi]
            for j in js:
                ra.append(int(ids[gi]))
                rb.append(int(ids[j]))
                rc.append(int(np.floor(sims[ii, j] * 10000 + 0.5)))
    return pa.table(
        {
            "id_a": pa.array(ra, type=pa.int64()),
            "id_b": pa.array(rb, type=pa.int64()),
            "cos_i4": pa.array(rc, type=pa.int64()),
        }
    )
