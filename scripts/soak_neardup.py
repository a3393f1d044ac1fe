#!/usr/bin/env python
"""Near-dup family scale soak (VERDICT r3 follow-up): run
ngram_jaccard_pairs / minhash_lsh_pairs / connected_components_ds at sf0.1
(the bench scale, 5k docs) AND at a deterministic synthetic 10× corpus
("sf1", 50k docs), and measure the candidate-stream duplicate factor the
verify-first redesign assumes (~1.1× at sf0.1).

The sf1 table is synthesized to match the driver fixture's marginals
(measured from /root/testdata/sf0.1/documents.parquet): the SAME 31-word
vocabulary, uniform 10–100-token docs, ~5% of docs are one-token-mutated
copies of an earlier doc (the fixture's planted near-dup mechanism — pairs
at Jaccard 0.95+), langs/sources in the fixture's proportions.  Note the
fixed tiny vocabulary makes shingle doc-frequency — and hence CANDIDATE
pairs — grow quadratically with corpus size; a real corpus's vocabulary
grows with it (Heaps' law), so sf1 here is a stress case for the occupancy
cap, not a throughput projection.

Usage: python scripts/soak_neardup.py [--skip-sf01]
Prints one JSON line per (scale, metric); paste the summary into
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SOAK_DIR = "/tmp/pgfts_soak_sf1"
N_DOCS = 50_000
SEED = 42
P_NEARDUP = 0.05

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")


def canary() -> float:
    x = np.random.default_rng(0).integers(0, 1 << 62, size=10_000_000, dtype=np.int64)
    t0 = time.time()
    np.sort(x)
    return round(time.time() - t0, 3)


def gen_sf1() -> str:
    path = os.path.join(SOAK_DIR, "documents.parquet")
    if os.path.exists(path):
        return SOAK_DIR
    os.makedirs(SOAK_DIR, exist_ok=True)
    src = pq.read_table(os.path.join(SF01, "documents.parquet"), columns=["text", "lang", "source"])
    vocab = sorted({t for s in src["text"].to_pylist() for t in s.split()})
    langs, lcnt = np.unique(np.asarray(src["lang"].to_pylist(), dtype=object), return_counts=True)
    sources = sorted(set(src["source"].to_pylist()))
    rng = np.random.default_rng(SEED)
    texts: list[str] = []
    for i in range(N_DOCS):
        if i > 0 and rng.random() < P_NEARDUP:
            base = texts[int(rng.integers(0, i))].split()
            base[int(rng.integers(0, len(base)))] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(base))
        else:
            n = int(rng.integers(10, 101))
            texts.append(" ".join(np.asarray(vocab, dtype=object)[rng.integers(0, len(vocab), n)]))
    lang = rng.choice(langs, size=N_DOCS, p=lcnt / lcnt.sum())
    source = rng.choice(np.asarray(sources, dtype=object), size=N_DOCS)
    t = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(lang.astype(object), type=pa.string()),
        "source": pa.array(source, type=pa.string()),
        "n_chars": pa.array(np.fromiter((len(s) for s in texts), dtype=np.int64, count=N_DOCS)),
    })
    pq.write_table(t, path, row_group_size=4096)
    return SOAK_DIR


def docs_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


def dup_factor(sf_dir: str) -> dict:
    """Candidate-stream duplicate factor for the ngram operator: raw
    (locally-deduped) candidate pair instances vs globally distinct pairs."""
    from project_gutenberg_full_text_search_ray.functions.textstats import shingle_hashes_column
    from project_gutenberg_full_text_search_ray.stages.dedup import _candidate_pairs, _pair_dedupe

    def explode(batch: pa.Table) -> pa.Table:
        fp, doc_rows = shingle_hashes_column(batch["text"], 3)
        return pa.table({"doc_id": batch["doc_id"].take(pa.array(doc_rows)),
                         "sh": pa.array(fp.view(np.int64), type=pa.int64())})

    keyed = docs_ds(sf_dir).map_batches(explode, batch_format="pyarrow")
    raw = _candidate_pairs(keyed, "doc_id", "sh", 1024, dedupe=False).materialize()
    n_raw = raw.count()
    n_distinct = _pair_dedupe(raw).count()
    return {"candidates_raw": n_raw, "candidates_distinct": n_distinct,
            "dup_factor": round(n_raw / max(1, n_distinct), 4)}


N_VECS = 5_000  # 10× the fixture's 500-vector embeddings table
EMB_DIM = 64


def gen_sf1_embeddings() -> str:
    """Deterministic 10× embeddings table matching the fixture's schema
    (vec_id int64, embedding list<float32>[64], label int32) with ~5% of
    rows planted as scaled+noised copies of an earlier row (cosine ≈ 0.99,
    the fixture's near-dup mechanism)."""
    path = os.path.join(SOAK_DIR, "embeddings.parquet")
    if os.path.exists(path):
        return SOAK_DIR
    os.makedirs(SOAK_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED + 1)
    M = rng.standard_normal((N_VECS, EMB_DIM))
    for i in range(1, N_VECS):
        if rng.random() < P_NEARDUP:
            j = int(rng.integers(0, i))
            M[i] = M[j] * 1.01 + 0.02 * rng.standard_normal(EMB_DIM)
    t = pa.table({
        "vec_id": pa.array(np.arange(N_VECS), type=pa.int64()),
        "embedding": pa.array(list(M.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(N_VECS, dtype=np.int32), type=pa.int32()),
    })
    pq.write_table(t, path, row_group_size=4096)
    return SOAK_DIR


def run_simjoin_scale(tag: str, sf_dir: str) -> dict:
    """similarity_join soak (VERDICT r4 #8): record linkage over the corpus
    split at its midpoint — the same shape as q_similarity_join, 10×-able."""
    import pyarrow.compute as pc

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        jaccard_similarity_join)

    doc_src = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(doc_src).metadata.num_rows
    mid = n // 2
    left = docs_ds(sf_dir).map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], mid)), batch_format="pyarrow")
    right = docs_ds(sf_dir).map_batches(
        lambda b: b.filter(pc.greater_equal(b["doc_id"], mid)),
        batch_format="pyarrow")
    t0 = time.time()
    out = jaccard_similarity_join(left, right, "text", "doc_id", "doc_id",
                                  threshold=0.3).materialize()
    return {"scale": tag, "op": "similarity_join", "n_docs": n,
            "simjoin_sec": round(time.time() - t0, 2),
            "match_rows": out.count(), "canary_sort_sec": canary()}


def run_semdedup_scale(tag: str, emb_dir: str) -> dict:
    """semantic_dedup soak (VERDICT r4 #8): the REGISTERED scale chain —
    hash-plane banded sign-LSH pairs (bucket-capped) → components → apply —
    over the 10× embeddings table, with the exact all-pairs source timed
    alongside for the growth comparison."""
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        apply_dedup,
        connected_components_ds,
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    path = os.path.join(emb_dir, "embeddings.parquet")
    emb = lambda: rd.read_parquet(path, columns=["vec_id", "embedding"])
    n = pq.ParquetFile(path).metadata.num_rows
    out: dict = {"scale": tag, "op": "semantic_dedup", "n_vecs": n}

    t0 = time.time()
    pairs = embedding_neardup_pairs_lsh(
        emb(), "embedding", "vec_id", threshold=0.45, n_planes=48, bands=12,
        seed=11, max_bucket_occupancy=4096, plane_mode="hash").materialize()
    out["lsh_pairs_sec"] = round(time.time() - t0, 2)
    out["lsh_pairs"] = pairs.count()

    t0 = time.time()
    labels = connected_components_ds(pairs)
    kept = apply_dedup(
        rd.read_parquet(path, columns=["vec_id", "label"]), labels,
        "vec_id").materialize()
    out["components_apply_sec"] = round(time.time() - t0, 2)
    out["kept_rows"] = kept.count()

    t0 = time.time()
    exact = embedding_neardup_pairs(emb(), "embedding", "vec_id",
                                    threshold=0.45)
    out["exact_pairs_sec"] = round(time.time() - t0, 2)
    out["exact_pairs"] = exact.num_rows
    out["canary_sort_sec"] = canary()
    return out


def run_snapshot_scale(tag: str, sf_dir: str) -> dict:
    """snapshot_dedup soak: split the corpus even/odd, build both
    fingerprint stores, probe new against old (the registered query's
    shape, 10×-able) — store-build vs probe cost recorded separately."""
    import shutil

    import pyarrow.compute as pc

    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        build_minhash_store, snapshot_dedup_pairs)

    doc_src = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(doc_src).metadata.num_rows
    out: dict = {"scale": tag, "op": "snapshot_dedup", "n_docs": n}
    stores = {}
    t0 = time.time()
    for name, parity in (("old", 0), ("new", 1)):
        d = os.path.join("/tmp/pgfts_soak_snap", f"{tag}_{name}")
        shutil.rmtree(d, ignore_errors=True)
        side = docs_ds(sf_dir).map_batches(
            lambda b, p=parity: b.filter(
                pc.equal(pc.bit_wise_and(b["doc_id"], 1), p)),
            batch_format="pyarrow")
        build_minhash_store(side, "text", "doc_id", d)
        stores[name] = d
    out["store_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    pairs = snapshot_dedup_pairs(stores["new"], stores["old"],
                                 threshold=0.25).materialize()
    out["probe_sec"] = round(time.time() - t0, 2)
    out["pairs"] = pairs.count()
    out["canary_sort_sec"] = canary()
    return out


def run_linededup_scale(tag: str, sf_dir: str) -> dict:
    """line_dedup soak: the registered query's separator over the doc
    corpus — pass-1 winner exchange + pass-2 rebuild measured together
    (one streaming consume), winner-set size recorded."""
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        line_dedup)

    doc_src = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(doc_src).metadata.num_rows
    out: dict = {"scale": tag, "op": "line_dedup", "n_docs": n}
    t0 = time.time()
    res = line_dedup(docs_ds(sf_dir), "text", "doc_id",
                     sep=" table ").materialize()
    out["line_dedup_sec"] = round(time.time() - t0, 2)
    out["docs_out"] = res.count()
    out["canary_sort_sec"] = canary()
    return out


def run_groupcap_scale(tag: str, sf_dir: str) -> dict:
    """group_cap soak: one (group, id) label sort + O(blocks) fixup."""
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        group_cap)

    doc_src = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(doc_src).metadata.num_rows
    import ray.data as rd

    out: dict = {"scale": tag, "op": "group_cap", "n_docs": n}
    t0 = time.time()
    res = group_cap(rd.read_parquet(doc_src, columns=["doc_id", "source"]),
                    "source", "doc_id", cap=15).materialize()
    out["group_cap_sec"] = round(time.time() - t0, 2)
    out["rows_kept"] = res.count()
    out["canary_sort_sec"] = canary()
    return out


def run_colloc_scale(tag: str, sf_dir: str) -> dict:
    """collocations_pmi soak: one counts exchange + in-place scored
    top-k fold at the registered query's parameters."""
    from project_gutenberg_full_text_search_ray.stages.keywords import (
        collocations_pmi)

    doc_src = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(doc_src).metadata.num_rows
    out: dict = {"scale": tag, "op": "collocations_pmi", "n_docs": n}
    t0 = time.time()
    res = collocations_pmi(docs_ds(sf_dir), "text", k=20, min_count=3)
    out["colloc_sec"] = round(time.time() - t0, 2)
    out["rows"] = res.num_rows
    out["canary_sort_sec"] = canary()
    return out


def run_scale(tag: str, sf_dir: str) -> dict:
    from project_gutenberg_full_text_search_ray.stages.dedup import (
        connected_components_ds, minhash_lsh_pairs, ngram_jaccard_pairs)

    doc_src = os.path.join(sf_dir, "documents.parquet")
    out: dict = {"scale": tag, "n_docs": pq.ParquetFile(doc_src).metadata.num_rows}

    t0 = time.time()
    ng = ngram_jaccard_pairs(docs_ds(sf_dir), "text", "doc_id",
                             threshold=0.3, doc_source=doc_src).materialize()
    out["ngram_jaccard_sec"] = round(time.time() - t0, 2)
    out["ngram_pairs"] = ng.count()

    t0 = time.time()
    mh = minhash_lsh_pairs(docs_ds(sf_dir), "text", "doc_id",
                           threshold=0.3, doc_source=doc_src).materialize()
    out["minhash_sec"] = round(time.time() - t0, 2)
    out["minhash_pairs"] = mh.count()

    t0 = time.time()
    cc = connected_components_ds(ng).materialize()
    out["components_sec"] = round(time.time() - t0, 2)
    out["component_rows"] = cc.count()

    out.update(dup_factor(sf_dir))
    out["canary_sort_sec"] = canary()
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    ops = "ngram,simjoin,semdedup,snapshot"
    for a in sys.argv[1:]:
        if a.startswith("--ops="):
            ops = a.split("=", 1)[1]
    ops_set = set(ops.split(","))

    print(json.dumps({"canary_sort_sec_pre": canary()}), flush=True)
    results = []
    # synthesize the 10x doc corpus only for the ops that read it
    sf1_dir = gen_sf1() if ops_set & {"ngram", "simjoin", "snapshot",
                                      "linededup", "colloc",
                                      "groupcap"} else None
    scales = ([] if "--skip-sf01" in sys.argv else [("sf0.1", SF01)]) + \
        [("sf1_synth_10x", sf1_dir)]
    if "ngram" in ops_set:
        for tag, d in scales:
            results.append(run_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    if "simjoin" in ops_set:
        for tag, d in scales:
            results.append(run_simjoin_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    if "snapshot" in ops_set:
        for tag, d in scales:
            results.append(run_snapshot_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    if "linededup" in ops_set:
        for tag, d in scales:
            results.append(run_linededup_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    if "colloc" in ops_set:
        for tag, d in scales:
            results.append(run_colloc_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    if "groupcap" in ops_set:
        for tag, d in scales:
            results.append(run_groupcap_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    if "semdedup" in ops_set:
        emb10 = gen_sf1_embeddings()
        for tag, d in ([] if "--skip-sf01" in sys.argv
                       else [("sf0.1", SF01)]) + [("sf1_synth_10x", emb10)]:
            results.append(run_semdedup_scale(tag, d))
            print(json.dumps(results[-1]), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
