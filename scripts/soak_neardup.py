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

    print(json.dumps({"canary_sort_sec_pre": canary()}), flush=True)
    sf1_dir = gen_sf1()
    results = []
    if "--skip-sf01" not in sys.argv:
        results.append(run_scale("sf0.1", SF01))
        print(json.dumps(results[-1]), flush=True)
    results.append(run_scale("sf1_synth_10x", sf1_dir))
    print(json.dumps(results[-1]), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
