#!/usr/bin/env python
"""Materializer-tail scale soak (round-4 additions): run the two dedup
materializer chains at sf0.1 (5k docs) and at the deterministic synthetic
10x corpus soak_neardup.py builds (50k docs):

  exact:  exact_dedup_labels -> apply_dedup   (hash groups, members join)
  fuzzy:  minhash_lsh_pairs -> connected_components_ds -> apply_dedup

Reports wall time, labels/drop/kept counts and the canary per leg.  The
marginal cost under measurement is the materializer TAIL (labels + filter);
the pair source's own scaling is covered by soak_neardup.py.

Usage: python scripts/soak_dedup_apply.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

from soak_neardup import canary, gen_sf1  # noqa: E402  (same synth corpus)

SF01 = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_scale(tag: str, sf_dir: str) -> dict:
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.dedup import (
        apply_dedup,
        connected_components_ds,
        exact_dedup_labels,
        minhash_lsh_pairs,
    )

    path = os.path.join(sf_dir, "documents.parquet")
    out = {"scale": tag, "canary_pre": canary()}

    t0 = time.time()
    labels = exact_dedup_labels(
        rd.read_parquet(path, columns=["doc_id", "text"]), "doc_id", "text")
    kept = apply_dedup(rd.read_parquet(path, columns=["doc_id"]), labels, "doc_id")
    out["exact_kept"] = kept.count()
    out["exact_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        rd.read_parquet(path, columns=["doc_id", "text"]), "text", "doc_id",
        threshold=0.5, doc_source=path)
    comp = connected_components_ds(pairs)
    kept = apply_dedup(rd.read_parquet(path, columns=["doc_id"]), comp, "doc_id")
    out["fuzzy_kept"] = kept.count()
    out["fuzzy_sec"] = round(time.time() - t0, 2)
    out["canary_post"] = canary()
    return out


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    results = [run_scale("sf0.1", SF01)]
    results.append(run_scale("sf1_synth_10x", gen_sf1()))
    for r in results:
        print(json.dumps(r))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
