"""Thin CLI facade — the analog of the reference's HTTP layer (§2.10).

The reference exposes search over CherryPy (/root/reference/opds/opds.py);
the engine-core equivalent here is a command line that owns its Ray session
(the library itself never calls ray.init).

    python -m project_gutenberg_full_text_search_ray.cli build SRC INDEX_DIR [--corpus transcripts|documents]
        [--format parquet|jsonl|jsonl-nested] [--ts-unit s|ms|us|ns]
    python -m project_gutenberg_full_text_search_ray.cli ingest SRC OUT_DIR [--nested] [--ts-unit ...]
        — one-time JSONL → partitioned Parquet conversion (sources/jsonl.py)
    python -m project_gutenberg_full_text_search_ray.cli search INDEX_DIR QUERY [--page N] [--size N]
        [--filter col:op:value ...] [--order col|relevance|random] [--asc] [--count-only]
    python -m project_gutenberg_full_text_search_ray.cli stats INDEX_DIR
    python -m project_gutenberg_full_text_search_ray.cli serve INDEX_DIR [--port N] [--workers N]
    python -m project_gutenberg_full_text_search_ray.cli prep OP SRC OUT_DIR [op options]
        OP ∈ dedup-exact | dedup-minhash | dedup-apply | dedup-exact-apply
             | split | sessionize | contamination | quota | pack | scrub
             | knn | pii | chunk | repetition | normalize | simjoin
             | quantiles | kmeans | semdedup | dupspans | lmscore
             | tempsample | pplxbuckets | dsir | snapstore | snapdedup
             | budgetsample | tfidf | esnapstore | esnapdedup
             | collocations | linededup | groupcap
        — training-data pipelines over parquet, streamed to partitioned
        parquet output (never materialized on the driver)
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _prep(args) -> int:
    """Training-data pipelines as a CLI: read parquet, run the operator as a
    streaming Dataset, write partitioned parquet (resumable output layout —
    one file per block, never a single giant file or a driver materialize)."""
    import ray.data as rd

    _ray_up()
    # per-op similarity-threshold defaults: a shared 0.5 default silently
    # applied to esnapdedup's COSINE threshold would delete merely-related
    # documents (library default there is 0.9)
    if getattr(args, "threshold", None) is None:
        args.threshold = {"snapdedup": 0.25, "esnapdedup": 0.9}.get(
            args.op, 0.5)
    ds = rd.read_parquet(args.src)
    if args.op == "dedup-exact":
        from .stages.dedup import exact_dedup

        out = exact_dedup(ds, args.id_col, args.text_col)
    elif args.op == "dedup-minhash":
        from .stages.dedup import minhash_lsh_pairs

        out = minhash_lsh_pairs(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col,
            threshold=args.threshold, doc_source=args.src)
    elif args.op == "dedup-exact-apply":
        # exact-dedup, materialized: keep the min-id copy of every identical
        # text; survivors stream out with ALL original columns
        from .stages.dedup import apply_dedup, exact_dedup_labels

        labels = exact_dedup_labels(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.id_col, args.text_col)
        out = apply_dedup(ds, labels, args.id_col)
    elif args.op == "dedup-apply":
        # the full fuzzy-dedup chain, materialized: MinHash-LSH pairs →
        # connected components → drop non-canonical members; the surviving
        # corpus (ALL original columns) streams to partitioned parquet
        from .stages.dedup import (
            apply_dedup,
            connected_components_ds,
            minhash_lsh_pairs,
        )

        pairs = minhash_lsh_pairs(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col,
            threshold=args.threshold, doc_source=args.src)
        out = apply_dedup(ds, connected_components_ds(pairs), args.id_col)
    elif args.op == "split":
        from .stages.corpus_prep import split_assign

        fractions = {}
        for part in args.fractions.split(","):
            name, _, frac = part.partition(":")
            fractions[name.strip()] = float(frac)
        out = split_assign(ds, args.id_col, fractions=fractions, seed=args.seed)
    elif args.op == "sessionize":
        from .stages.sessionize import sessionize

        out = sessionize(ds, args.user_col, args.ts_col, args.id_col,
                         gap_us=args.gap_us)
    elif args.op == "pack":
        from .stages.corpus_prep import pack_sequences

        out = pack_sequences(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, capacity=args.capacity)
    elif args.op == "scrub":
        from .stages.corpus_prep import frequent_span_scrub

        out = frequent_span_scrub(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col,
            span_tokens=args.span_tokens, max_df_frac=args.max_df_frac)
    elif args.op == "pii":
        from .stages.corpus_prep import redact_pii

        out = redact_pii(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col)
    elif args.op == "chunk":
        from .stages.corpus_prep import chunk_documents

        out = chunk_documents(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col,
            chunk_tokens=args.chunk_tokens, overlap=args.overlap)
    elif args.op == "simjoin":
        from .stages.dedup import jaccard_similarity_join

        if not args.right:
            print(json.dumps({"error": "simjoin needs --right (parquet with "
                              "the match-against rows)"}), file=sys.stderr)
            return 2
        out = jaccard_similarity_join(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            rd.read_parquet(args.right, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, args.id_col,
            threshold=args.threshold, k=args.matches)
    elif args.op == "normalize":
        from .stages.corpus_prep import normalize_text

        out = normalize_text(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col)
    elif args.op == "repetition":
        import pyarrow as pa

        from .functions.textstats import repetition_metrics_column

        def _rep(batch: pa.Table) -> pa.Table:
            m = repetition_metrics_column(batch[args.text_col])
            return pa.table({args.id_col: batch[args.id_col],
                             **{k: pa.array(v) for k, v in m.items()}})

        out = rd.read_parquet(args.src, columns=[args.id_col, args.text_col]) \
            .map_batches(_rep, batch_format="pyarrow")
    elif args.op == "knn":
        queries = rd.read_parquet(args.src, columns=[args.id_col, args.vec_col])
        if args.ivf_dir:
            import os

            from .stages.similarity import IVFIndex, knn_join_ivf

            if not os.path.exists(os.path.join(args.ivf_dir, "meta.json")):
                IVFIndex.build(queries, args.vec_col, args.id_col,
                               args.ivf_dir, n_lists=args.n_lists)
            out = knn_join_ivf(queries, args.ivf_dir, k=args.k,
                               n_probe=args.n_probe)
        else:
            from .stages.similarity import knn_join

            out = knn_join(queries, args.vec_col, args.id_col, k=args.k)
    elif args.op == "kmeans":
        # deterministic distributed k-means: (id, cluster) per row
        from .stages.clustering import cluster_assign, kmeans_train

        vecs = rd.read_parquet(args.src, columns=[args.id_col, args.vec_col])
        cents = kmeans_train(vecs, args.vec_col, args.id_col,
                             args.n_clusters, iters=args.iters,
                             seed=args.seed)
        out = cluster_assign(vecs, args.vec_col, args.id_col, cents)
    elif args.op == "semdedup":
        # SemDeDup proper: k-means clusters → within-cluster cosine pairs
        # (--threshold) → components → keep-canonical; survivors stream out
        # with ALL original columns
        from .stages.clustering import (
            embedding_neardup_pairs_clustered,
            kmeans_train,
        )
        from .stages.dedup import apply_dedup, connected_components_ds

        vecs = rd.read_parquet(args.src, columns=[args.id_col, args.vec_col])
        cents = kmeans_train(vecs, args.vec_col, args.id_col,
                             args.n_clusters, iters=args.iters,
                             seed=args.seed)
        pairs = embedding_neardup_pairs_clustered(
            vecs, args.vec_col, args.id_col, cents,
            threshold=args.threshold, vec_source=args.src)
        out = apply_dedup(ds, connected_components_ds(pairs), args.id_col)
    elif args.op == "dupspans":
        from .stages.corpus_prep import duplicate_spans

        out = duplicate_spans(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col,
            win=args.win, min_count=args.min_count)
    elif args.op == "lmscore":
        from .stages.corpus_prep import lm_surprisal_scores

        out = lm_surprisal_scores(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, quant=args.quant)
    elif args.op == "snapstore":
        # build a snapshot fingerprint store (sigs + LSH band tables +
        # manifest) — the persisted state cross-snapshot dedup probes
        from .stages.snapshot import build_minhash_store

        m = build_minhash_store(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, args.out_dir)
        print(json.dumps({"op": "snapstore", "store": args.out_dir, **m}))
        return 0
    elif args.op == "snapdedup":
        # dedupe SRC (the new snapshot) against --old-store: build/reuse the
        # new store, probe band tables, drop agreement-matched docs
        import os as _os

        from .stages.snapshot import (
            build_minhash_store,
            snapshot_dedup_apply,
            snapshot_dedup_pairs,
        )

        if not args.old_store:
            print(json.dumps({"error": "snapdedup needs --old-store (a "
                              "fingerprint store built by prep snapstore)"}),
                  file=sys.stderr)
            return 2
        new_store = args.new_store or (args.out_dir.rstrip("/") + "_store")
        if not _os.path.exists(_os.path.join(new_store, "manifest.json")):
            build_minhash_store(
                rd.read_parquet(args.src,
                                columns=[args.id_col, args.text_col]),
                args.text_col, args.id_col, new_store)
        pairs = snapshot_dedup_pairs(new_store, args.old_store,
                                     threshold=args.threshold)
        out = snapshot_dedup_apply(ds, pairs, args.id_col)
    elif args.op == "esnapstore":
        # embedding fingerprint store (vectors + sign-LSH band tables)
        from .stages.snapshot import build_embedding_store

        m = build_embedding_store(
            rd.read_parquet(args.src, columns=[args.id_col, args.vec_col]),
            args.vec_col, args.id_col, args.out_dir)
        print(json.dumps({"op": "esnapstore", "store": args.out_dir, **m}))
        return 0
    elif args.op == "esnapdedup":
        # semantic dedupe of SRC (new snapshot embeddings) vs --old-store
        import os as _os

        from .stages.snapshot import (
            build_embedding_store,
            snapshot_dedup_apply,
            snapshot_semdedup_pairs,
        )

        if not args.old_store:
            print(json.dumps({"error": "esnapdedup needs --old-store (an "
                              "embedding store from prep esnapstore)"}),
                  file=sys.stderr)
            return 2
        new_store = args.new_store or (args.out_dir.rstrip("/") + "_store")
        if not _os.path.exists(_os.path.join(new_store, "manifest.json")):
            build_embedding_store(
                rd.read_parquet(args.src,
                                columns=[args.id_col, args.vec_col]),
                args.vec_col, args.id_col, new_store)
        pairs = snapshot_semdedup_pairs(new_store, args.old_store,
                                        threshold=args.threshold)
        out = snapshot_dedup_apply(ds, pairs, args.id_col)
    elif args.op == "dsir":
        # DSIR importance weights toward --target (Xie et al. 2023);
        # --select-k switches to the deterministic top-k selection
        from .stages.dsir import dsir_select, dsir_weights

        if not args.target:
            print(json.dumps({"error": "dsir needs --target (parquet with "
                              "the target-domain texts)"}), file=sys.stderr)
            return 2
        raw = rd.read_parquet(args.src, columns=[args.id_col, args.text_col])
        tgt = rd.read_parquet(args.target, columns=[args.text_col])
        if args.select_k:
            out = rd.from_arrow(dsir_select(
                raw, tgt, args.text_col, args.id_col, k=args.select_k,
                n_buckets=args.n_buckets, quant=args.quant))
        else:
            out = dsir_weights(raw, tgt, args.text_col, args.id_col,
                               n_buckets=args.n_buckets, quant=args.quant)
    elif args.op == "tempsample":
        from .stages.corpus_prep import temperature_sample

        out = temperature_sample(ds, args.id_col, args.group_col,
                                 alpha=args.alpha, seed=args.seed)
    elif args.op == "tfidf":
        from .stages.keywords import tfidf_top_terms

        out = tfidf_top_terms(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, k=args.k, quant=args.quant)
    elif args.op == "groupcap":
        from .stages.corpus_prep import group_cap

        out = group_cap(
            rd.read_parquet(args.src, columns=[args.id_col, args.group_col]),
            args.group_col, args.id_col, cap=args.cap)
    elif args.op == "linededup":
        from .stages.corpus_prep import line_dedup

        out = line_dedup(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, sep=args.sep)
    elif args.op == "collocations":
        from .stages.keywords import collocations_pmi

        t = collocations_pmi(
            rd.read_parquet(args.src, columns=[args.text_col]),
            args.text_col, k=args.k, quant=args.quant,
            min_count=args.min_count)
        out = rd.from_arrow(t)
    elif args.op == "budgetsample":
        from .stages.corpus_prep import token_budget_sample

        out = token_budget_sample(
            rd.read_parquet(args.src, columns=[args.id_col, args.group_col,
                                               args.text_col]),
            args.text_col, args.id_col, args.group_col,
            budget_tokens=args.budget_tokens, seed=args.seed)
    elif args.op == "pplxbuckets":
        from .stages.corpus_prep import perplexity_buckets

        out = perplexity_buckets(
            rd.read_parquet(args.src, columns=[args.id_col, args.group_col,
                                               args.text_col]),
            args.text_col, args.id_col, args.group_col, quant=args.quant)
    elif args.op == "quota":
        from .stages.corpus_prep import quota_sample

        rates = {}
        for part in args.rates.split(","):
            name, _, frac = part.partition(":")
            rates[name.strip()] = float(frac)
        out = quota_sample(ds, args.id_col, args.group_col, rates=rates,
                           seed=args.seed, default_rate=args.default_rate)
    elif args.op == "quantiles":
        # exact percentile_disc over an UNBOUNDED-cardinality int column
        # (iterative histogram refinement — O(log range) streaming passes);
        # --group-col switches to the per-group form
        from .stages.topk import (
            grouped_quantiles_unbounded,
            quantiles_unbounded,
        )

        qs = []
        for part in args.pcts.split(","):
            name, _, frac = part.partition(":")
            qs.append((name, float(frac)))
        if args.by:
            t = grouped_quantiles_unbounded(
                rd.read_parquet(args.src, columns=[args.by, args.val_col]),
                args.by, args.val_col, qs)
        else:
            t = quantiles_unbounded(
                rd.read_parquet(args.src, columns=[args.val_col]),
                args.val_col, qs)
        out = rd.from_arrow(t)
        print(json.dumps({"quantiles": t.to_pylist()}))
    else:  # contamination
        import pyarrow.parquet as pq

        from .stages.corpus_prep import contamination_flags

        if not args.bench:
            print(json.dumps({"error": "contamination needs --bench "
                              "(parquet with the eval texts)"}), file=sys.stderr)
            return 2
        bench_texts = pq.read_table(args.bench,
                                    columns=[args.text_col])[args.text_col].to_pylist()
        out = contamination_flags(
            rd.read_parquet(args.src, columns=[args.id_col, args.text_col]),
            args.text_col, args.id_col, bench_texts,
            k_shingle=args.k_shingle, min_hits=args.min_hits)
    out.write_parquet(args.out_dir)
    import glob as _glob
    import os as _os

    n_files = len(_glob.glob(_os.path.join(args.out_dir, "*.parquet")))
    print(json.dumps({"op": args.op, "out_dir": args.out_dir,
                      "files": n_files}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ray-fts")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("src")
    b.add_argument("index_dir")
    b.add_argument("--corpus", choices=["transcripts", "documents"], default="transcripts")
    b.add_argument("--format", choices=["parquet", "jsonl", "jsonl-nested"],
                   default="parquet", dest="src_format",
                   help="jsonl = one JSON object per turn; jsonl-nested = one "
                        "per conversation with a turns[] list")
    b.add_argument("--ts-unit", default="us", choices=["s", "ms", "us", "ns"],
                   help="unit of integer ts values in JSONL input")
    b.add_argument("--force", action="store_true")

    ing = sub.add_parser("ingest", help="JSONL → partitioned Parquet (the "
                         "resumable input layout for repeated builds)")
    ing.add_argument("src")
    ing.add_argument("out_dir")
    ing.add_argument("--nested", action="store_true")
    ing.add_argument("--ts-unit", default="us", choices=["s", "ms", "us", "ns"])

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query")
    s.add_argument("--type", choices=["fts", "fuzzy", "contains"], default="fts")
    s.add_argument("--page", type=int, default=1)
    s.add_argument("--size", type=int, default=28)
    s.add_argument("--filter", action="append", default=[], help="col:op:value")
    s.add_argument("--order", default="relevance")
    s.add_argument("--asc", action="store_true")
    s.add_argument("--count-only", action="store_true")

    st = sub.add_parser("stats")
    st.add_argument("index_dir")
    st.add_argument("--terms", type=int, default=0,
                    help="also report the top-N dictionary terms as "
                         "(word, ndoc, nentry) — the ts_stat analog")

    sg = sub.add_parser("suggest", help="dictionary autocomplete (--prefix) "
                        "or spelling suggestion (--word)")
    sg.add_argument("index_dir")
    g = sg.add_mutually_exclusive_group(required=True)
    g.add_argument("--prefix", help="autocomplete: terms under this prefix, "
                   "hottest (df) first")
    g.add_argument("--word", help="did-you-mean: trigram-similar dictionary "
                   "terms, similarity then df")
    sg.add_argument("--k", type=int, default=10)
    sg.add_argument("--field", default=None,
                    help="scope to a per-field posting keyspace")

    hl = sub.add_parser("headline", help="ts_headline-style snippets for the "
                        "top-k docs of a query")
    hl.add_argument("index_dir")
    hl.add_argument("query")
    hl.add_argument("--source", required=True,
                    help="corpus parquet holding the raw text column")
    hl.add_argument("--k", type=int, default=10)
    hl.add_argument("--max-words", type=int, default=12)
    hl.add_argument("--start-sel", default="<b>")
    hl.add_argument("--stop-sel", default="</b>")

    sv = sub.add_parser("serve")
    sv.add_argument("index_dir")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--workers", type=int, default=0,
                    help="actor-pool workers; 0 = in-process engine")
    sv.add_argument("--default-mode", default="fts",
                    choices=["fts", "fuzzy", "contains"],
                    help="bare-field search mode; 'fuzzy' = reference "
                         "(opds.py) parity")

    pr = sub.add_parser("prep", help="training-data pipelines: parquet in → parquet out")
    pr.add_argument("op", choices=["dedup-exact", "dedup-minhash",
                                   "dedup-apply", "dedup-exact-apply", "split",
                                   "sessionize", "contamination", "quota",
                                   "pack", "scrub", "knn", "pii",
                                   "chunk", "repetition", "normalize",
                                   "simjoin", "quantiles", "kmeans",
                                   "semdedup", "dupspans", "lmscore",
                                   "tempsample", "pplxbuckets", "dsir",
                                   "snapstore", "snapdedup", "budgetsample",
                                   "tfidf", "esnapstore", "esnapdedup",
                                   "collocations", "linededup", "groupcap"])
    pr.add_argument("src", help="input parquet file/dir")
    pr.add_argument("out_dir", help="output directory (partitioned parquet)")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--user-col", default="user_id")
    pr.add_argument("--ts-col", default="ts")
    pr.add_argument("--threshold", type=float, default=None,
                    help="similarity threshold; per-op default when unset "
                         "(Jaccard 0.5 for dedup-minhash/dedup-apply/"
                         "simjoin, cosine 0.5 for semdedup, agreement 0.25 "
                         "for snapdedup, cosine 0.9 for esnapdedup)")
    pr.add_argument("--gap-us", type=int, default=1_800_000_000,
                    help="session gap in µs (sessionize; default 30 min)")
    pr.add_argument("--fractions", default="train:0.8,val:0.1,test:0.1",
                    help="name:frac,... (split)")
    pr.add_argument("--seed", type=int, default=17)
    pr.add_argument("--matches", type=int, default=1,
                    help="ranked matches per left row (simjoin; >1 adds a "
                         "rank column)")
    pr.add_argument("--right", default=None,
                    help="parquet with the match-against rows (simjoin)")
    pr.add_argument("--val-col", default="n_chars",
                    help="integer value column (quantiles)")
    pr.add_argument("--by", default=None,
                    help="optional group column (quantiles → per-group)")
    pr.add_argument("--pcts", default="p25:0.25,p50:0.5,p75:0.75,p95:0.95",
                    help="name:frac,... (quantiles)")
    pr.add_argument("--bench", default=None,
                    help="benchmark parquet file/dir with --text-col (contamination)")
    pr.add_argument("--k-shingle", type=int, default=3)
    pr.add_argument("--min-hits", type=int, default=1)
    pr.add_argument("--capacity", type=int, default=512,
                    help="pack: token budget per packed sequence")
    pr.add_argument("--span-tokens", type=int, default=2,
                    help="scrub: span length in tokens")
    pr.add_argument("--max-df-frac", type=float, default=0.05,
                    help="scrub: doc-frequency fraction above which a span "
                         "is boilerplate")
    pr.add_argument("--vec-col", default="embedding",
                    help="list<float> column (knn)")
    pr.add_argument("--k", type=int, default=5,
                    help="neighbors per row (knn)")
    pr.add_argument("--chunk-tokens", type=int, default=256,
                    help="chunk: words per window")
    pr.add_argument("--overlap", type=int, default=0,
                    help="chunk: words shared between consecutive windows")
    pr.add_argument("--ivf-dir", default=None,
                    help="knn: persisted IVF index dir — built there if "
                         "absent, then answered via per-row probes "
                         "(knn_join_ivf) instead of the exact full-pool join")
    pr.add_argument("--n-lists", type=int, default=8,
                    help="knn --ivf-dir: IVF list count at build")
    pr.add_argument("--n-probe", type=int, default=2,
                    help="knn --ivf-dir: probed lists per query row")
    pr.add_argument("--n-clusters", type=int, default=10,
                    help="kmeans/semdedup: cluster count")
    pr.add_argument("--iters", type=int, default=2,
                    help="kmeans/semdedup: Lloyd iterations")
    pr.add_argument("--win", type=int, default=6,
                    help="dupspans: window length in analyzer tokens")
    pr.add_argument("--sep", default="\n",
                    help="linededup: literal line separator")
    pr.add_argument("--min-count", type=int, default=2,
                    help="dupspans: corpus occurrences for a window to "
                         "count; collocations: bigram support floor")
    pr.add_argument("--quant", type=int, default=1024,
                    help="lmscore/tfidf/collocations: log2 quantization "
                         "(units per bit)")
    pr.add_argument("--target", default=None,
                    help="dsir: parquet with the target-domain texts")
    pr.add_argument("--budget-tokens", type=int, default=1_000_000,
                    help="budgetsample: kept analyzer tokens per group "
                         "(in expectation)")
    pr.add_argument("--old-store", default=None,
                    help="snapdedup: fingerprint store of the existing "
                         "corpus (prep snapstore output)")
    pr.add_argument("--new-store", default=None,
                    help="snapdedup: where to build/reuse the new "
                         "snapshot's store (default OUT_DIR + '_store')")
    pr.add_argument("--select-k", type=int, default=0,
                    help="dsir: emit the top-k selection instead of "
                         "per-doc weights")
    pr.add_argument("--n-buckets", type=int, default=8192,
                    help="dsir: hashed feature buckets")
    pr.add_argument("--group-col", default="lang",
                    help="grouping column (quota/groupcap)")
    pr.add_argument("--cap", type=int, default=1000,
                    help="groupcap: max rows kept per group")
    pr.add_argument("--rates", default="en:1.0",
                    help="group:rate,... (quota)")
    pr.add_argument("--default-rate", type=float, default=0.0,
                    help="rate for groups not in --rates (quota)")
    pr.add_argument("--alpha", type=float, default=0.5,
                    help="temperature exponent (tempsample; 0.5 = the "
                         "standard square-root flattening)")

    args = p.parse_args(argv)

    if args.cmd == "prep":
        return _prep(args)

    if args.cmd == "serve":
        from .pipelines.http_api import SearchHTTPServer
        from .pipelines.search import FullTextSearchEngine
        from .pipelines.serving import SearchService

        _ray_up()
        eng = FullTextSearchEngine(args.index_dir)
        backend = SearchService(eng, n_workers=args.workers) if args.workers else eng
        srv = SearchHTTPServer(backend, host=args.host, port=args.port,
                               default_mode=args.default_mode).start()
        print(json.dumps({"serving": srv.url}), flush=True)
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            srv.close()
        return 0

    if args.cmd == "ingest":
        from .sources.jsonl import jsonl_to_parquet

        _ray_up()
        jsonl_to_parquet(args.src, args.out_dir, nested=args.nested,
                         ts_unit=args.ts_unit)
        import glob as _glob
        import os as _os

        n_files = len(_glob.glob(_os.path.join(args.out_dir, "*.parquet")))
        print(json.dumps({"out_dir": args.out_dir, "files": n_files}))
        return 0

    if args.cmd == "build":
        from .corpus import DOCUMENTS_SPEC, TRANSCRIPTS_SPEC
        from .pipelines.build import build_index

        _ray_up()
        spec = TRANSCRIPTS_SPEC if args.corpus == "transcripts" else DOCUMENTS_SPEC
        if args.src_format != "parquet":
            # JSONL source: normalized Dataset + a path-stats fingerprint so
            # refresh keeps its unchanged-input no-op (sources/jsonl.py)
            from .sources.jsonl import jsonl_input_fingerprint, read_transcripts_jsonl

            ds = read_transcripts_jsonl(
                args.src, nested=(args.src_format == "jsonl-nested"),
                ts_unit=args.ts_unit)
            info = build_index(ds, spec, args.index_dir, force=args.force,
                               input_fp=jsonl_input_fingerprint(args.src))
            print(json.dumps({"n_docs": info.n_docs,
                              "n_segments": info.n_segments,
                              "avgdl": round(info.avgdl, 3),
                              "fingerprint": info.build_fp}))
            return 0
        info = build_index(args.src, spec, args.index_dir, force=args.force)
        print(json.dumps({"n_docs": info.n_docs, "n_segments": info.n_segments,
                          "avgdl": round(info.avgdl, 3), "fingerprint": info.build_fp}))
        return 0

    if args.cmd == "stats":
        from .state.manifest import load_index_manifest

        m = load_index_manifest(args.index_dir)
        out = {k: m[k] for k in ("n_docs", "total_tokens", "avgdl", "n_segments", "fingerprint")}
        if args.terms:
            from .pipelines.search import FullTextSearchEngine

            out["terms"] = FullTextSearchEngine(
                args.index_dir).ts_stat(args.terms).to_pylist()
        print(json.dumps(out))
        return 0

    if args.cmd == "suggest":
        from .stages.trigram import did_you_mean, suggest_terms

        if args.prefix is not None:
            t = suggest_terms(args.index_dir, args.prefix, k=args.k,
                              field=args.field)
        else:
            t = did_you_mean(args.index_dir, args.word, k=args.k,
                             field=args.field)
        print(json.dumps({"suggestions": t.to_pylist()}))
        return 0

    if args.cmd == "headline":
        from .pipelines.search import FullTextSearchEngine, headline

        _ray_up()
        eng = FullTextSearchEngine(args.index_dir)
        t = headline(eng, args.query, doc_source=args.source, k=args.k,
                     max_words=args.max_words, start_sel=args.start_sel,
                     stop_sel=args.stop_sel)
        print(json.dumps({"total": t.num_rows, "rows": t.to_pylist()},
                         default=str))
        return 0

    # search
    from .pipelines.search import RANDOM, RELEVANCE, FullTextSearchEngine
    from .stages.segment_search import FilterSpec

    _ray_up()
    eng = FullTextSearchEngine(args.index_dir)
    filters = []
    for f in args.filter:
        parts = f.split(":", 2)
        col, op = parts[0], parts[1]
        val = parts[2] if len(parts) > 2 else None
        if val is not None:
            try:
                val = json.loads(val)
            except json.JSONDecodeError:
                pass
        filters.append(FilterSpec(col, op, val))
    q = eng.query()
    if args.type == "fuzzy":
        # per-word like the HTTP facade: trigram expansion runs against
        # space-free dictionary terms, so a whole multi-word query as one
        # fuzzy term can never match anything
        for term in args.query.split():
            q = q.search_fuzzy(term)
    elif args.type == "contains":
        from .pipelines.http_api import SearchAPI

        if not SearchAPI._single_token_indexable(eng, args.query):
            # multi-word / short / punctuated substring: same routing (and
            # the same filter + paging semantics — shared helper) as the
            # HTTP facade; a single-token plan would silently return 0
            if args.order not in ("relevance", "identity"):
                # loud failure beats silently returning identity order
                print(json.dumps({"error": "contains-multi results are "
                                  "identity-ordered; --order is not supported "
                                  "on this path"}), file=sys.stderr)
                return 2
            total, rows = SearchAPI.contains_multi_page(
                eng, eng.spec, args.query, args.page, args.size,
                filters=filters, count_only=args.count_only)
            if args.count_only:
                print(json.dumps({"total": total}))
                return 0
            print(json.dumps({"total": total, "page": args.page, "rows": rows},
                             default=str))
            return 0
        q = q.search_contains(args.query)
    else:
        q = q.search(args.query)
    for spec_f in filters:
        q = q.where(spec_f)
    if args.order == "relevance":
        q = q.order_by(RELEVANCE)
    elif args.order == "random":
        q = q.order_by(RANDOM)
    elif args.order == "identity":
        # identity order == ascending id columns (same ordering the
        # contains-multi path serves): order by the leading id column — the
        # merge comparator tie-breaks on the remaining id cols ascending
        q = q.order_by(eng.spec.id_cols[0], descending=False)
    else:
        q = q.order_by(args.order, descending=not args.asc)
    q = q[args.page, args.size]
    if args.count_only:
        print(json.dumps({"total": eng.count(q)}))
        return 0
    res = eng.execute(q)
    print(json.dumps({"total": res.total, "page": res.page, "rows": res.table.to_pylist()},
                     default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
