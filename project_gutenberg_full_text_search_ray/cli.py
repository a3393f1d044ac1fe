"""Thin CLI facade — the analog of the reference's HTTP layer (§2.10).

The reference exposes search over CherryPy (/root/reference/opds/opds.py);
the engine-core equivalent here is a command line that owns its Ray session
(the library itself never calls ray.init).

    python -m project_gutenberg_full_text_search_ray.cli build SRC INDEX_DIR [--corpus transcripts|documents]
    python -m project_gutenberg_full_text_search_ray.cli search INDEX_DIR QUERY [--page N] [--size N]
        [--filter col:op:value ...] [--order col|relevance|random] [--asc] [--count-only]
    python -m project_gutenberg_full_text_search_ray.cli stats INDEX_DIR
    python -m project_gutenberg_full_text_search_ray.cli serve INDEX_DIR [--port N] [--workers N]
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


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ray-fts")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("src")
    b.add_argument("index_dir")
    b.add_argument("--corpus", choices=["transcripts", "documents"], default="transcripts")
    b.add_argument("--force", action="store_true")

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

    sv = sub.add_parser("serve")
    sv.add_argument("index_dir")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--workers", type=int, default=0,
                    help="actor-pool workers; 0 = in-process engine")

    args = p.parse_args(argv)

    if args.cmd == "serve":
        from .pipelines.http_api import SearchHTTPServer
        from .pipelines.search import FullTextSearchEngine
        from .pipelines.serving import SearchService

        _ray_up()
        eng = FullTextSearchEngine(args.index_dir)
        backend = SearchService(eng, n_workers=args.workers) if args.workers else eng
        srv = SearchHTTPServer(backend, host=args.host, port=args.port).start()
        print(json.dumps({"serving": srv.url}), flush=True)
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            srv.close()
        return 0

    if args.cmd == "build":
        from .corpus import DOCUMENTS_SPEC, TRANSCRIPTS_SPEC
        from .pipelines.build import build_index

        _ray_up()
        spec = TRANSCRIPTS_SPEC if args.corpus == "transcripts" else DOCUMENTS_SPEC
        info = build_index(args.src, spec, args.index_dir, force=args.force)
        print(json.dumps({"n_docs": info.n_docs, "n_segments": info.n_segments,
                          "avgdl": round(info.avgdl, 3), "fingerprint": info.build_fp}))
        return 0

    if args.cmd == "stats":
        from .state.manifest import load_index_manifest

        m = load_index_manifest(args.index_dir)
        print(json.dumps({k: m[k] for k in ("n_docs", "total_tokens", "avgdl", "n_segments", "fingerprint")}))
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
