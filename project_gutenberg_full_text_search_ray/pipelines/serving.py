"""Persistent query serving: an actor pool of warmed segment searchers.

The reference's latency story is a long-lived Postgres with prewarmed shared
buffers behind a connection pool (/root/reference/README.md:29-34,459-461;
pool full_text_search.py:343-348).  Ours: N ``SearcherWorker`` actors, each
owning a static partition of the index's segments with doc stores + hot
postings cached in actor memory (loaded once in ``__init__`` / on first
touch); a query is one fan-out round ``worker.search(plan)`` → tiny
per-segment top-k tables → driver merge.  This is the raw-actor escape hatch
SURVEY.md §2.3 T1 plans — per-query Dataset pipelines pay ~300 ms of task
scheduling, which a latency path cannot.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from .search import SearchQuery, SearchResult, merge_segment_partials, paginate_result
from ..stages.segment_search import SearchPlan, SegmentSearchActor


# Serving must survive worker loss on a long-lived cluster: searches are
# read-only and idempotent, so a crashed worker is transparently restarted
# (cold caches re-fill from the index on demand) and the in-flight call is
# retried on the new incarnation.
@ray.remote(max_restarts=4, max_task_retries=2)
class SearcherWorker:
    def __init__(self, index_dir: str, seg_ids: list[int],
                 seg_dirs: dict[int, str] | None = None):
        from ..stages.segment_build import limit_worker_arrow_threads

        limit_worker_arrow_threads()  # N workers × full-size Arrow pools thrash
        # the service passes its engine's PINNED generation paths: a worker
        # that Ray restarts after a refresh committed a new generation must
        # keep serving the generation its siblings serve, not re-read disk
        # (constructor args replay on restart, so the pin survives crashes)
        self.inner = SegmentSearchActor(index_dir, seg_dirs=seg_dirs)
        self.seg_ids = seg_ids

    def warm(self) -> int:
        """Prewarm doc stores (pg_prewarm analog); returns docs cached."""
        import os

        import pyarrow.parquet as pq

        from ..stages.segment_search import _PostingsFile

        n = 0
        for s in self.seg_ids:
            sd = self.inner.seg_dirs[s]  # committed-generation path
            p = os.path.join(sd, "docs.parquet")
            t = pq.read_table(p)
            self.inner.cache[p] = t
            pp = os.path.join(sd, "postings.parquet")
            self.inner.cache[("__pf__", pp)] = _PostingsFile(pp)
            n += t.num_rows
        return n

    def search(self, plan: SearchPlan) -> pa.Table:
        # serial loop: per-segment warm search is ~1-2 ms; parallelism comes
        # from the worker fan-out, and intra-actor threads measurably hurt
        # tail latency on an oversubscribed node
        tables = [self.inner.search(s, plan) for s in self.seg_ids]
        if not tables:  # empty partition (zero-segment index)
            return pa.table({})
        return pa.concat_tables(tables)


class SearchService:
    """Facade over the worker pool; mirrors engine.execute()/count().

    ``replicas`` > 1 duplicates the whole segment-partitioned pool: one query
    always fans out over every segment, so concurrent-query THROUGHPUT scales
    with replicas (each query round-robins onto one replica), while latency
    scales with workers-per-replica.  Size replicas × n_workers ≤ cores."""

    def __init__(self, engine, n_workers: int = 8, replicas: int = 1):
        import itertools
        import threading

        self.engine = engine
        segs = engine.seg_ids
        n_workers = max(1, min(n_workers, len(segs)))
        parts: list[list[int]] = [[] for _ in range(n_workers)]
        for i, s in enumerate(segs):
            parts[i % n_workers].append(s)
        self.pools = [
            [SearcherWorker.remote(engine.index_dir, p, engine.seg_dirs)
             for p in parts]
            for _ in range(max(1, replicas))
        ]
        ray.get([w.warm.remote() for pool in self.pools for w in pool])
        self._rr = itertools.cycle(range(len(self.pools)))
        self._lock = threading.Lock()

    @property
    def workers(self):  # backwards-compat: first replica
        return self.pools[0] if self.pools else []

    def query(self, *a, **kw):
        """Builder passthrough so callers (e.g. the HTTP facade) can treat a
        service exactly like an engine."""
        return self.engine.query(*a, **kw)

    def _run(self, q: SearchQuery, k: int):
        # same merge contract as the engine's distributed branch — shared
        # helper, so totals/ordering/tie-break cannot drift between paths
        plan = self.engine.build_plan(q, k)
        with self._lock:
            pool = self.pools[next(self._rr)]
        tables = ray.get([w.search.remote(plan) for w in pool])
        return merge_segment_partials(tables, q.order, self.engine.spec.id_cols,
                                      k, self.engine._empty_result_table)

    def execute(self, q: SearchQuery) -> SearchResult:
        total, merged = self._run(q, q.page * q.page_size)
        return paginate_result(total, merged, q, self.engine.spec,
                               self.engine._custom_transformer)

    def count(self, q: SearchQuery) -> int:
        return self._run(q, 1)[0]

    def shutdown(self) -> None:
        for pool in self.pools:
            for w in pool:
                ray.kill(w)
        self.pools = []
