"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB.

No ``ray.init()`` / ``ray.shutdown()`` here or in the library code these
functions use (Ray Data auto-initialises when standalone).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, "/root/repo")


def entry() -> Any:
    """Flagship pipeline: build the inverted index over the sf0.001
    transcripts fixture (north-rule input shape) and run a ranked
    boolean+phrase search through the segment-searcher pipeline."""
    from project_gutenberg_full_text_search_ray import (
        RELEVANCE,
        TRANSCRIPTS_SPEC,
        FullTextSearchEngine,
        build_index,
    )
    from project_gutenberg_full_text_search_ray.sources.transcripts import transcripts_parquet
    from project_gutenberg_full_text_search_ray.state.manifest import parquet_input_fingerprint

    import os

    path = transcripts_parquet(n_convs=200, turns_per_conv=8, seed=42)
    fp = parquet_input_fingerprint([path])
    index_dir = f"/tmp/pgfts_indices/transcripts_{fp}"
    build_index(path, TRANSCRIPTS_SPEC, index_dir, docs_per_segment=400)
    eng = FullTextSearchEngine(index_dir)
    q = eng.query().search('"to be or not to be" or the').order_by(RELEVANCE)[1, 28]
    res = eng.execute(q)
    return res.table


def queries() -> dict[str, Callable[[str], Any]]:
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from project_gutenberg_full_text_search_ray.pipelines.driver_api import oracle_sql_all

    return oracle_sql_all()
