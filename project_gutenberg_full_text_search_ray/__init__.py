"""Ray-Data-native full-text search engine.

A from-scratch re-implementation of the capabilities of
zachjesus/Project-Gutenberg-Full-Text-Search (reference read-only at
/root/reference) on Ray Data: inverted-index build as a streaming Dataset
pipeline (tokenize → segment shuffle → delta+VByte posting lists → lineage
manifests), BM25 boolean/phrase retrieval in segment tasks/actor pools, the
reference's filter/order/pagination/crosswalk surface, plus the
training-data-pipeline extras (dedup, similarity search, text analysis,
multimodal plumbing).  See SURVEY.md for the full operator mapping.
"""

from .corpus import DOCUMENTS_SPEC, TRANSCRIPTS_SPEC, CorpusSpec
from .crosswalks import Crosswalk
from .functions.analyzer import DEFAULT_ANALYZER, Analyzer
from .functions.querylang import parse_query
from .pipelines.build import IndexInfo, build_index, compact_index, refresh_index
from .pipelines.search import (
    RANDOM,
    RELEVANCE,
    FullTextSearchEngine,
    SearchQuery,
    SearchResult,
    headline,
    more_like_this,
)
from .stages.headline import headline_column
from .pipelines.batch_search import (
    batch_search_dataset,
    export_results_parquet,
    finalize_batch_results,
)
from .pipelines.http_api import SearchAPI, SearchHTTPServer
from .pipelines.serving import SearchService
from .stages.segment_search import FilterSpec
from .state.manifest import vacuum_index

__all__ = [
    "CorpusSpec",
    "DOCUMENTS_SPEC",
    "TRANSCRIPTS_SPEC",
    "Crosswalk",
    "Analyzer",
    "DEFAULT_ANALYZER",
    "parse_query",
    "build_index",
    "compact_index",
    "refresh_index",
    "IndexInfo",
    "FullTextSearchEngine",
    "SearchQuery",
    "SearchResult",
    "headline",
    "headline_column",
    "more_like_this",
    "FilterSpec",
    "RELEVANCE",
    "RANDOM",
    "SearchAPI",
    "SearchHTTPServer",
    "SearchService",
    "vacuum_index",
    "batch_search_dataset",
    "finalize_batch_results",
    "export_results_parquet",
]
