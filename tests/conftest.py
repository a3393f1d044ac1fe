import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_table():
    from project_gutenberg_full_text_search_ray.sources.transcripts import gen_transcripts

    return gen_transcripts(n_convs=200, turns_per_conv=8, seed=42)


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory, transcripts_table):
    p = tmp_path_factory.mktemp("fixtures") / "transcripts.parquet"
    pq.write_table(transcripts_table, str(p))
    return str(p)


@pytest.fixture(scope="session")
def index_dir(ray_session, transcripts_path, tmp_path_factory):
    from project_gutenberg_full_text_search_ray import TRANSCRIPTS_SPEC, build_index

    d = str(tmp_path_factory.mktemp("index") / "transcripts_idx")
    build_index(transcripts_path, TRANSCRIPTS_SPEC, d, docs_per_segment=400)
    return d


@pytest.fixture(scope="session")
def engine(index_dir):
    from project_gutenberg_full_text_search_ray import FullTextSearchEngine

    return FullTextSearchEngine(index_dir)


@pytest.fixture(scope="session")
def oracle(transcripts_table):
    from project_gutenberg_full_text_search_ray import TRANSCRIPTS_SPEC
    from project_gutenberg_full_text_search_ray.oracle import BruteForceOracle

    return BruteForceOracle(transcripts_table, TRANSCRIPTS_SPEC)


@pytest.fixture(scope="session")
def engine_multi(ray_session, transcripts_table, tmp_path_factory):
    """Engine over MANY segments — exercises the ray-fan-out merge path
    (the session `engine` fixture has 1 segment → local shortcut)."""
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray import TRANSCRIPTS_SPEC, FullTextSearchEngine, build_index

    d = tmp_path_factory.mktemp("index_multi")
    src = str(d / "corpus.parquet")
    pq.write_table(transcripts_table, src, row_group_size=100)
    idx = str(d / "idx")
    build_index(src, TRANSCRIPTS_SPEC, idx, docs_per_segment=200,
                min_segments=8, min_rows_per_segment=100)
    eng = FullTextSearchEngine(idx)
    assert len(eng.seg_ids) >= 8
    return eng
