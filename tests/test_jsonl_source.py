"""JSONL ingest (sources/jsonl.py): flat + nested forms, ts coercions,
fingerprints, and build-from-JSONL == build-from-Parquet parity."""

import gzip
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from project_gutenberg_full_text_search_ray.sources.jsonl import (
    CANONICAL_SCHEMA,
    expand_jsonl_paths,
    explode_conversations,
    jsonl_input_fingerprint,
    normalize_turn_batch,
    read_transcripts_jsonl,
)
from project_gutenberg_full_text_search_ray.sources.transcripts import gen_transcripts


def _rows(table: pa.Table) -> list[dict]:
    return table.to_pylist()


def _collect(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tabs) if tabs else pa.table({})


def _sorted(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t.take(idx)


@pytest.fixture(scope="module")
def small_table():
    return gen_transcripts(n_convs=40, turns_per_conv=5, seed=7)


def _write_flat_jsonl(table: pa.Table, path: str, ts_as: str = "iso",
                      compress: bool = False):
    import datetime as dt

    opener = gzip.open if compress else open
    with opener(path, "wt") as f:
        for r in _rows(table):
            if r["ts"] is not None:
                if ts_as == "iso":
                    r["ts"] = r["ts"].isoformat()
                elif ts_as == "epoch_us":
                    r["ts"] = (r["ts"] - dt.datetime(1970, 1, 1)) \
                        // dt.timedelta(microseconds=1)
            f.write(json.dumps(r) + "\n")


def _write_nested_jsonl(table: pa.Table, path: str, with_turn_idx: bool = False):
    convs: dict[str, list[dict]] = {}
    for r in _rows(table):
        turn = {"role": r["role"], "text": r["text"], "tool": r["tool"],
                "ts": r["ts"].isoformat() if r["ts"] is not None else None}
        if with_turn_idx:
            turn["turn_idx"] = r["turn_idx"]
        convs.setdefault(r["conv_id"], []).append(turn)
    with open(path, "w") as f:
        for cid, turns in convs.items():
            f.write(json.dumps({"conv_id": cid, "turns": turns}) + "\n")


def test_flat_iso_roundtrip(ray_session, small_table, tmp_path):
    p = str(tmp_path / "flat.jsonl")
    _write_flat_jsonl(small_table, p, ts_as="iso")
    got = _sorted(_collect(read_transcripts_jsonl(p)))
    want = _sorted(small_table)
    assert got.schema.equals(CANONICAL_SCHEMA)
    assert got.equals(want.cast(CANONICAL_SCHEMA))


def test_flat_epoch_us_and_gzip(ray_session, small_table, tmp_path):
    p = str(tmp_path / "flat.jsonl.gz")
    _write_flat_jsonl(small_table, p, ts_as="epoch_us", compress=True)
    got = _sorted(_collect(read_transcripts_jsonl(p, ts_unit="us")))
    assert got.equals(_sorted(small_table).cast(CANONICAL_SCHEMA))


def test_nested_roundtrip(ray_session, small_table, tmp_path):
    p = str(tmp_path / "nested.jsonl")
    _write_nested_jsonl(small_table, p)
    got = _sorted(_collect(read_transcripts_jsonl(p, nested=True)))
    assert got.equals(_sorted(small_table).cast(CANONICAL_SCHEMA))


def test_nested_explicit_turn_idx_wins(ray_session, small_table, tmp_path):
    # drop the middle turn of each conversation; explicit turn_idx must be
    # preserved (position-derived indices would renumber 0..n-1)
    import pyarrow.compute as pc

    keep = pc.invert(pc.equal(small_table["turn_idx"], 2))
    partial = small_table.filter(keep)
    p = str(tmp_path / "partial.jsonl")
    _write_nested_jsonl(partial, p, with_turn_idx=True)
    got = _sorted(_collect(read_transcripts_jsonl(p, nested=True)))
    assert got.equals(_sorted(partial).cast(CANONICAL_SCHEMA))
    assert 2 not in got["turn_idx"].to_pylist()


def test_missing_optionals_are_null():
    batch = pa.table({
        "conv_id": pa.array([1, 2]),          # ints coerce to string
        "turn_idx": pa.array([0, 1], type=pa.int64()),
        "text": ["a", "b"],
    })
    out = normalize_turn_batch(batch)
    assert out.schema.equals(CANONICAL_SCHEMA)
    assert out["conv_id"].to_pylist() == ["1", "2"]
    assert out["role"].null_count == 2
    assert out["tool"].null_count == 2
    assert out["ts"].null_count == 2


def test_missing_required_raises():
    batch = pa.table({"conv_id": ["a"], "text": ["x"]})
    with pytest.raises(ValueError, match="turn_idx"):
        normalize_turn_batch(batch)
    conv = pa.table({"conv_id": ["a"]})
    with pytest.raises(ValueError, match="turns"):
        explode_conversations(conv)


def test_epoch_seconds_unit():
    batch = pa.table({
        "conv_id": ["c"], "turn_idx": pa.array([0], type=pa.int64()),
        "text": ["x"], "ts": pa.array([1_767_225_600], type=pa.int64()),
    })
    out = normalize_turn_batch(batch, ts_unit="s")
    assert out["ts"].to_pylist()[0].year == 2026


def test_empty_and_null_turns_lists(ray_session, tmp_path):
    p = str(tmp_path / "edge.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"conv_id": "empty", "turns": []}) + "\n")
        f.write(json.dumps({"conv_id": "null", "turns": None}) + "\n")
        f.write(json.dumps({"conv_id": "one",
                            "turns": [{"role": "user", "text": "hi"}]}) + "\n")
    got = _collect(read_transcripts_jsonl(p, nested=True))
    assert got.num_rows == 1
    assert got["conv_id"].to_pylist() == ["one"]
    assert got["turn_idx"].to_pylist() == [0]


def test_fingerprint_tracks_content(small_table, tmp_path):
    p = str(tmp_path / "fp.jsonl")
    _write_flat_jsonl(small_table, p)
    fp1 = jsonl_input_fingerprint(str(tmp_path))
    fp2 = jsonl_input_fingerprint(p)
    assert fp1 == fp2  # dir expansion == explicit file
    with open(p, "a") as f:
        f.write(json.dumps({"conv_id": "x", "turn_idx": 0, "text": "y"}) + "\n")
    assert jsonl_input_fingerprint(p) != fp1
    assert expand_jsonl_paths(str(tmp_path)) == [p]


def test_build_from_jsonl_matches_parquet(ray_session, small_table, tmp_path):
    """The parity that matters: an index built from JSONL input answers
    queries identically to one built from the same rows in Parquet."""
    from project_gutenberg_full_text_search_ray import (
        TRANSCRIPTS_SPEC, FullTextSearchEngine, build_index)

    pq_path = str(tmp_path / "t.parquet")
    pq.write_table(small_table, pq_path)
    jl_path = str(tmp_path / "t.jsonl")
    _write_flat_jsonl(small_table, jl_path)

    d_pq = str(tmp_path / "idx_pq")
    d_jl = str(tmp_path / "idx_jl")
    build_index(pq_path, TRANSCRIPTS_SPEC, d_pq, docs_per_segment=64)
    ds = read_transcripts_jsonl(jl_path)
    build_index(ds, TRANSCRIPTS_SPEC, d_jl, docs_per_segment=64,
                input_fp=jsonl_input_fingerprint(jl_path))

    e1, e2 = FullTextSearchEngine(d_pq), FullTextSearchEngine(d_jl)
    for qtext in ["the", "w00042", '"to be or not to be"']:
        r1 = e1.execute(e1.query().search(qtext)[1, 20])
        r2 = e2.execute(e2.query().search(qtext)[1, 20])
        assert r1.total == r2.total
        for c in ("conv_id", "turn_idx", "score"):
            assert r1.table[c].to_pylist() == r2.table[c].to_pylist()
