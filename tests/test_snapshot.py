"""Cross-snapshot dedup via persisted fingerprint stores
(stages/snapshot.py): store contract, probe semantics, apply routing."""

import json
import os

import pyarrow as pa
import pytest

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _store(tmp_path, name, rows, **kw):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        build_minhash_store)

    d = str(tmp_path / name)
    build_minhash_store(rd.from_arrow(pa.table(rows)), "text", "doc_id",
                        d, **kw)
    return d


def test_store_layout_and_manifest(ray_session, tmp_path):
    d = _store(tmp_path, "s", {
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": [BASE, "other words entirely"]})
    m = json.load(open(os.path.join(d, "manifest.json")))
    assert m["num_perm"] == 64 and m["bands"] == 16 and m["id_col"] == "doc_id"
    import pyarrow.parquet as pq

    sigs = pq.read_table(os.path.join(d, "sigs"))
    assert sigs.num_rows == 2 and len(sigs["sig"][0].as_py()) == 64
    bands = pq.read_table(os.path.join(d, "bands"))
    assert bands.num_rows == 2 * 16
    keys = bands["band_key"].to_pylist()
    assert keys == sorted(keys)          # sorted for row-group pruning


def test_pairs_exact_and_near_dup(ray_session, tmp_path):
    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        snapshot_dedup_pairs)

    old = _store(tmp_path, "old", {
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": [BASE, "completely different words entirely here nothing"]})
    new = _store(tmp_path, "new", {
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": [BASE, "fresh novel content with its own vocabulary"]})
    out = snapshot_dedup_pairs(new, old, threshold=0.25).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert out["id_a"].tolist() == [10] and out["id_b"].tolist() == [1]
    assert out["est_i4"].tolist() == [10000]   # identical doc → estimate 1.0


def test_manifest_mismatch_and_missing(ray_session, tmp_path):
    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        snapshot_dedup_pairs)

    a = _store(tmp_path, "a", {"doc_id": pa.array([1], type=pa.int64()),
                               "text": [BASE]})
    b = _store(tmp_path, "b", {"doc_id": pa.array([2], type=pa.int64()),
                               "text": [BASE]}, bands=8)
    with pytest.raises(ValueError, match="incompatible fingerprint stores"):
        snapshot_dedup_pairs(a, b)
    with pytest.raises(FileNotFoundError, match="manifest.json"):
        snapshot_dedup_pairs(a, str(tmp_path / "nonexistent"))


def test_apply_drops_matches_and_is_idempotent(ray_session, tmp_path):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        snapshot_dedup_apply, snapshot_dedup_pairs)

    old = _store(tmp_path, "old", {
        "doc_id": pa.array([1], type=pa.int64()), "text": [BASE]})
    new_rows = {"doc_id": pa.array([10, 11], type=pa.int64()),
                "text": [BASE, "fresh novel content with its own vocabulary"]}
    new = _store(tmp_path, "new", new_rows)
    pairs = snapshot_dedup_pairs(new, old, threshold=0.25)
    kept = snapshot_dedup_apply(rd.from_arrow(pa.table(new_rows)), pairs) \
        .to_pandas()
    assert kept["doc_id"].tolist() == [11]
    # snapshot vs ITSELF: every doc matches its own id → id == rep → kept
    self_pairs = snapshot_dedup_pairs(new, new, threshold=0.25)
    kept2 = snapshot_dedup_apply(rd.from_arrow(pa.table(new_rows)),
                                 self_pairs).to_pandas()
    assert sorted(kept2["doc_id"].tolist()) == [10, 11]


def test_hot_bucket_cap_drops_candidates(ray_session, tmp_path):
    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        snapshot_dedup_pairs)

    # 5 identical old docs → every band bucket holds 5 rows on the old side
    old = _store(tmp_path, "old", {
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": [BASE] * 5})
    new = _store(tmp_path, "new", {
        "doc_id": pa.array([10], type=pa.int64()), "text": [BASE]})
    full = snapshot_dedup_pairs(new, old, threshold=0.25,
                                max_bucket_occupancy=None)
    assert full.count() == 5
    capped = snapshot_dedup_pairs(new, old, threshold=0.25,
                                  max_bucket_occupancy=4)
    assert capped.count() == 0


def test_custom_analyzer_rejected(ray_session, tmp_path):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.functions.analyzer import (
        Analyzer)
    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        build_minhash_store)

    with pytest.raises(ValueError, match="default analyzer"):
        build_minhash_store(
            rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                                    "text": [BASE]})),
            "text", "doc_id", str(tmp_path / "x"),
            analyzer=Analyzer(stopwords=True))


def _emb_store(tmp_path, name, ids, vecs, **kw):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        build_embedding_store)

    d = str(tmp_path / name)
    tab = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(vecs,
                                          type=pa.list_(pa.float32()))})
    build_embedding_store(rd.from_arrow(tab), "embedding", "vec_id", d, **kw)
    return d


def test_embedding_store_pairs_and_kind_guard(ray_session, tmp_path):
    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        snapshot_dedup_pairs, snapshot_semdedup_pairs)

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    near_v = [0.98, 0.2, 0.0, 0.0]
    old = _emb_store(tmp_path, "eo", [1, 2], [v, w])
    new = _emb_store(tmp_path, "en", [10, 11, 12], [v, near_v, w])
    out = snapshot_semdedup_pairs(new, old, threshold=0.9).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert out["id_a"].tolist() == [10, 11, 12]
    assert out["id_b"].tolist() == [1, 1, 2]
    assert out["cos_i4"].tolist()[0] == 10000      # identical vector
    assert 9000 <= out["cos_i4"].tolist()[1] < 10000

    # kind guards: embedding store into the MinHash probe and vice versa
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a MinHash store"):
        snapshot_dedup_pairs(new, old)
    text = _store(tmp_path, "txt", {
        "doc_id": pa.array([1], type=pa.int64()), "text": [BASE]})
    with _pytest.raises(ValueError, match="not an embedding store"):
        snapshot_semdedup_pairs(text, text)


def test_embedding_store_param_mismatch(ray_session, tmp_path):
    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        snapshot_semdedup_pairs)

    v = [1.0, 0.0]
    a = _emb_store(tmp_path, "ea", [1], [v])
    b = _emb_store(tmp_path, "eb", [2], [v], bands=6)
    with pytest.raises(ValueError, match="incompatible embedding stores"):
        snapshot_semdedup_pairs(a, b)


def test_clear_store_dir_refuses_foreign_dirs(ray_session, tmp_path):
    import ray.data as rd

    from project_gutenberg_full_text_search_ray.stages.snapshot import (
        build_minhash_store)

    target = tmp_path / "precious"
    target.mkdir()
    (target / "my_data.txt").write_text("do not delete")
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                                 "text": [BASE]}))
    with pytest.raises(ValueError, match="non-store entries"):
        build_minhash_store(ds, "text", "doc_id", str(target))
    assert (target / "my_data.txt").read_text() == "do not delete"
    # rebuilding over a FINISHED store is allowed (and starts clean)
    ok = tmp_path / "store"
    build_minhash_store(ds, "text", "doc_id", str(ok))
    build_minhash_store(ds, "text", "doc_id", str(ok))
    import pyarrow.parquet as pq

    assert pq.read_table(str(ok / "sigs")).num_rows == 1
