"""duplicate_spans (stages/corpus_prep.py): hand-verifiable span semantics
— cross-doc and self-repeat detection, interval merging, the broadcast vs
native-join route identity, and edge cases (NULLs, short docs, no dups)."""

import pyarrow as pa
import pytest


def _spans(ds, **kw):
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        duplicate_spans)

    df = duplicate_spans(ds, "text", "doc_id", **kw).to_pandas()
    if "doc_id" not in df.columns:  # empty Dataset.to_pandas drops schema
        return []
    return sorted(map(tuple, df[["doc_id", "span_start", "span_end",
                                 "n_windows"]].values.tolist()))


def _ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}))


def test_cross_doc_and_merge(ray_session):
    """Two docs share one 4-token run (win=3 → two overlapping windows →
    ONE merged span each); a third unrelated doc reports nothing."""
    shared = "alpha beta gamma delta"
    texts = [f"start {shared} end", f"{shared} trailing words here",
             "totally unrelated content entirely"]
    got = _spans(_ds(texts), win=3)
    # duplicated windows: 'alpha beta gamma' and 'beta gamma delta' —
    # doc 0 at pos 1,2 → span [1, 5); doc 1 at pos 0,1 → span [0, 4)
    assert got == [(0, 1, 5, 2), (1, 0, 4, 2)]


def test_self_repeat_counts(ray_session):
    """A window repeated WITHIN one document qualifies (total count ≥ 2,
    Lee et al. semantics) — two disjoint spans, not merged across the gap."""
    texts = ["aa bb cc xx yy zz qq rr aa bb cc"]
    got = _spans(_ds(texts), win=3)
    # 'aa bb cc' at pos 0 and pos 8 — gap 8 > win 3 → two spans
    assert got == [(0, 0, 3, 1), (0, 8, 11, 1)]


def test_adjacent_windows_merge(ray_session):
    """Duplicated windows whose spans touch end-to-start merge into one
    maximal span (pos == prev + win merges; pos == prev + win + 1 splits)."""
    run = "t1 t2 t3 t4 t5 t6"  # 6 tokens: win=3 windows at pos 0..3
    texts = [run, f"pad {run} pad2"]
    got = _spans(_ds(texts), win=3)
    assert got == [(0, 0, 6, 4), (1, 1, 7, 4)]


def test_min_count_threshold(ray_session):
    """min_count=3: a window occurring twice no longer qualifies."""
    shared = "p q r"
    texts = [shared, shared, f"{shared} again", "other stuff entirely"]
    got2 = _spans(_ds(texts), win=3, min_count=3)
    assert got2 == [(0, 0, 3, 1), (1, 0, 3, 1), (2, 0, 3, 1)]
    got3 = _spans(_ds(texts), win=3, min_count=4)
    assert got3 == []


def test_join_route_matches_broadcast(ray_session):
    """broadcast_threshold=0 forces the native inner-join semi-join route;
    output must be identical to the broadcast membership route."""
    shared = "m1 m2 m3 m4 m5"
    texts = [f"a b {shared}", f"{shared} c d", "e f g h i j"]
    ds = _ds(texts)
    assert _spans(ds, win=4) == _spans(ds, win=4, broadcast_threshold=0)
    assert len(_spans(ds, win=4)) == 2


def test_edges_and_nulls(ray_session):
    """Docs shorter than win, NULL texts and NULL ids never crash and never
    report; an entirely duplicate-free corpus returns a typed empty table."""
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, None], type=pa.int64()),
        "text": pa.array(["tiny", None, "one two", "x y z w"],
                         type=pa.string()),
    })
    out = (rd.from_arrow(t)
           .map_batches(lambda b: b, batch_format="pyarrow"))
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        duplicate_spans)

    res = duplicate_spans(out, "text", "doc_id", win=3)
    assert res.count() == 0
    assert res.schema().names == ["doc_id", "span_start", "span_end",
                                  "n_windows"]


def test_param_validation(ray_session):
    from project_gutenberg_full_text_search_ray.stages.corpus_prep import (
        duplicate_spans)

    ds = _ds(["a b c"])
    with pytest.raises(ValueError, match="min_count"):
        duplicate_spans(ds, "text", "doc_id", min_count=1)
    with pytest.raises(ValueError, match="win"):
        duplicate_spans(ds, "text", "doc_id", win=0)
