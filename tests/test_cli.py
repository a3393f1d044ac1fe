"""CLI facade smoke via subprocess (owns its own Ray session)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def cli_index(tmp_path_factory):
    from project_gutenberg_full_text_search_ray.sources.transcripts import gen_transcripts

    d = tmp_path_factory.mktemp("cli")
    src = str(d / "corpus.parquet")
    pq.write_table(gen_transcripts(60, 8, seed=5), src, row_group_size=200)
    idx = str(d / "idx")
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-m", "project_gutenberg_full_text_search_ray.cli", "build", src, idx],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 480
    return idx


def _run_cli(*args):
    out = subprocess.run(
        [sys.executable, "-m", "project_gutenberg_full_text_search_ray.cli", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_search_and_stats(cli_index):
    r = _run_cli("search", cli_index, "the", "--size", "3", "--filter", "role:==:user")
    assert r["total"] > 0 and len(r["rows"]) == 3
    assert all(row["role"] == "user" for row in r["rows"])
    c = _run_cli("search", cli_index, "the", "--count-only")
    assert c["total"] >= r["total"]
    s = _run_cli("stats", cli_index)
    assert s["n_docs"] == 480


def test_cli_suggest_and_did_you_mean(cli_index):
    r = _run_cli("suggest", cli_index, "--prefix", "w00", "--k", "5")
    assert len(r["suggestions"]) == 5
    dfs = [s["df"] for s in r["suggestions"]]
    assert dfs == sorted(dfs, reverse=True)
    w = _run_cli("suggest", cli_index, "--word", "quik")
    assert w["suggestions"][0]["term"] == "quick"
    # --prefix/--word are mutually exclusive and one is required (argparse
    # exits 2 on both violations)
    for extra in ([], ["--prefix", "a", "--word", "b"]):
        out = subprocess.run(
            [sys.executable, "-m", "project_gutenberg_full_text_search_ray.cli",
             "suggest", cli_index, *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)
        assert out.returncode == 2


def test_cli_headline(ray_session, tmp_path):
    import pyarrow as pa

    from project_gutenberg_full_text_search_ray import CorpusSpec, build_index

    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(3), type=pa.int64()),
                  "text": ["the table scan wins", "a table only", "nothing"]}),
        src)
    idx = str(tmp_path / "idx")
    build_index(src, CorpusSpec(("doc_id",), "text", (), "cli_hl"), idx)
    r = _run_cli("headline", idx, "table scan", "--source", src,
                 "--k", "2", "--max-words", "3", "--start-sel", "[",
                 "--stop-sel", "]")
    assert r["total"] == 1
    # earliest of the two tied 2-hit windows wins
    assert r["rows"][0]["snippet"] == "the [table] [scan]"
    assert r["rows"][0]["n_hits"] == 2


def test_cli_contains_multi_honors_filters(cli_index):
    """The contains-multi CLI path must apply --filter like the HTTP facade
    (it used to return before the filter loop, printing every role)."""
    # 'w00001 w00002' is a deterministic two-token phrase in gen_transcripts;
    # its lowered form is multi-token, so it routes through contains_multi
    all_rows = _run_cli("search", cli_index, "w00001 w00002", "--type", "contains",
                        "--size", "100")
    flt = _run_cli("search", cli_index, "w00001 w00002", "--type", "contains",
                   "--size", "100", "--filter", "role:==:user")
    assert all_rows["total"] > 0
    assert all(row["role"] == "user" for row in flt["rows"])
    assert flt["total"] == sum(1 for r in all_rows["rows"] if r["role"] == "user")
    c = _run_cli("search", cli_index, "w00001 w00002", "--type", "contains",
                 "--count-only", "--filter", "role:==:user")
    assert c["total"] == flt["total"]


def test_cli_prep_split_and_sessionize(ray_session, tmp_path):
    """`prep` subcommand: training-data ops run parquet→parquet end to end."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(50)),
        "text": [f"doc number {i} body words w{i}" for i in range(50)],
    }), docs)
    out1 = str(tmp_path / "split_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "split", docs, out1])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out1)
    assert t.num_rows == 50 and set(t["split"].to_pylist()) <= {"train", "val", "test"}

    events = str(tmp_path / "ev.parquet")
    pq.write_table(pa.table({
        "event_id": [1, 2, 3], "user_id": [1, 1, 1],
        "ts": pa.array([0, 10, 10_000_000_000], type=pa.timestamp("us")),
    }), events)
    out2 = str(tmp_path / "sess_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "sessionize", events, out2, "--id-col", "event_id"])
    assert rc == 0
    s = pq.read_table(out2).to_pandas().set_index("event_id")["session_id"]
    assert s[1] == 1 and s[2] == 1 and s[3] == 3  # 30-min default gap splits

    # contamination without --bench is a loud usage error
    rc = main(["prep", "contamination", docs, str(tmp_path / "x")])
    assert rc == 2


def test_cli_ingest_and_build_jsonl(tmp_path):
    """ingest (jsonl→parquet) + build --format jsonl produce the same index
    stats, and the jsonl-built index serves searches."""
    import json as _json

    from project_gutenberg_full_text_search_ray.sources.transcripts import gen_transcripts

    t = gen_transcripts(30, 6, seed=11)
    jl = str(tmp_path / "turns.jsonl")
    with open(jl, "w") as f:
        for r in t.to_pylist():
            r["ts"] = r["ts"].isoformat() if r["ts"] is not None else None
            f.write(_json.dumps(r) + "\n")

    conv = _run_cli("ingest", jl, str(tmp_path / "pq"))
    assert conv["files"] >= 1

    b1 = _run_cli("build", jl, str(tmp_path / "idx_jl"), "--format", "jsonl")
    b2 = _run_cli("build", str(tmp_path / "pq"), str(tmp_path / "idx_pq"))
    assert b1["n_docs"] == b2["n_docs"] == 180
    assert b1["avgdl"] == b2["avgdl"]

    r = _run_cli("search", str(tmp_path / "idx_jl"), "the", "--size", "3")
    assert r["total"] > 0 and len(r["rows"]) == 3


def test_cli_prep_pack_and_scrub(ray_session, tmp_path):
    """`prep pack` and `prep scrub` run parquet→parquet end to end."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": list(range(40)),
        "text": [f"shared boilerplate header unique{i} tail{i}"
                 for i in range(40)],
    }), docs)

    out1 = str(tmp_path / "pack_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "pack", docs, out1, "--capacity", "16"])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out1)
    assert t.num_rows == 40
    assert set(t.column_names) >= {"doc_id", "n_tokens", "pack_id"}
    # 5 tokens/doc, capacity 16 → packs hold >1 doc and ids are monotone
    packs = t.to_pandas().sort_values("doc_id")["pack_id"].tolist()
    assert packs == sorted(packs) and packs[0] == 0 and packs[-1] > 0

    out2 = str(tmp_path / "scrub_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "scrub", docs, out2, "--max-df-frac", "0.5"])
    assert rc == 0
    s = pq.read_table(out2).to_pandas().set_index("doc_id")["clean_text"]
    # the shared 2-gram spans are gone, per-doc unique tails survive
    assert all("shared boilerplate" not in v for v in s)
    assert any("unique" in v for v in s)


def test_cli_prep_knn_ivf(ray_session, tmp_path):
    """`prep knn --ivf-dir` builds the IVF index when absent and answers via
    per-row probes; probe-all output matches the exact-join CLI path."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    rng = np.random.default_rng(3)
    vecs = str(tmp_path / "vecs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(60), type=pa.int64()),
        "embedding": pa.array(rng.normal(size=(60, 8)).tolist(),
                              type=pa.list_(pa.float32())),
    }), vecs)

    def run(argv):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(argv)
        assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1

    exact_out = str(tmp_path / "knn_exact")
    run(["prep", "knn", vecs, exact_out, "--k", "3"])
    ivf_out = str(tmp_path / "knn_ivf")
    run(["prep", "knn", vecs, ivf_out, "--ivf-dir", str(tmp_path / "ivf"),
         "--n-lists", "4", "--n-probe", "4", "--k", "3"])
    key = ["doc_id", "rank"]
    a = pq.read_table(exact_out).sort_by([(c, "ascending") for c in key])
    b = pq.read_table(ivf_out).sort_by([(c, "ascending") for c in key])
    assert a.select(a.column_names).equals(b.select(a.column_names))
    assert a.num_rows == 60 * 3


def test_cli_prep_pii_chunk_repetition(ray_session, tmp_path):
    """`prep pii|chunk|repetition` run parquet→parquet end to end."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": ["mail a@b.io twice a@b.io", "a b c d e", "x x x", "clean"],
    }), docs)

    def run(argv):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(argv)
        assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1

    run(["prep", "pii", docs, str(tmp_path / "o1")])
    t = pq.read_table(tmp_path / "o1").sort_by([("doc_id", "ascending")])
    assert t["n_pii"].to_pylist() == [2, 0, 0, 0]
    assert "<EMAIL>" in t["clean_text"][0].as_py()

    run(["prep", "chunk", docs, str(tmp_path / "o2"),
         "--chunk-tokens", "2", "--overlap", "1"])
    t = pq.read_table(tmp_path / "o2")
    d1 = t.filter(pa.compute.equal(t["doc_id"], 1)).sort_by(
        [("chunk_idx", "ascending")])
    assert d1["chunk_text"].to_pylist() == ["a b", "b c", "c d", "d e"]

    run(["prep", "repetition", docs, str(tmp_path / "o3")])
    t = pq.read_table(tmp_path / "o3").sort_by([("doc_id", "ascending")])
    assert t["dup_word_per_10k"].to_pylist()[2] == 6666  # "x x x": 2/3 dup

    run(["prep", "normalize", docs, str(tmp_path / "o4")])
    t = pq.read_table(tmp_path / "o4").sort_by([("doc_id", "ascending")])
    assert t["norm_text"].to_pylist()[1] == "a b c d e"
    assert t["changed"].to_pylist()[1] is False


def test_cli_prep_dedup_apply(ray_session, tmp_path):
    """`prep dedup-apply` materializes the fuzzy-dedup chain: near-identical
    docs collapse to their min-id canonical, distinct docs all survive with
    every original column."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark woods tonight")
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": [base, base, base + " extra", "completely different words here",
                 "another unrelated document body", base],
        "lang": ["en"] * 6,
    }), docs)
    out = str(tmp_path / "deduped")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "dedup-apply", docs, out, "--threshold", "0.5"])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out).sort_by([("doc_id", "ascending")])
    kept = t["doc_id"].to_pylist()
    # 0,1,2,5 are one near-dup cluster → only canonical 0 survives
    assert 0 in kept and not {1, 2, 5} & set(kept)
    assert {3, 4} <= set(kept)
    assert set(t.column_names) == {"doc_id", "text", "lang"}


def test_cli_prep_dedup_exact_apply(ray_session, tmp_path):
    """`prep dedup-exact-apply` keeps the min-id copy of identical texts
    with all original columns."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": ["same", "same", "other", "same"],
        "lang": ["en", "de", "en", "fr"],
    }), docs)
    out = str(tmp_path / "o")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "dedup-exact-apply", docs, out])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out).sort_by([("doc_id", "ascending")])
    assert t["doc_id"].to_pylist() == [1, 3]
    assert set(t.column_names) == {"doc_id", "text", "lang"}


def test_cli_prep_simjoin(ray_session, tmp_path):
    """`prep simjoin` matches each left row to its best right row."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    base = "alpha beta gamma delta epsilon zeta eta theta"
    left = str(tmp_path / "l.parquet")
    right = str(tmp_path / "r.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                             "text": [base, "nothing shared here at all"]}), left)
    pq.write_table(pa.table({"doc_id": pa.array([5], type=pa.int64()),
                             "text": [base + " extra"]}), right)
    out = str(tmp_path / "o")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "simjoin", left, out, "--right", right,
                   "--threshold", "0.5"])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out)
    assert t["left_id"].to_pylist() == [0] and t["right_id"].to_pylist() == [5]

    # missing --right is a loud usage error
    assert main(["prep", "simjoin", left, str(tmp_path / "x")]) == 2


def test_cli_prep_quantiles(ray_session, tmp_path):
    """`prep quantiles` computes exact unbounded-cardinality quantiles
    (global and --by group) and writes the report parquet."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "g": ["a"] * 5 + ["b"] * 5,
        "x": pa.array([1, 2, 3, 4, 100, 10, 20, 30, 40, 50],
                      type=pa.int64())}), src)
    out = str(tmp_path / "o")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "quantiles", src, out, "--val-col", "x",
                   "--pcts", "p50:0.5,p100:1.0"])
    assert rc == 0
    rep = _json.loads(buf.getvalue().splitlines()[0])["quantiles"]
    assert {r["pct"]: r["val"] for r in rep} == {"p50": 10, "p100": 100}
    assert pq.read_table(out).num_rows == 2

    out2 = str(tmp_path / "o2")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "quantiles", src, out2, "--val-col", "x",
                   "--by", "g", "--pcts", "p50:0.5"])
    assert rc == 0
    rep = _json.loads(buf.getvalue().splitlines()[0])["quantiles"]
    assert {(r["g"], r["pct"]): r["val"] for r in rep} == {
        ("a", "p50"): 3, ("b", "p50"): 30}


def test_cli_prep_kmeans_semdedup_dupspans_lmscore(ray_session, tmp_path):
    """The four round-5 prep ops end-to-end through the CLI: k-means
    assignment, clustered SemDeDup materializer, duplicate spans, LM
    surprisal scores — each writes partitioned parquet with the documented
    schema."""
    import io
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    vecs = str(tmp_path / "v.parquet")
    base = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(9), type=pa.int64()),
        "embedding": pa.array([base[i % 3] for i in range(9)],
                              type=pa.list_(pa.float32()))}), vecs)
    docs = str(tmp_path / "d.parquet")
    shared = "alpha beta gamma delta epsilon zeta"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": [f"one {shared}", f"{shared} two", "unrelated text here"]}),
        docs)

    def run(argv, out):
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert main(argv + [out]) == 0
        return pq.read_table(out)

    km = run(["prep", "kmeans", vecs, "--id-col", "vec_id",
              "--n-clusters", "3"], str(tmp_path / "km"))
    assert km.num_rows == 9
    got = dict(zip(km["vec_id"].to_pylist(), km["cluster"].to_pylist()))
    # identical vectors land in identical clusters
    for i in range(9):
        assert got[i] == got[i % 3]
    # hash-chosen seeds may coincide on duplicate points (a starved cluster
    # keeps its centroid) — at least the space must actually partition
    assert len(set(got.values())) >= 2

    sd = run(["prep", "semdedup", vecs, "--id-col", "vec_id",
              "--n-clusters", "3", "--threshold", "0.9"],
             str(tmp_path / "sd"))
    # each duplicate triple collapses to its min-id member
    assert sorted(sd["vec_id"].to_pylist()) == [0, 1, 2]

    ds = run(["prep", "dupspans", docs, "--win", "4"], str(tmp_path / "ds"))
    assert sorted(ds["doc_id"].to_pylist()) == [0, 1]

    lm = run(["prep", "lmscore", docs], str(tmp_path / "lm"))
    assert lm.num_rows == 3
    assert lm.schema.names == ["doc_id", "n_tokens", "bits_q", "bpt_q"]


def test_cli_prep_tempsample_pplxbuckets(ray_session, tmp_path):
    """Training-mix ops through the CLI: temperature resampling keeps the
    min group whole and downsamples the rest; perplexity bucketing labels
    every doc (head/middle/tail or NULL for token-less)."""
    import io
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    docs = str(tmp_path / "d.parquet")
    n = 90
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "lang": pa.array(["en"] * 75 + ["fr"] * 15, type=pa.string()),
        "text": pa.array(["common word " + " ".join(
            f"u{i}x{j}" for j in range(i % 4)) for i in range(n)],
            type=pa.string())}), docs)

    def run(argv, out):
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert main(argv + [out]) == 0
        return pq.read_table(out)

    ts = run(["prep", "tempsample", docs], str(tmp_path / "ts"))
    langs = ts["lang"].to_pylist()
    assert langs.count("fr") == 15            # min group: rate 1.0
    assert 0 < langs.count("en") < 75         # majority group downsampled

    pb = run(["prep", "pplxbuckets", docs], str(tmp_path / "pb"))
    assert pb.num_rows == n
    assert pb.schema.names == ["doc_id", "lang", "bpt_q", "bucket"]
    assert set(pb["bucket"].to_pylist()) <= {"head", "middle", "tail", None}


def test_cli_prep_dsir(ray_session, tmp_path):
    """`prep dsir` scores raw docs toward --target; --select-k picks the
    deterministic top-k."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    raw = str(tmp_path / "raw.parquet")
    tgt = str(tmp_path / "tgt.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["cat sat mat", "dog ran far", "cat sat mat"]}), raw)
    pq.write_table(pa.table({"text": ["cat sat mat cat"]}), tgt)
    out = str(tmp_path / "w")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "dsir", raw, out, "--target", tgt])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out).sort_by([("doc_id", "ascending")])
    assert t.column_names == ["doc_id", "n_feats", "dsir_wq"]
    wq = t["dsir_wq"].to_pylist()
    assert wq[0] == wq[2] and wq[0] > wq[1]

    sel = str(tmp_path / "s")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "dsir", raw, sel, "--target", tgt,
                   "--select-k", "1"])
    assert rc == 0
    assert pq.read_table(sel)["doc_id"].to_pylist() == [1]

    # missing --target is a loud usage error
    assert main(["prep", "dsir", raw, str(tmp_path / "x")]) == 2


def test_cli_prep_snapstore_snapdedup(ray_session, tmp_path):
    """`prep snapstore` builds a fingerprint store; `prep snapdedup` drops
    new docs matching it."""
    import io
    import json as _json
    import os as _os
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    base = "the quick brown fox jumps over the lazy dog again and again"
    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                             "text": [base]}), old)
    pq.write_table(pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": [base, "fresh novel content with its own vocabulary"]}), new)
    store = str(tmp_path / "store")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "snapstore", old, store])
    assert rc == 0 and _json.loads(buf.getvalue())["num_perm"] == 64
    assert _os.path.exists(_os.path.join(store, "manifest.json"))

    out = str(tmp_path / "deduped")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "snapdedup", new, out, "--old-store", store,
                   "--threshold", "0.25"])
    assert rc == 0
    assert pq.read_table(out)["doc_id"].to_pylist() == [11]

    # missing --old-store is a loud usage error
    assert main(["prep", "snapdedup", new, str(tmp_path / "x")]) == 2


def test_cli_prep_r5_late_ops(ray_session, tmp_path):
    """`prep collocations | linededup | groupcap` run parquet→parquet end
    to end with the documented knobs."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    import pyarrow as pa
    import pyarrow.parquet as pq

    from project_gutenberg_full_text_search_ray.cli import main

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "text": [f"new york city item{i} | new york" for i in range(30)],
        "source": pa.array([f"s{i % 3}" for i in range(30)]),
    }), docs)

    out1 = str(tmp_path / "colloc_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["prep", "collocations", docs, out1,
                   "--k", "5", "--min-count", "2"])
    assert rc == 0 and _json.loads(buf.getvalue())["files"] >= 1
    t = pq.read_table(out1)
    pairs = list(zip(t["w1"].to_pylist(), t["w2"].to_pylist()))
    assert ("new", "york") in pairs

    out2 = str(tmp_path / "ld_out")
    with redirect_stdout(io.StringIO()):
        rc = main(["prep", "linededup", docs, out2, "--sep", " | "])
    assert rc == 0
    t = pq.read_table(out2).to_pandas().set_index("doc_id")["text"]
    assert t[0] == "new york city item0 | new york"
    assert t[1] == "new york city item1"  # trailing dup line removed

    out3 = str(tmp_path / "gc_out")
    with redirect_stdout(io.StringIO()):
        rc = main(["prep", "groupcap", docs, out3,
                   "--group-col", "source", "--cap", "4"])
    assert rc == 0
    t = pq.read_table(out3)
    import collections
    c = collections.Counter(t["source"].to_pylist())
    assert t.num_rows == 12 and max(c.values()) == 4
