"""Index build pipeline — the flagship Ray Data pipeline (SURVEY.md §3.3/§8).

Replaces the reference's materialized-view + 33-index build
(/root/reference/tables/mv_books_dc.sql:30-494, refresh :502-514).

Parquet inputs (the 100 TB path — SHUFFLE-FREE):

    driver: parquet metadata → segment plan (pack row groups to ~target_rows)
      → map_batches over segment specs (one task per segment):
          pruned columnar read of own row-group range
          → tokenize → lexsort → delta+VByte posting blocks w/ max-score meta
          → atomic segment write + lineage manifest        # resumable
      → dictionary merge: shard (term, df, cf) PARTIALS by term-hash,
          Arrow group_by+sort per shard → dict/ parquet    # the ONLY shuffle,
          vocabulary-sized (combiner pattern: hot term costs S rows, not N)
    driver: fold seg manifests → corpus stats (N, avgdl) → commit
    manifest.json (generation commit point).

Doc partitioning is arbitrary for correctness — df/N/avgdl are global and
tf/dl per-doc, so BM25 is partitioning-invariant (proved end-to-end by
tests/test_resume.py::test_dataset_input_build_matches_parquet_build).

Dataset inputs (no file provenance): falls back to
``map_batches(assign __seg) → groupby(__seg).map_groups(SegmentBuilder)`` —
one hash-partition shuffle, same segment artifacts.

Resume = re-run with same inputs; completed segments are skipped via their
fingerprinted lineage manifests (including the input read).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..corpus import CorpusSpec
from ..functions.analyzer import DEFAULT_ANALYZER, Analyzer
from ..state.manifest import (
    dict_dirname,
    FORMAT_VERSION,
    INDEX_MANIFEST,
    SEG_MANIFEST,
    atomic_write_json,
    fingerprint,
    parquet_input_fingerprint,
    read_json,
)
from ..stages.segment_build import SEG_COL, SegmentBuilder

DEFAULT_DOCS_PER_SEGMENT = 65_536


def _hash_strings_u64(arr: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash of a string/large_string column via
    ``pandas.util.hash_array`` with a FIXED ``hash_key`` (that key is what
    makes it stable across processes/runs — Python's builtin ``hash`` is
    not).  NOTE: this exact function defines segment assignment and
    dictionary sharding for every committed index — changing the algorithm
    or the key invalidates all existing fingerprinted indexes."""
    s = arr.to_pandas().astype("string").fillna("")
    from pandas.util import hash_array

    return hash_array(s.to_numpy(dtype=object), hash_key="0123456789abcdef", categorize=False)


def _plan_file_segments(paths: list[str], target_rows: int,
                        metas: dict | None = None) -> list[dict]:
    """Deterministic segment plan: pack consecutive row groups of each file
    into ~target_rows segments.  Driver-side metadata reads only (reused
    from the caller's single metadata pass when provided)."""
    specs: list[dict] = []
    seg_id = 0
    for p in paths:
        md = metas[p] if metas is not None else pq.read_metadata(p)
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        start = 0
        acc = 0
        for i, r in enumerate(rg_rows):
            acc += r
            if acc >= target_rows or i == len(rg_rows) - 1:
                if acc > 0:
                    specs.append(
                        {"seg_id": seg_id, "path": p, "rg_start": start, "rg_end": i + 1, "n_rows": acc}
                    )
                    seg_id += 1
                start = i + 1
                acc = 0
    return specs


@dataclass
class IndexInfo:
    index_dir: str
    n_docs: int
    avgdl: float
    n_segments: int
    build_fp: str


def _assign_segments(spec: CorpusSpec, n_segments: int):
    part_col = spec.id_cols[0]  # conv_id for transcripts (keeps a conversation
    # in one segment), doc_id for documents

    def assign(batch: pa.Table) -> pa.Table:
        col = batch[part_col]
        if pa.types.is_integer(col.type):
            # fill NULL ids first: a null int column reaches numpy as float64
            # NaN, and NaN->uint64 casts are platform-dependent UB
            col = pc.fill_null(col, 0)
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            # splitmix64 finalizer — decorrelates sequential ids
            v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = v ^ (v >> np.uint64(31))
        else:
            h = _hash_strings_u64(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        seg = (h % np.uint64(n_segments)).astype(np.int32)
        return batch.append_column(SEG_COL, pa.array(seg))

    return assign


def build_index(
    source: str | list[str] | rd.Dataset,
    spec: CorpusSpec,
    index_dir: str,
    *,
    analyzer: Analyzer = DEFAULT_ANALYZER,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    min_segments: int = 128,
    min_rows_per_segment: int = 512,
    store_positions: bool = True,
    input_fp: str | None = None,
    force: bool = False,
    target_rows: int | None = None,
) -> IndexInfo:
    """Build (or resume) an index generation at ``index_dir``."""
    paths: list[str] | None = None
    ds = None
    def _absolutize(s: str) -> str:
        # absolutize sources AT BUILD TIME: the manifest records
        # input_sources for refresh, and a refresh run from a different cwd
        # with relative recorded sources would re-expand different files (or
        # none) and silently full-rebuild.  Globs keep their pattern (just
        # anchored); concrete paths take realpath so symlinked mounts
        # fingerprint identically across hosts.
        if any(c in s for c in "*?"):
            return s if os.path.isabs(s) else os.path.join(os.getcwd(), s)
        return os.path.realpath(s)

    if isinstance(source, (str, list)):
        raw = [_absolutize(s) for s in
               ([source] if isinstance(source, str) else list(source))]
        paths = []
        for s in raw:
            # every element may be a directory or a glob, same as the
            # single-string form (the fingerprint helper expands dirs too —
            # the two normalizations must agree)
            if isinstance(s, str) and os.path.isdir(s):
                paths.extend(glob.glob(os.path.join(s, "*.parquet")))
            elif isinstance(s, str) and any(c in s for c in "*?"):
                paths.extend(glob.glob(s))
            else:
                paths.append(s)
        paths.sort()
        # ONE driver-side metadata pass feeds the fingerprint, the row
        # count, and the row-group segment plan (3 footer reads per file
        # would triple startup I/O on object storage at the 100k-file scale)
        metas = {p: pq.read_metadata(p) for p in paths}
        if input_fp is None:
            input_fp = parquet_input_fingerprint(paths, metas=metas)
        n_rows = sum(md.num_rows for md in metas.values())
    else:
        # materialize once: count() would otherwise execute the source
        # pipeline in full, and the build below would execute it AGAIN
        ds = source.select_columns(spec.read_cols).materialize()
        if input_fp is None:
            # unknown lineage → cannot resume-skip; the fingerprint must be
            # UNIQUE per build: a constant marker would let a rebuild from
            # different Dataset data reproduce the committed build_fp and
            # rewrite the live generation's segment dirs in place
            import uuid

            input_fp = f"volatile-{uuid.uuid4().hex}"
            force = True
        n_rows = ds.count()

    # Target segment size: at real scale ceil(N/docs_per_segment) >> cores and
    # the cluster provides parallelism; at sandbox scale keep a deterministic
    # floor (independent of CPU count so 8-vs-32-CPU scaling runs do IDENTICAL
    # work), capped so minuscule corpora don't shatter.  A caller (refresh)
    # can PIN target_rows to the committed generation's value so appending
    # input files doesn't shift the packing — and with it every unchanged
    # segment's content fingerprint.
    if target_rows is None:
        target_rows = max(min_rows_per_segment, min(docs_per_segment, -(-n_rows // max(1, min_segments))))

    if paths is not None:
        # Shuffle-free build: segments align with file/row-group ranges.
        # Doc partitioning is arbitrary for correctness — df/N/avgdl are
        # global and tf/dl are per-doc, so BM25 scores are partitioning-
        # invariant — and file-aligned segments make the corpus-sized
        # all-to-all exchange disappear entirely (each task does one pruned
        # columnar read of its own row-group range).  This is how the build
        # behaves at 100 TB: embarrassingly parallel over input shards, with
        # only the vocabulary-sized dictionary merge crossing the network.
        specs = _plan_file_segments(paths, target_rows, metas=metas)
        n_segments = len(specs)
        # Per-segment CONTENT fingerprints (config + the exact file bytes/row
        # groups the segment covers): appending new input files leaves
        # existing segments' fingerprints unchanged, so an incremental
        # refresh re-reads NOTHING for them — only new files build.
        config_fp = fingerprint(
            f"v{FORMAT_VERSION}", analyzer.version_tag, spec.tag(),
            f"pos={int(store_positions)}", f"tr={target_rows}",
        )
        for sp in specs:
            st = os.stat(sp["path"])
            # full path + mtime_ns: an in-place rewrite preserving size/row
            # groups, or a same-basename file from a different directory,
            # must NOT resume-match a stale segment
            sp["seg_fp"] = fingerprint(
                config_fp, os.path.abspath(sp["path"]), str(st.st_size),
                str(st.st_mtime_ns),
                f"rg={sp['rg_start']}:{sp['rg_end']}", f"n={sp['n_rows']}",
            )
    else:
        n_segments = max(1, -(-n_rows // target_rows))

    build_fp = fingerprint(
        f"v{FORMAT_VERSION}", analyzer.version_tag, spec.tag(), input_fp,
        f"segs={n_segments}", f"pos={int(store_positions)}", f"tr={target_rows}",
    )

    # fast path: generation already committed for this exact fingerprint
    existing = read_json(os.path.join(index_dir, INDEX_MANIFEST))
    if existing and existing.get("fingerprint") == build_fp and not force:
        return IndexInfo(index_dir, existing["n_docs"], existing["avgdl"], existing["n_segments"], build_fp)

    os.makedirs(index_dir, exist_ok=True)
    if force and paths is not None:
        # force = rebuild THIS plan's segments from scratch: drop only the
        # seg manifests the plan would resume from.  A blanket glob would
        # also strip the committed generation's lineage manifests — a crash
        # mid-rebuild must leave the old generation fully intact.  (The
        # Dataset path needs no removal: its volatile fingerprint is unique,
        # so no stale dir can match.)
        from ..state.manifest import seg_dir as _seg_dir

        for sp in specs:
            mp = os.path.join(_seg_dir(index_dir, sp["seg_id"], sp["seg_fp"]), SEG_MANIFEST)
            if os.path.exists(mp):
                os.remove(mp)

    builder = SegmentBuilder(index_dir, spec, analyzer, build_fp, store_positions=store_positions)

    if paths is not None:
        read_cols = spec.read_cols

        def build_from_file(batch: pa.Table) -> pa.Table:
            from ..stages.segment_build import limit_worker_arrow_threads

            limit_worker_arrow_threads()
            outs = []
            for row in batch.to_pylist():
                cached = builder.resume_partials(row["seg_id"], fp=row["seg_fp"])  # skips the read too
                if cached is None:
                    pf = pq.ParquetFile(row["path"])
                    t = pf.read_row_groups(
                        list(range(row["rg_start"], row["rg_end"])), columns=read_cols
                    )
                    cached = builder.build_segment(row["seg_id"], t, fp=row["seg_fp"])
                outs.append(cached)
            return pa.concat_tables(outs)

        term_partials = rd.from_items(specs).map_batches(
            build_from_file, batch_size=1, batch_format="pyarrow"
        )
    else:

        def build_segment_group(group: pa.Table) -> pa.Table:
            from ..stages.segment_build import limit_worker_arrow_threads

            limit_worker_arrow_threads()
            return builder(group)

        term_partials = (
            ds.map_batches(_assign_segments(spec, n_segments), batch_format="pyarrow")
            .groupby(SEG_COL)
            .map_groups(build_segment_group, batch_format="pyarrow")
        )
    expected_fps = {sp["seg_id"]: sp["seg_fp"] for sp in specs} if paths is not None else None
    return _finalize_generation(
        index_dir, term_partials, build_fp, analyzer, spec,
        input_fp=input_fp, input_paths=paths,
        n_segments=n_segments, store_positions=store_positions,
        expected_fps=expected_fps, target_rows=target_rows,
        input_sources=(raw if paths is not None else None),
    )


def _finalize_generation(
    index_dir: str,
    term_partials: rd.Dataset,
    build_fp: str,
    analyzer: Analyzer,
    spec: CorpusSpec,
    *,
    input_fp: str,
    input_paths: list[str] | None,
    n_segments: int,
    store_positions: bool,
    expected_fps: dict[int, str] | None = None,
    target_rows: int | None = None,
    input_sources=None,
) -> IndexInfo:
    """Dictionary merge + manifest fold + generation commit (shared by fresh
    builds and compaction).

    The dictionary is the term-keyed shuffle, run over per-segment PARTIALS
    (vocabulary-sized, not token-sized — combiner pattern).  We shard by
    term-hash and merge each shard with Arrow-native group_by/sort_by (C++),
    which profiles ~30× faster than row-based aggregation here.  Each shard
    file is term-sorted → parquet row-group stats prune term lookups."""
    n_dict_shards = max(8, n_segments // 8)

    def add_term_shard(batch: pa.Table) -> pa.Table:
        h = _hash_strings_u64(batch["term"].combine_chunks() if isinstance(batch["term"], pa.ChunkedArray) else batch["term"])
        return batch.append_column("__shard", pa.array((h % np.uint64(n_dict_shards)).astype(np.int32)))

    def merge_dict_shard(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        t = g.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        t = pa.table({"term": t["term"], "df": t["df_sum"], "cf": t["cf_sum"]})
        return t.sort_by("term")

    dictionary = (
        term_partials.map_batches(add_term_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(merge_dict_shard, batch_format="pyarrow")
    )
    # generation-qualified dictionary dir: the committed generation's dict
    # (referenced by manifest "dict_dirname") is never rmtree'd out from
    # under a reader; stale generations are reclaimed by vacuum_index
    dict_dir = os.path.join(index_dir, dict_dirname(build_fp))
    import shutil

    tmp_dict = f"{dict_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp_dict, ignore_errors=True)
    dictionary.write_parquet(tmp_dict)
    if not os.path.isdir(tmp_dict):
        # write_parquet of an EMPTY dataset (corpus tokenizes to nothing)
        # creates no directory at all — materialize an empty-but-valid
        # dictionary so readers see a schema'd zero-row table
        os.makedirs(tmp_dict, exist_ok=True)
        pq.write_table(
            pa.table({"term": pa.array([], type=pa.string()),
                      "df": pa.array([], type=pa.int64()),
                      "cf": pa.array([], type=pa.int64())}),
            os.path.join(tmp_dict, "part-empty.parquet"))
    shutil.rmtree(dict_dir, ignore_errors=True)
    os.replace(tmp_dict, dict_dir)

    # fold per-segment manifests (small; S files) → corpus stats.  The glob
    # sees EVERY generation's dirs — only those matching this generation's
    # expected fingerprints join the manifest (dedupe by seg_id).
    seg_manifests = []
    seen_ids: set[int] = set()
    for sd in sorted(glob.glob(os.path.join(index_dir, "seg=*"))):
        m = read_json(os.path.join(sd, SEG_MANIFEST))
        if not m or m.get("seg_id") in seen_ids:
            continue
        want = expected_fps.get(m.get("seg_id"), None) if expected_fps is not None else build_fp
        if want is not None and m.get("fingerprint") == want:
            m.setdefault("dir", os.path.basename(sd))
            seg_manifests.append(m)
            seen_ids.add(m["seg_id"])
    n_docs = sum(m["n_docs"] for m in seg_manifests)
    total_tokens = sum(m["sum_dl"] for m in seg_manifests)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    field_totals: dict[str, int] = {}
    for m in seg_manifests:
        for f, v in (m.get("sum_dl_fields") or {}).items():
            field_totals[f] = field_totals.get(f, 0) + int(v)
    avgdl_fields = {f: ((v / n_docs) or 1.0) if n_docs else 1.0
                    for f, v in field_totals.items()}

    atomic_write_json(
        os.path.join(index_dir, INDEX_MANIFEST),
        {
            "format_version": FORMAT_VERSION,
            "fingerprint": build_fp,
            "input_fingerprint": input_fp,
            "analyzer": {"stopwords": analyzer.stopwords, "stem": analyzer.stem, "tag": analyzer.version_tag},
            "corpus": {"id_cols": list(spec.id_cols), "text_col": spec.text_col,
                       "meta_cols": list(spec.meta_cols), "name": spec.name,
                       "field_cols": list(spec.field_cols)},
            "input_paths": input_paths,  # None for volatile Dataset inputs
            # the RAW source argument (dir / glob / file list): refresh
            # re-resolves it so files appended to a source directory are
            # picked up; input_paths stays the expanded snapshot for readers
            # (doc-store verify reads need concrete files)
            "input_sources": input_sources,
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "avgdl_fields": avgdl_fields,
            # ACTUAL segment count: hash assignment can leave planned Dataset
            # segments empty, so the planned number may exceed reality
            "n_segments": len(seg_manifests),
            "store_positions": store_positions,
            "target_rows": target_rows,
            "dict_dirname": os.path.basename(dict_dir),
            "segments": [
                {
                    "seg_id": m["seg_id"], "n_docs": m["n_docs"], "sum_dl": m["sum_dl"],
                    "n_terms": m["n_terms"], "n_posting_entries": m.get("n_posting_entries", 0),
                    "build_ms": m.get("build_ms", 0), "dir": m["dir"],
                    "id0_min": m.get("id0_min"), "id0_max": m.get("id0_max"),
                }
                for m in sorted(seg_manifests, key=lambda m: m["seg_id"])
            ],
            "metrics": {
                "sum_build_ms": sum(m.get("build_ms", 0) for m in seg_manifests),
                "max_segment_build_ms": max((m.get("build_ms", 0) for m in seg_manifests), default=0),
                "total_posting_entries": sum(m.get("n_posting_entries", 0) for m in seg_manifests),
            },
        },
    )
    return IndexInfo(index_dir, n_docs, avgdl, len(seg_manifests), build_fp)


def compact_index(
    index_dir: str,
    out_dir: str,
    *,
    target_docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    cpus_per_merge_task: int = 4,
) -> IndexInfo:
    """Merge many small segments into fewer large ones (Lucene-style
    compaction) WITHOUT re-tokenizing: member postings are decoded, ordinals
    remapped through the merged identity sort, and re-encoded through the
    same block writer.  Writes a NEW immutable generation at ``out_dir``;
    the source index is untouched.  One Ray task per merge group.

    ``cpus_per_merge_task`` declares each task's TRUE resource footprint:
    the merge inner loops are memory-bandwidth-bound (numpy gathers over
    the whole entry space), so running one per core thrashes the memory
    controllers — measured on a 32-core node: 26 concurrent tasks = 45 s,
    8 concurrent (num_cpus=4) = 9 s for the same 960k-doc compaction.
    Ray schedules against this declaration per node, so the cap holds on a
    multi-node cluster too."""
    from ..stages.segment_merge import merge_segment_group
    from ..state.manifest import load_index_manifest, resolve_dirs

    m = load_index_manifest(index_dir)
    # pin the SOURCE generation now and ship the resolved dirs into every
    # merge task: a refresh committing mid-compaction must not retarget
    # running tasks at a generation the plan below never saw
    src_dirs, _ = resolve_dirs(index_dir, m)
    c = m["corpus"]
    spec = CorpusSpec(tuple(c["id_cols"]), c["text_col"], tuple(c["meta_cols"]), c["name"],
                      tuple(c.get("field_cols") or ()))
    analyzer = Analyzer(stopwords=m["analyzer"]["stopwords"], stem=m["analyzer"]["stem"])
    store_positions = bool(m.get("store_positions", True))

    groups: list[list[int]] = []
    acc: list[int] = []
    acc_docs = 0
    for s in m["segments"]:
        acc.append(s["seg_id"])
        acc_docs += s["n_docs"]
        if acc_docs >= target_docs_per_segment:
            groups.append(acc)
            acc, acc_docs = [], 0
    if acc:
        groups.append(acc)

    build_fp = fingerprint("compact", m["fingerprint"], f"tgt={target_docs_per_segment}")
    os.makedirs(out_dir, exist_ok=True)

    def merge_task(batch: pa.Table) -> pa.Table:
        from ..stages.segment_build import limit_worker_arrow_threads

        limit_worker_arrow_threads()
        outs = []
        for row in batch.to_pylist():
            outs.append(
                merge_segment_group(
                    {s: src_dirs[s] for s in row["members"]}, out_dir,
                    row["members"], row["new_seg_id"], spec,
                    build_fp, store_positions=store_positions,
                )
            )
        return pa.concat_tables(outs)

    specs_ds = rd.from_items(
        [{"new_seg_id": i, "members": g} for i, g in enumerate(groups)]
    )
    term_partials = specs_ds.map_batches(
        merge_task, batch_size=1, batch_format="pyarrow",
        num_cpus=max(1, cpus_per_merge_task),
    )
    return _finalize_generation(
        out_dir, term_partials, build_fp, analyzer, spec,
        input_fp=m["input_fingerprint"], input_paths=m.get("input_paths"),
        n_segments=len(groups), store_positions=store_positions,
        input_sources=m.get("input_sources"), target_rows=m.get("target_rows"),
    )


def refresh_index(index_dir: str, **overrides) -> IndexInfo:
    """S4 analog of the reference's ``refresh_mv_books_dc()`` cron entry
    (/root/reference/tables/mv_books_dc.sql:502-514): re-run the build over
    the inputs recorded in the committed manifest.  Unchanged inputs fast-path
    on the fingerprint; changed inputs produce a new generation whose
    manifest.json swap is the atomic "CONCURRENTLY" — readers opening the
    index mid-refresh still see the previous committed generation."""
    from ..corpus import CorpusSpec

    m = read_json(os.path.join(index_dir, INDEX_MANIFEST))
    if not m:
        raise FileNotFoundError(f"no committed manifest in {index_dir}")
    if not m.get("input_paths"):
        raise ValueError("index was built from a volatile Dataset; rebuild explicitly")
    c = m["corpus"]
    spec = CorpusSpec(tuple(c["id_cols"]), c["text_col"], tuple(c["meta_cols"]), c["name"],
                      tuple(c.get("field_cols") or ()))
    analyzer = Analyzer(stopwords=m["analyzer"]["stopwords"], stem=m["analyzer"]["stem"])
    # refresh inherits the committed generation's build config unless the
    # caller overrides it: store_positions so the fingerprint fast-path can
    # match (and the on-disk format doesn't silently flip), target_rows so
    # appending input files doesn't shift the row-group packing — and with
    # it every unchanged segment's content fingerprint
    overrides.setdefault("store_positions", bool(m.get("store_positions", True)))
    if m.get("target_rows"):
        overrides.setdefault("target_rows", int(m["target_rows"]))
    # prefer the RAW recorded source (dir/glob): refresh then re-resolves it,
    # so files appended to a source directory join the new generation; fall
    # back to the expanded file snapshot for pre-input_sources manifests
    source = m.get("input_sources") or list(m["input_paths"])
    return build_index(source, spec, index_dir, analyzer=analyzer, **overrides)
