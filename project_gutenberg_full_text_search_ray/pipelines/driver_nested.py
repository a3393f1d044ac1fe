"""Driver queries: nested containment, jsonb-path analog, EXISTS semi-join,
parser battery, and the tsvector-style custom aggregate.

These close the SURVEY §2 rows that round 1 marked "partial":
  * F10–F15 — jsonb/struct-list containment + bridge-table EXISTS semi-joins
    (/root/reference/search/full_text_search.py:215-253): here a true
    ``list<struct>`` column filtered by the vectorized ``struct_any`` kernel
    (stages/segment_search.py::apply_filters) and a broadcast-small-side
    semi-join over two parquet tables.
  * N3–N8 — the normalizer battery (split_part / struct parse / regexp split
    / concat_ws / html escape, /root/reference/tables/mv_books_dc.sql:59-374)
    via functions/parsers.py kernels.
  * A4 — the reference's custom ``tsvector_agg`` aggregate
    (/root/reference/tables/mv_books_dc.sql:14-31): a distributed term-count
    merge (per-batch partial maps → one vocabulary-sized shuffle → per-group
    vectorized top-k), NOT a corpus-bytes shuffle.

Every query here has a DuckDB oracle (ORACLE_SQL_NESTED) with identical
column names, orderings, and NULL semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import parsers as P
from ..functions.analyzer import DEFAULT_ANALYZER, TOKEN_SPLIT_PATTERN
from ..stages.segment_search import FilterSpec, apply_filters


# ---------------------------------------------------------------- F10–F12/F15
def q_nested_containment(sf_dir: str) -> pa.Table:
    """Struct-list containment (the reference's ``dc->'creators' @>
    '[{"role": ...}]'`` jsonb filter, full_text_search.py:215-218): derive a
    ``creators list<struct<cid,role>>`` column per batch, keep docs where ANY
    element matches {cid: 3, role: 'editor'} via the generic ``struct_any``
    filter kernel."""
    import ray.data as rd

    spec = FilterSpec("creators", "struct_any", {"cid": 3, "role": "editor"})

    def derive_and_filter(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(did)
        cid = np.empty(2 * n, dtype=np.int64)
        cid[0::2] = did % 7
        cid[1::2] = did % 11
        roles = np.empty(2 * n, dtype=object)
        roles[0::2] = "author"
        roles[1::2] = "editor"
        structs = pa.StructArray.from_arrays(
            [pa.array(cid), pa.array(roles, type=pa.string())], names=["cid", "role"])
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(0, 2 * n + 2, 2, dtype=np.int32)[: n + 1]), structs)
        t = b.append_column("creators", lists)
        mask = apply_filters(t, [spec])
        return b.filter(pa.array(mask))

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    df = ds.map_batches(derive_and_filter, batch_format="pyarrow") \
           .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(df["doc_id"], type=pa.int64()),
        "n_chars": pa.array(df["n_chars"], type=pa.int64()),
    })


# ---------------------------------------------------------------- jsonb path
def q_props_json_range(sf_dir: str) -> pa.Table:
    """jsonb path extraction + range filter + count (the `dc` jsonb analog):
    vectorized RE2 extraction of ``$.k`` from the JSON ``props`` column, no
    per-row json.loads."""
    import ray.data as rd
    from ray.data.aggregate import Count

    def keep_hot(b: pa.Table) -> pa.Table:
        k = P.json_extract_int(b["props"], "k")
        return b.filter(pc.fill_null(pc.greater_equal(k, pa.scalar(50, type=pa.int64())), False))

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])
    agg = ds.map_batches(keep_hot, batch_format="pyarrow") \
            .groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    agg = agg.sort_values("event_type").reset_index(drop=True)
    return pa.table({"event_type": pa.array(agg["event_type"]),
                     "n": pa.array(agg["n"], type=pa.int64())})


# ---------------------------------------------------------------- F13/F14
def q_semi_join_urgent(sf_dir: str) -> pa.Table:
    """EXISTS bridge-table semi-join (subject_id/bookshelf_id F13/F14,
    full_text_search.py:234-244): distinct keys of the filtered small side are
    broadcast once via ``ray.put`` and probed per batch — no all-to-all join
    shuffle."""
    import ray
    import ray.data as rd

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderpriority"])

    def urgent_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], pa.scalar("1-URGENT"))
        keys = pc.unique(b.filter(m)["o_custkey"])
        return pa.table({"o_custkey": keys})

    # per-batch distinct (combiner) -> driver-side union of a key-cardinality-
    # sized set -> broadcast.  At 100 TB the key set is bounded by distinct
    # customers, not order rows.
    parts = orders.map_batches(urgent_keys, batch_format="pyarrow").take_all()
    keyset = np.unique(np.array([r["o_custkey"] for r in parts], dtype=np.int64))
    ref = ray.put(keyset)

    def probe(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        m = pc.is_in(b["c_custkey"], value_set=pa.array(ks, type=b["c_custkey"].type))
        return b.filter(m)

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_name"])
    df = cust.map_batches(probe, batch_format="pyarrow") \
             .to_pandas().sort_values("c_custkey").reset_index(drop=True)
    return pa.table({"c_custkey": pa.array(df["c_custkey"], type=pa.int64()),
                     "c_name": pa.array(df["c_name"])})


# ---------------------------------------------------------------- N3–N6
def q_parse_fields(sf_dir: str) -> pa.Table:
    """Normalizer battery over text fields: MARC ``$b`` subtitle split_part
    (N4), publisher $a/$b/$c struct parse (N5), credits regexp-split head
    (N6) — all Arrow kernels inside one map_batches."""
    import ray.data as rd

    def parse(b: pa.Table) -> pa.Table:
        text = b["text"]
        st = P.parse_struct_fields(text)
        return pa.table({
            "doc_id": b["doc_id"],
            "sub2": P.split_part(text, " ", 2),
            "pub_a": pc.struct_field(st, "a"),
            "pub_b": pc.struct_field(st, "b"),
            "pub_c": pc.struct_field(st, "c"),
            # utf8_trim(characters=" ") == DuckDB trim() (space only);
            # utf8_trim_whitespace would also strip tabs/newlines and
            # silently diverge from the oracle on such corpora
            "head": pc.utf8_trim(
                P.regexp_split_first(text, r"\bwindow\b"), characters=" "),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], pa.scalar(200, type=pa.int64()))),
        batch_format="pyarrow").map_batches(parse, batch_format="pyarrow")
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(df["doc_id"], type=pa.int64()),
        "sub2": pa.array(df["sub2"]), "pub_a": pa.array(df["pub_a"]),
        "pub_b": pa.array(df["pub_b"]), "pub_c": pa.array(df["pub_c"]),
        "head": pa.array(df["head"]),
    })


# ---------------------------------------------------------------- N7/N8
def q_concat_assembly(sf_dir: str) -> pa.Table:
    """CONCAT_WS doc-text assembly (N7, mv_books_dc.sql:59-73) and
    html-escape of a derived description (N8, crosswalks.py:107-112)."""
    import ray.data as rd

    def assemble(b: pa.Table) -> pa.Table:
        name, seg = b["c_name"], b["c_mktsegment"]
        raw = pc.binary_join_element_wise(
            pa.scalar("<"), name, pa.scalar(" & "), seg, pa.scalar(">"), pa.scalar(""))
        return pa.table({
            "c_custkey": b["c_custkey"],
            "line": P.concat_ws(" | ", name, seg),
            "esc": P.html_escape(raw),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_mktsegment"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b["c_custkey"], pa.scalar(100, type=pa.int64()))),
        batch_format="pyarrow").map_batches(assemble, batch_format="pyarrow")
    df = ds.to_pandas().sort_values("c_custkey").reset_index(drop=True)
    return pa.table({
        "c_custkey": pa.array(df["c_custkey"], type=pa.int64()),
        "line": pa.array(df["line"]), "esc": pa.array(df["esc"]),
    })


# ---------------------------------------------------------------- A4
def q_tsvector_agg(sf_dir: str) -> pa.Table:
    """Custom tsvector-style aggregate (A4, mv_books_dc.sql:14-31): merge
    per-doc term frequencies into one per-source term-count vector, emit the
    top-5 terms ('term:count', count desc then term) per source.

    Shape: per-batch vectorized partial counts (tokenize_column_arrow + one
    pandas groupby over this batch's terms) → shuffle only (source, term,
    cnt) partials — vocabulary-sized, never corpus-sized → per-source
    vectorized merge."""
    import pandas as pd
    import ray.data as rd

    def partial_counts(b: pa.Table) -> pa.Table:
        terms, doc_idx, _pos = DEFAULT_ANALYZER.tokenize_column_arrow(b["text"])
        src = b["source"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": src[doc_idx],
            "term": terms.to_numpy(zero_copy_only=False),
        })
        # dropna=False: NULL sources must keep their group (DuckDB GROUP BY
        # keeps a NULL group); explicit string types so an all-empty batch
        # emits string columns, not null-typed ones that break unification
        g = df.groupby(["source", "term"], sort=False, dropna=False) \
              .size().reset_index(name="cnt")
        return pa.table({
            "source": pa.array(g["source"], type=pa.string()),
            "term": pa.array(g["term"], type=pa.string()),
            "cnt": pa.array(g["cnt"], type=pa.int64()),
        })

    def top5(g: pd.DataFrame) -> pd.DataFrame:
        merged = g.groupby("term", sort=False)["cnt"].sum().reset_index()
        merged = merged.sort_values(["cnt", "term"], ascending=[False, True]).head(5)
        vec = " ".join(f"{t}:{c}" for t, c in zip(merged["term"], merged["cnt"]))
        return pd.DataFrame({"source": [g["source"].iloc[0]], "tsvec": [vec]})

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["source", "text"])
    out = ds.map_batches(partial_counts, batch_format="pyarrow") \
            .groupby("source").map_groups(top5, batch_format="pandas")
    df = out.to_pandas().sort_values("source").reset_index(drop=True)
    return pa.table({"source": pa.array(df["source"]), "tsvec": pa.array(df["tsvec"])})


# ---------------------------------------------------------------- range join
def q_range_join_windows(sf_dir: str) -> pa.Table:
    """Broadcast interval join (stages/ranges.py): per event, how many
    same-user purchase windows ``[purchase_ts, purchase_ts + 2h]`` contain
    it.  The big side streams; the window side is broadcast once."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.ranges import broadcast_interval_join

    path = os.path.join(sf_dir, "events.parquet")
    # predicate pushdown: only purchase row groups are read and only the
    # purchase subset is held on the driver (the broadcast design assumes
    # the right side is small — don't materialize the whole events table)
    right = pq.read_table(path, columns=["user_id", "ts"],
                          filters=[("event_type", "==", "purchase")])
    ev = rd.read_parquet(path, columns=["event_id", "ts", "user_id"])
    out = broadcast_interval_join(
        ev, right, by="user_id", on="ts", window=2 * 3600 * 1_000_000,
        left_cols=["event_id"], out_col="n_windows",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    return pa.table({
        "event_id": pa.array(out["event_id"], type=pa.int64()),
        "n_windows": pa.array(out["n_windows"], type=pa.int64()),
    })


# ---------------------------------------------------------------- quantiles
_QUANTILES = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)]


def q_quantiles(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles (percentile_disc semantics: smallest value
    whose cumulative count ≥ ceil(q·N)) over a bounded-cardinality column —
    per-batch value counts (combiner) → one distinct-value-sized groupby →
    driver-side cumsum over the tiny (value, count) table.  The shuffle is
    O(distinct values), never O(rows)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        # drop NULLs like quantile_disc (a null int64 surfaces as NaN from
        # to_numpy and would poison the int64 cast)
        col = pc.drop_null(b["n_chars"])
        vals, cnts = np.unique(
            col.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(vals.astype(np.int64), type=pa.int64()),
                         "c": pa.array(cnts, type=pa.int64())})

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["n_chars"])
    agg = ds.map_batches(counts, batch_format="pyarrow") \
            .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas()
    agg = agg.sort_values("v").reset_index(drop=True)
    cum = agg["c"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out_pct, out_val = [], []
    for name, q in _QUANTILES:
        out_pct.append(name)
        if n == 0:  # empty input: NULL quantiles, like quantile_disc
            out_val.append(None)
            continue
        rank = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(cum, rank, side="left"))
        out_val.append(int(agg["v"].iloc[i]))
    return pa.table({"pct": pa.array(out_pct), "val": pa.array(out_val, type=pa.int64())})


def q_quantiles_streaming(sf_dir: str) -> pa.Table:
    """EXACT quantiles over an UNBOUNDED-cardinality column
    (``stages/topk.quantiles_unbounded``): iterative histogram refinement —
    O(log range) column-pruned streaming passes, O(n_buckets) exchange each
    — where the value-count combiner behind ``quantiles`` would shuffle
    O(distinct).  Runs on ``lineitem.l_extendedprice`` projected to integer
    cents (floor(x*100 + 0.5), IEEE-identical in DuckDB, so the oracle is
    bit-exact)."""
    import ray.data as rd

    from ..stages.topk import quantiles_unbounded

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(b["l_extendedprice"], 100.0), 0.5))
        return pa.table({"cents": cents.cast(pa.int64())})

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_extendedprice"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    return quantiles_unbounded(ds, "cents", _QUANTILES)


def q_grouped_quantiles_streaming(sf_dir: str) -> pa.Table:
    """PER-GROUP exact quantiles over an UNBOUNDED-cardinality value column
    (``stages/topk.grouped_quantiles_unbounded``): per-returnflag price
    percentiles — the same iterative histogram refinement as
    ``quantiles_streaming``, all groups' live intervals packed into one
    shared bucket space per streaming pass."""
    import ray.data as rd

    from ..stages.topk import grouped_quantiles_unbounded

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(b["l_extendedprice"], 100.0), 0.5))
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "cents": cents.cast(pa.int64())})

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice"]) \
        .map_batches(to_cents, batch_format="pyarrow")
    return grouped_quantiles_unbounded(ds, "l_returnflag", "cents",
                                       _QUANTILES)


def q_grouped_quantiles(sf_dir: str) -> pa.Table:
    """Per-group EXACT quantiles (stages/topk.grouped_quantiles): the
    per-language length-distribution report — generalizes the global
    ``quantiles`` kernel (same combiner + driver-cumsum shape, one
    (group, value)-sized exchange)."""
    import ray.data as rd

    from ..stages.topk import grouped_quantiles

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["lang", "n_chars"])
    t = grouped_quantiles(ds, "lang", "n_chars", _QUANTILES)
    return pa.table({"lang": t["lang"].cast(pa.string()),
                     "pct": t["pct"],
                     "val": t["val"].cast(pa.int64())})


# ---------------------------------------------------------------- histogram
def q_value_histogram(sf_dir: str) -> pa.Table:
    """Fixed-width histogram over a double column: vectorized bin key + one
    bin-cardinality groupby (combiner pattern — same shape as A8)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    def binned(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        # NULL/NaN values are excluded: floor(NaN).astype(int64) would alias
        # INT64_MIN and count as a real bin (the SQL oracle's NULL bin rows
        # are likewise dropped from the compared result)
        v = v[~np.isnan(v)]
        return pa.table({"bin": pa.array(np.floor(v / 25.0).astype(np.int64))})

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["value"])
    agg = ds.map_batches(binned, batch_format="pyarrow") \
            .groupby("bin").aggregate(Count(alias_name="n")).to_pandas()
    agg = agg.sort_values("bin").reset_index(drop=True)
    return pa.table({"bin": pa.array(agg["bin"], type=pa.int64()),
                     "n": pa.array(agg["n"], type=pa.int64())})


ORACLE_SQL_NESTED: dict[str, str] = {
    "nested_containment": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars "
        "FROM documents WHERE EXISTS (SELECT 1 FROM UNNEST("
        "[struct_pack(cid := doc_id % 7, role := 'author'), "
        "struct_pack(cid := doc_id % 11, role := 'editor')]) AS t(c) "
        "WHERE c.cid = 3 AND c.role = 'editor') ORDER BY doc_id"
    ),
    "props_json_range": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events "
        "WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50 "
        "GROUP BY event_type ORDER BY event_type"
    ),
    "semi_join_urgent": (
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey"
    ),
    "parse_fields": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "split_part(text, ' ', 2) AS sub2, "
        "split_part(text, ' ', 1) AS pub_a, "
        "split_part(text, ' ', 2) AS pub_b, "
        "split_part(text, ' ', 3) AS pub_c, "
        "trim(regexp_split_to_array(text, '\\bwindow\\b')[1]) AS head "
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"
    ),
    "concat_assembly": (
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, "
        "concat_ws(' | ', c_name, c_mktsegment) AS line, "
        + P.html_escape_sql("('<' || c_name || ' & ' || c_mktsegment || '>')")
        + " AS esc FROM customer WHERE c_custkey < 100 ORDER BY c_custkey"
    ),
    "quantiles": (
        "SELECT pct, CAST(val AS BIGINT) AS val FROM ("
        + " UNION ALL ".join(
            f"SELECT '{name}' AS pct, quantile_disc(n_chars, {q}) AS val FROM documents"
            for name, q in _QUANTILES)
        + ") ORDER BY pct"
    ),
    "quantiles_streaming": (
        "SELECT pct, CAST(val AS BIGINT) AS val FROM ("
        + " UNION ALL ".join(
            f"SELECT '{name}' AS pct, quantile_disc("
            f"CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT), {q}) AS val "
            f"FROM lineitem"
            for name, q in _QUANTILES)
        + ") ORDER BY pct"
    ),
    "grouped_quantiles_streaming": (
        "SELECT l_returnflag, pct, CAST(val AS BIGINT) AS val FROM ("
        + " UNION ALL ".join(
            f"SELECT l_returnflag, '{name}' AS pct, quantile_disc("
            f"CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT), {q}) AS val "
            f"FROM lineitem GROUP BY l_returnflag"
            for name, q in _QUANTILES)
        + ") ORDER BY l_returnflag, pct"
    ),
    "grouped_quantiles": (
        "SELECT lang, pct, CAST(val AS BIGINT) AS val FROM ("
        + " UNION ALL ".join(
            f"SELECT lang, '{name}' AS pct, quantile_disc(n_chars, {q}) AS val "
            "FROM documents GROUP BY lang"
            for name, q in _QUANTILES)
        + ") ORDER BY lang, pct"
    ),
    "distinct_users_kmv": (
        "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events"
    ),
    "heavy_hitters_users": (
        "SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10"
    ),
    "value_histogram": (
        # value IS NOT NULL: the engine excludes NULL/NaN from binning
        "SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n FROM events WHERE value IS NOT NULL "
        "GROUP BY bin ORDER BY bin"
    ),
    "range_join_windows": (
        "SELECT CAST(e.event_id AS BIGINT) AS event_id, "
        "CAST((SELECT count(*) FROM events p WHERE p.user_id = e.user_id "
        "AND p.event_type = 'purchase' AND p.ts <= e.ts "
        "AND e.ts <= p.ts + INTERVAL 2 HOUR) AS BIGINT) AS n_windows "
        "FROM events e ORDER BY event_id"
    ),
    "tsvector_agg": (
        f"WITH tok AS (SELECT source, t.term AS term FROM documents, "
        f"UNNEST(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_PATTERN}')) AS t(term) "
        "WHERE t.term <> ''), "
        "cnts AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY source, term), "
        "ranked AS (SELECT source, term, cnt, row_number() OVER "
        "(PARTITION BY source ORDER BY cnt DESC, term) AS rn FROM cnts) "
        "SELECT source, string_agg(term || ':' || CAST(cnt AS VARCHAR), ' ' "
        "ORDER BY cnt DESC, term) AS tsvec "
        "FROM ranked WHERE rn <= 5 GROUP BY source ORDER BY source"
    ),
}


# ---------------------------------------------------------------- sketches
def q_heavy_hitters_users(sf_dir: str) -> pa.Table:
    """Distributed Misra–Gries heavy hitters over ``events.user_id`` —
    capacity is sized ABOVE the column's distinct count, so the sketch
    truncates nothing, err == 0, and the result is exact (the SQL-checkable
    configuration; the approximate regime's guarantees are pytest-asserted
    in tests/test_extras.py)."""
    import ray.data as rd

    from ..stages.sketches import heavy_hitters

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    top, err = heavy_hitters(ds, "user_id", k=10, capacity=1 << 15)
    assert err == 0  # exact regime by construction
    return pa.table({"user_id": top["user_id"].cast(pa.int64()),
                     "n": top["count_lower"]})


def q_distinct_users_kmv(sf_dir: str) -> pa.Table:
    """K-Minimum-Values distinct-count sketch over ``events.user_id`` in its
    EXACT regime (k far above the column's cardinality → the sketch has seen
    every distinct hash and the count is exact, matching count(DISTINCT)).
    NULLs are filtered first for SQL count(DISTINCT) parity; the approximate
    regime's relative-error behavior is pytest-asserted."""
    import ray.data as rd

    from ..stages.sketches import distinct_count

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    ds = ds.map_batches(lambda b: b.filter(pc.is_valid(b["user_id"])),
                        batch_format="pyarrow")
    est, exact = distinct_count(ds, "user_id", k=1 << 16)
    assert exact
    return pa.table({"n": pa.array([est], type=pa.int64())})

QUERIES_NESTED = {
    "nested_containment": q_nested_containment,
    "props_json_range": q_props_json_range,
    "semi_join_urgent": q_semi_join_urgent,
    "parse_fields": q_parse_fields,
    "concat_assembly": q_concat_assembly,
    "tsvector_agg": q_tsvector_agg,
    "range_join_windows": q_range_join_windows,
    "quantiles": q_quantiles,
    "quantiles_streaming": q_quantiles_streaming,
    "grouped_quantiles_streaming": q_grouped_quantiles_streaming,
    "grouped_quantiles": q_grouped_quantiles,
    "value_histogram": q_value_histogram,
    "heavy_hitters_users": q_heavy_hitters_users,
    "distinct_users_kmv": q_distinct_users_kmv,
}
