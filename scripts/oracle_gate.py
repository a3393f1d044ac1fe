"""Local replica of the driver's correctness gate AT THE DRIVER'S EXACT
CONFIGURATION: ``ray.init(address="local", num_cpus=32)`` over sf0.01.

Round-4 lesson: ``grouped_quantiles`` passed every 8-CPU local sweep and
crashed in the 32-CPU driver run (more CPUs → more/narrower sort-aggregate
partitions → a partition holding only all-NULL marker rows).  Parallelism
is part of the configuration under test — this gate pins it.

Runs EVERY registered query (not just the driver's top-50 window) against
its DuckDB oracle with the driver's compare semantics: columns sorted by
name, rows sorted by every column, exact value comparison.  Queries with
no SQL oracle get a rows>=0 smoke run.

Usage:
    python scripts/oracle_gate.py [--sf /root/testdata/sf0.01] [--cpus 32]
                                  [--only name1,name2]
Exit code 0 = all green.
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _normalize(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns),
                            kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "PGFTS_GATE_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "PGFTS_GATE_CPUS", "32")))
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd
    import pyarrow as pa

    import __ray_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in queries
             if not args.only or n in args.only.split(",")]
    if args.only:
        unknown = sorted(set(args.only.split(",")) - set(queries))
        if unknown or not names:
            print(f"--only selected no known queries (unknown: {unknown})",
                  file=sys.stderr)
            return 2

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    failures = {}
    t_start = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            res = queries[name](args.sf)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            elif isinstance(res, pa.Table):
                got = res.to_pandas()
            else:
                got = res
            if name not in oracles:
                assert got is not None and len(got) >= 0
                status = f"rows-only ({len(got)} rows)"
            else:
                exp = con.execute(oracles[name]).df()
                g, e = _normalize(got), _normalize(exp)
                assert list(g.columns) == list(e.columns), (
                    f"schema {list(g.columns)} != {list(e.columns)}")
                assert len(g) == len(e), f"rows {len(g)} != {len(e)}"
                pd.testing.assert_frame_equal(g, e, check_dtype=False)
                status = f"match ({len(g)} rows)"
            n_pass += 1
            print(f"[{i + 1}/{len(names)}] {name}: PASS {status} "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception:
            n_fail += 1
            failures[name] = traceback.format_exc(limit=4)
            print(f"[{i + 1}/{len(names)}] {name}: FAIL "
                  f"{time.time() - t0:.1f}s", flush=True)
    ray.shutdown()

    print(json.dumps({
        "gate": "oracle", "sf_dir": args.sf, "num_cpus": args.cpus,
        "pass": n_pass, "fail": n_fail, "total": len(names),
        "elapsed_sec": round(time.time() - t_start, 1),
    }))
    for name, tb in failures.items():
        print(f"\n===== {name} =====\n{tb}", file=sys.stderr)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
