"""Local replica of the driver's correctness gate: run every ``queries()``
entry and its ``oracle_sql()`` twin side-by-side with DuckDB on the same
parquet, compare row count + schema + order-insensitive values."""

import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("PGFTS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def contract(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    return mod


@pytest.fixture(scope="module")
def con():
    return _duck(SF_DIR)


def _to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_queries_and_oracles_cover_each_other(contract):
    q = contract.queries()
    o = contract.oracle_sql()
    assert set(o) <= set(q), "oracle without query"
    assert len(q) >= 15


def test_entry_smoke(contract):
    res = contract.entry()
    df = _to_pandas(res)
    assert len(df) >= 0 and len(df.columns) > 0


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        import importlib
        import sys

        sys.path.insert(0, "/root/repo")
        mod = importlib.import_module("__ray_entry__")
        metafunc.parametrize("qname", sorted(mod.oracle_sql().keys()))


def test_query_matches_oracle(contract, con, qname):
    fn = contract.queries()[qname]
    sql = contract.oracle_sql()[qname]
    got = _normalize(_to_pandas(fn(SF_DIR)))
    exp = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(exp.columns), f"{qname}: schema mismatch"
    assert len(got) == len(exp), f"{qname}: row count {len(got)} != {len(exp)}"
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        assert gv == ev, f"{qname}: column {c} differs\n got={gv[:10]}\n exp={ev[:10]}"
