"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry in Spark and its oracle_sql() twin in
DuckDB over the same parquet, compare row count + column names + sorted
values exactly (floats must match bit-for-bit — the entry file is designed
so float outputs are single IEEE divisions or explicitly rounded)."""

import importlib.util
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(__file__), "..",
                                "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    from decimal import Decimal
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, Decimal):
        return float(v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_vs_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        # rows-only check (driver's weaker path)
        assert len(s_rows) >= 0
        return
    # rebuild AFTER the Spark query ran: file-backed oracles (cc_extract)
    # embed the per-(uid, sf) working dir the query just wrote
    res = ddb.execute(entry_mod.oracle_sql()[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), \
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    cs, cd = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
    assert not mismatches, f"{name}: value mismatches {mismatches}"
