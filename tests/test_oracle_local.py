"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf0.001 parquet, then
compare column names, row counts, and order-insensitive values exactly."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        p = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


def all_query_names():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, ddb, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = ddb.execute(e.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    s_ms, s_cols = _rows_to_multiset(scols, srows)
    d_ms, d_cols = _rows_to_multiset(dcols, drows)
    assert s_cols == d_cols, f"{name}: column names differ: {scols} vs {dcols}"
    assert len(s_ms) == len(d_ms), f"{name}: row counts differ: {len(s_ms)} vs {len(d_ms)}"
    mismatches = [(a, b) for a, b in zip(s_ms, d_ms) if a != b]
    assert not mismatches, f"{name}: first value mismatch: {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
