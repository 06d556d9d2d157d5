#!/usr/bin/env python
"""Spot-check named queries against the DuckDB oracle (same comparison as
tests/test_oracle_local.py) without running the whole harness.

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.01] q31 q67 ...
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows), [cols[i] for i in idx]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from warc_bench_spark.session import get_spark

    names = [n for n in e.oracle_sql() if n.split("_", 1)[0] in set(args.queries)]
    missing = set(args.queries) - {n.split("_", 1)[0] for n in names}
    if missing:
        ap.error(f"no oracle for: {sorted(missing)}")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("oracle-check", cores=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        sdf = e.queries()[name](spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(e.oracle_sql()[name])
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
        s_ms, s_cols = _rows_to_multiset(sdf.columns, srows)
        d_ms, d_cols = _rows_to_multiset(dcols, drows)
        ok = s_cols == d_cols and len(s_ms) == len(d_ms) and s_ms == d_ms
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(s_ms)} rows)")
        if not ok:
            rc = 1
            if s_cols != d_cols:
                print(f"  cols: {s_cols} vs {d_cols}")
            if len(s_ms) != len(d_ms):
                print(f"  rows: {len(s_ms)} vs {len(d_ms)}")
            bad = [(a, b) for a, b in zip(s_ms, d_ms) if a != b]
            if bad:
                print(f"  first mismatches: {bad[:3]}")
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
