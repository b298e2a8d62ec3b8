#!/usr/bin/env python
"""Self-check harness mimicking the driver's correctness gate.

Runs every `queries()` entry on a local SparkSession AND the matching
`oracle_sql()` in DuckDB against the same parquet tables, then compares:
row count, sorted column names, and order-insensitive values (rows sorted by
their string form, floats rendered at 10 significant digits).

Usage:
    python tools/selfcheck.py               # all queries at sf0.01
    python tools/selfcheck.py q_fetch_grid  # subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/selfcheck.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from datayours_spark.io import TABLES
from datayours_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    try:  # decimals → float rendering
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    return str(v)


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("selfcheck", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(srows)} oracle={len(orows)}")
            continue
        ns, no = normalize(srows, scols), normalize(orows, ocols)
        if ns != no:
            failures.append(name)
            diff = [i for i, (a, b) in enumerate(zip(ns, no)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"      spark : {ns[i]}")
                print(f"      oracle: {no[i]}")
            continue
        print(f"PASS  {name}: {len(srows)} rows, {dt:.1f}s")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
