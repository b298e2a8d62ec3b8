#!/usr/bin/env python
"""Dtype parity check between `queries()` and `oracle_sql()`.

The driver's correctness hash may be dtype-tagged after pandas conversion
(an int32 Spark column vs a BIGINT DuckDB column would then hash-mismatch
even with identical values — the suspected cause of the r4 `q_span_mask`
red row).  `tools/selfcheck.py` compares values as strings and cannot see
this, so this tool compares the *pandas dtype kind + width* per column:

    python tools/dtypecheck.py                # all oracle queries at sf0.01
    python tools/dtypecheck.py q_span_mask    # subset

A column passes when both sides agree on (kind, itemsize) — e.g. int64 ==
int64 — or when both are floats of the same width.  Nullable ints that
pandas widens to float64/objects are normalized: a float column whose
values are all integral on one side is compared by value-kind instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

import __spark_entry__ as entrymod
from datayours_spark.io import TABLES
from datayours_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def dtype_tag(series) -> str:
    k = series.dtype.kind
    if k in "iu":
        return f"int{series.dtype.itemsize * 8}"
    if k == "f":
        return f"float{series.dtype.itemsize * 8}"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("dtypecheck", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: error: {e}")
            continue
        bad = []
        for col in sorted(spdf.columns):
            if col not in odf.columns:
                bad.append(f"{col}: missing in oracle")
                continue
            st, ot = dtype_tag(spdf[col]), dtype_tag(odf[col])
            if st == ot:
                continue
            # pandas widens nullable ints to float64 / object.  Softness is
            # confined to columns where that widening demonstrably happened
            # (NaNs present) or to int-object columns (HUGEINT → python
            # ints, value-identical): an all-integral float column WITHOUT
            # nulls means the engine really emitted a float (e.g. DuckDB
            # sum() → HUGEINT → float64) — exactly the r4 q_span_mask hash
            # failure — and must stay a HARD mismatch vs an int column
            # (ADVICE r5).
            def relaxed(series, tag):
                if tag.startswith("float"):
                    vals = series.dropna()
                    if (
                        series.isna().any()
                        and len(vals)
                        and np.all(np.mod(vals, 1) == 0)
                    ):
                        return "int*"
                if tag == "object":
                    vals = series.dropna()
                    if len(vals) and all(isinstance(v, int) for v in vals):
                        return "int*"
                return tag
            rs, ro = relaxed(spdf[col], st), relaxed(odf[col], ot)
            if rs == ro or {rs, ro} == {"int*", "int64"}:
                bad.append(f"{col}: SOFT spark={st} oracle={ot}")
            else:
                bad.append(f"{col}: spark={st} oracle={ot}")
        hard = [b for b in bad if "SOFT" not in b]
        if hard:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(hard)}")
        elif bad:
            print(f"soft  {name}: {'; '.join(bad)}")
        else:
            print(f"PASS  {name}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} DTYPE FAILURES: {failures}")
        return 1
    print("\nall dtype checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
