#!/usr/bin/env python
"""Dump `.explain("formatted")` for named bench queries to plans/<tag>/.

Usage:
  python tools/dumpplans.py r15 after q_tpch_q21 q_span_incremental ...
  python tools/dumpplans.py r15 before --all     # every BENCH_QUERIES entry

Writes plans/<tag>/<query>_<suffix>.txt.  Runs with the index caches
DISABLED (DATAYOURS_NO_INDEX_CACHE=1) so plans show full lineage, the
same mode tools/plancheck.py inspects.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("DATAYOURS_NO_INDEX_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from datayours_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if names == ["--all"]:
        names = list(bench.BENCH_QUERIES)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    registry = entrymod.queries()
    spark = get_spark("datayours-dumpplans")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = registry[name](spark, bench.SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
