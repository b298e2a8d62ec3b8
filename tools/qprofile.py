#!/usr/bin/env python
"""Per-bench-query profile: wall seconds + Spark JOB and STAGE counts.

Job/stage counts are the host-noise-free lens this round's work is
steered by (the sf0.1 inputs are ~17 MB, so multi-second bench entries
are fixed overhead — scheduling round-trips, plan analysis, codegen —
not data volume; see OPTIMIZATION_r15.md "Methodology").

Runs the named queries (default: all BENCH_QUERIES) in ONE session with
the standard bench warm-ups, in bench order, timing the same
noop-sink action as bench.py, and prints one JSON line per query:
  {"query": ..., "sec": ..., "jobs": N, "stages": N}

Usage:
  python tools/qprofile.py                 # all bench queries
  python tools/qprofile.py q_ann_ivfpq q_tpch_q21
  SPARK_GRAFT_SF_DIR=... python tools/qprofile.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from datayours_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:] or list(bench.BENCH_QUERIES)
    registry = entrymod.queries()
    spark = get_spark("datayours-qprofile")
    registry["q_tally_minmax"](spark, bench.SF_DIR).count()
    registry["q_text_stats"](spark, bench.SF_DIR).count()
    bench._warm_streaming(spark)
    bench._warm_arrow(spark)
    st = spark.sparkContext.statusTracker()
    probe = bench._cpu_probe_sec()
    total = 0.0
    for name in names:
        fn = registry[name]
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = fn(spark, bench.SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = sorted(set(st.getJobIdsForGroup(None) or []) - before)
        stages = 0
        for j in jobs:
            info = st.getJobInfo(j)
            if info is not None:
                stages += len(info.stageIds)
        total += dt
        print(
            json.dumps(
                {
                    "query": name,
                    "sec": round(dt, 3),
                    "jobs": len(jobs),
                    "stages": stages,
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "total_sec": round(total, 3),
                "probe_before": probe,
                "probe_after": bench._cpu_probe_sec(),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
