#!/usr/bin/env python
"""Scale smoke: core operators at 10M+ synthetic datapoints (100x the
bench fixtures) with a deliberately skewed hot series.

Answers the would-it-hold-at-1000x question with measurements instead of
claims: per-operator wall time and rows/s for the LWW slot aggregation,
rollup cascade, routed dense fetch, skew-safe chunked LOCF, and the carbon
aggregator — all over generated data (spark.range, never collected).

Usage: python tools/scalesmoke.py          [SCALE_ROWS=30000000 to go bigger]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datayours_spark.kernel.rules import parse_aggregation_rules
from datayours_spark.operators.align import locf_chunked
from datayours_spark.operators.fetch import fetch_grid, lww_slots
from datayours_spark.operators.rollup import carbon_aggregate, rollup
from datayours_spark.session import get_spark

N = int(os.environ.get("SCALE_ROWS", 10_000_000))
N_SERIES = 500
T0 = 1_704_067_200


def main() -> None:
    # local mode: driver heap is the executor heap — size for the 100M run
    spark = get_spark(
        "datayours-scalesmoke",
        driver_memory=os.environ.get("SCALE_DRIVER_MEM", "48g"),
    )

    # one datapoint per (series, second); 30% of all rows hit ONE hot path —
    # the skew shape that breaks naive per-path processing
    base = spark.range(N)
    dp = base.select(
        F.when(F.col("id") % 10 < 3, F.lit("s.hot"))
        .otherwise(F.concat(F.lit("s.p"), (F.col("id") % N_SERIES).cast("string")))
        .alias("path"),
        (F.lit(T0) + (F.col("id") / N_SERIES).cast("bigint")).alias("ts_sec"),
        (F.lit(T0).cast("bigint") * 1_000_000 + F.col("id")).alias("ts_us"),
        (F.col("id") % 1_000).cast("double").alias("value"),
    )

    timings: dict[str, dict] = {}

    def bench(name: str, df, rows_in: int) -> None:
        t = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t
        timings[name] = {
            "sec": round(dt, 2),
            "rows_in": rows_in,
            "rows_per_sec": int(rows_in / dt),
        }

    bench("lww_slots_60s", lww_slots(dp, 60), N)
    fine = lww_slots(dp, 60)
    bench("rollup_60s_to_1h", rollup(fine, 60, 3_600, "average", 0.5), N)
    span = N // N_SERIES  # seconds of data generated
    bench(
        "fetch_one_series_1day",
        fetch_grid(spark, dp, "s.p7", T0 + span // 2, T0 + span // 2 + 86_400, 60),
        N,
    )
    # skewed LOCF: the hot series alone is ~30% of all rows
    hot = lww_slots(dp.where(F.col("path") == "s.hot"), 60)
    bench("locf_chunked_hot_series", locf_chunked(hot, chunk_span=3_600 * 24), N // 3)
    rules = parse_aggregation_rules("agg.all (600) = sum s.*")
    bench("carbon_aggregate_600s", carbon_aggregate(dp, rules), N)
    # as-of resample: every series onto a 1h grid across the full span —
    # the union-merge + per-path LOCF window over ALL rows
    from datayours_spark.operators.align import asof_resample

    samples = dp.select("path", "ts_sec", "value")
    bench(
        "asof_resample_all_series_1h",
        asof_resample(spark, samples, T0, T0 + span, 3_600),
        N,
    )

    print(
        json.dumps(
            {
                "metric": "scale smoke (synthetic datapoints)",
                "rows": N,
                "series": N_SERIES + 1,
                "ops": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
