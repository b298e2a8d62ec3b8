"""Differential fuzz: Spark operators vs the pure-Python whisper oracle.

Seeded random write sequences (out-of-order timestamps, duplicate slots,
multiple series) run through BOTH the oracle ring math and the Spark
lww_slots → rollup → fetch_grid pipeline; outputs must match exactly.
"""

import random

import pytest

from datayours_spark.operators.fetch import fetch_grid, lww_slots
from datayours_spark.operators.rollup import rollup

from . import whisper_oracle as oracle

METHODS = ["average", "sum", "last", "max", "min"]


def random_writes(rng, n, t_max):
    writes = []
    for _ in range(n):
        ts = rng.randrange(0, t_max)
        value = round(rng.uniform(-100, 100), 3)
        writes.append((ts, value))
    # ~10% duplicate timestamps (same-slot overwrite churn)
    for _ in range(n // 10):
        ts, _ = rng.choice(writes)
        writes.append((ts, round(rng.uniform(-100, 100), 3)))
    return writes


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_differential_pipeline(spark, make_datapoints, seed):
    rng = random.Random(seed)
    t_max = 4 * 3600
    per_path = {p: random_writes(rng, 120, t_max) for p in ["s.a", "s.b", "s.c"]}
    method = rng.choice(METHODS)
    xff = rng.choice([0.0, 0.25, 0.5, 1.0])

    # whisper's "last write wins" is ARRIVAL order (a later update overwrites
    # the slot even if its timestamp is earlier, L_DataWhisper.lua:346-354) —
    # so the LWW order key here is the arrival sequence number, not event time
    rows = [
        (p, ts, seq, v)
        for p, ws in per_path.items()
        for seq, (ts, v) in enumerate(ws)
    ]
    dp = spark.createDataFrame(
        rows, "path string, ts_sec bigint, ts_us bigint, value double"
    )

    fine_step, coarse_step = 60, 600
    spark_fine = lww_slots(dp, fine_step)
    spark_coarse = rollup(spark_fine, fine_step, coarse_step, method=method, xff=xff)

    for p, writes in per_path.items():
        o_fine = oracle.lww(writes, fine_step)
        o_coarse = oracle.rollup_level(o_fine, fine_step, coarse_step, method, xff)

        s_fine = {
            r["slot"]: r["value"]
            for r in spark_fine.where(spark_fine.path == p).collect()
        }
        assert s_fine == o_fine, f"fine slots diverge for {p} (seed {seed})"

        s_coarse = {
            r["slot"]: r["value"]
            for r in spark_coarse.where(spark_coarse.path == p).collect()
        }
        assert s_coarse == pytest.approx(o_coarse), (
            f"rollup diverges for {p} method={method} xff={xff} (seed {seed})"
        )

        # dense fetch over a random window at the fine resolution
        a = rng.randrange(0, t_max // 2)
        b = rng.randrange(a + fine_step, t_max)
        s_grid = {
            r["slot"]: r["value"]
            for r in fetch_grid(spark, dp, p, a, b, fine_step).collect()
        }
        assert s_grid == oracle.fetch(o_fine, a, b, fine_step)


@pytest.mark.parametrize("seed", [3, 11])
def test_differential_per_series_method_dispatch(spark, seed):
    """rollup_all_methods vs the oracle: every series gets ITS OWN random
    method/xff (the storage-aggregation dispatch path) and must match the
    oracle's per-series propagation exactly."""
    from datayours_spark.operators.rollup import rollup_all_methods

    rng = random.Random(seed)
    t_max = 4 * 3600
    paths = [f"s.p{i}" for i in range(6)]
    per_path = {p: random_writes(rng, 100, t_max) for p in paths}
    conf = {
        p: (rng.choice(METHODS), rng.choice([0.0, 0.25, 0.5]))
        for p in paths[:4]  # the last two fall back to the defaults
    }
    default_method, default_xff = "average", 0.5

    rows = [
        (p, ts, seq, v)
        for p, ws in per_path.items()
        for seq, (ts, v) in enumerate(ws)
    ]
    dp = spark.createDataFrame(
        rows, "path string, ts_sec bigint, ts_us bigint, value double"
    )
    meta = spark.createDataFrame(
        [(p, m, x) for p, (m, x) in conf.items()],
        "path string, method string, xff double",
    )
    fine_step, coarse_step = 60, 600
    out = rollup_all_methods(
        lww_slots(dp, fine_step), fine_step, coarse_step, meta,
        default_method=default_method, default_xff=default_xff,
    )
    for p in paths:
        method, xff = conf.get(p, (default_method, default_xff))
        o_fine = oracle.lww(per_path[p], fine_step)
        o_coarse = oracle.rollup_level(
            o_fine, fine_step, coarse_step, method, xff
        )
        s_coarse = {
            r["slot"]: r["value"] for r in out.where(out.path == p).collect()
        }
        assert s_coarse == pytest.approx(o_coarse), (
            f"per-series dispatch diverges for {p} "
            f"method={method} xff={xff} (seed {seed})"
        )
