"""Differential fuzz of the ROUTED fetch: RollupSet cascade + archive
selection + clamping vs the pure-Python whisper oracle chain.

Covers SURVEY §7.2(b): the same query must return coarser data as its
from-time ages, with each level derived from the previous level's xFF-gated
output (cascade), and the clamp rules applied against the coarsest
retention horizon.
"""

import random

import pytest

from datayours_spark.kernel.archives import parse_retention_str, select_read_archive
from datayours_spark.plans.router import RollupSet

from . import whisper_oracle as oracle

SPEC = "1m:1h,10m:6h,1h:36h"
T_MAX = 36 * 3_600
METHODS = ["average", "sum", "last", "max", "min"]


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_routed_fetch_differential(spark, seed):
    rng = random.Random(seed)
    archives = parse_retention_str(SPEC)
    method = rng.choice(METHODS)
    xff = rng.choice([0.0, 0.25, 0.5])
    now = T_MAX

    writes = [
        (rng.randrange(0, T_MAX), round(rng.uniform(-50, 50), 3))
        for _ in range(400)
    ]
    rows = [("s.r", ts, seq, v) for seq, (ts, v) in enumerate(writes)]
    dp = spark.createDataFrame(
        rows, "path string, ts_sec bigint, ts_us bigint, value double"
    )
    rollups = RollupSet.build(dp, archives, method=method, xff=xff)

    # oracle: cascade each level FROM THE PREVIOUS level's gated output
    o_levels = {60: oracle.lww(writes, 60)}
    o_levels[600] = oracle.rollup_level(o_levels[60], 60, 600, method, xff)
    o_levels[3600] = oracle.rollup_level(o_levels[600], 600, 3600, method, xff)

    oldest = archives[-1].oldest(now)
    for _ in range(6):
        frm = rng.randrange(0, T_MAX - 60)
        until = rng.randrange(frm + 60, T_MAX)
        step, grid = rollups.fetch(spark, "s.r", frm, until, now)

        c_frm, c_until = max(frm, oldest), min(until, now)
        assert step == select_read_archive(archives, c_frm, now).seconds_per_point
        expect = oracle.fetch(o_levels[step], c_frm, c_until, step)
        got = {r["slot"]: r["value"] for r in grid.collect()}
        assert got == pytest.approx(expect), (
            f"routed fetch diverges: seed={seed} method={method} xff={xff} "
            f"range=({frm},{until}) step={step}"
        )
