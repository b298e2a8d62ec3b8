"""Differential fuzz of the SINGLE-PASS mixed_fetch: the one-scan,
per-row-step cascade must emit exactly what the straightforward per-spec
composition (one RollupSet per retention spec, fetch_many each) emits —
across random spec assignments, methods/xff, window ages (different routed
depths per spec), and clamp edges.

This pins the two load-bearing arguments of the rewrite:
- identity hops are exact fixpoints (a spec that reached its routed step
  rides the remaining hops unchanged), and
- the routed-step-aligned raw time filter captures exactly the
  contributing finer slots (whisper's consecutive-divisibility invariant
  makes the routed step a multiple of every finer step in its chain).
"""

import random

import pytest

from datayours_spark.kernel.rules import rule_engine_from_confs
from datayours_spark.plans.router import RollupSet, mixed_fetch
from datayours_spark.kernel.archives import parse_retention_str

T_MAX = 36 * 3_600

SCHEMAS_CONF = """
[deep]
pattern = ^m\\.deep
retentions = 1m:1h,10m:6h,1h:36h

[shallow]
pattern = ^m\\.shallow
retentions = 10m:2h,1h:36h

[flat]
pattern = ^m\\.flat
retentions = 1h:36h
"""

AGG_CONF = """
[sums]
pattern = 0$
xFilesFactor = 0
aggregationMethod = sum

[maxes]
pattern = 1$
xFilesFactor = 0.25
aggregationMethod = max

[lasts]
pattern = 2$
xFilesFactor = 0
aggregationMethod = last
"""


def _reference_mixed_fetch(spark, dp, engine, paths, frm, until, now):
    """The pre-rewrite composition: one RollupSet per retention spec (its
    own filtered scan), fetch_many per spec, union — the semantics the
    one-scan plan must reproduce."""
    from pyspark.sql import functions as F

    by_spec = {}
    for p in paths:
        by_spec.setdefault(engine.match_schema(p).retentions, []).append(p)
    out = None
    for spec, spec_paths in sorted(by_spec.items()):
        meta = spark.createDataFrame(
            [
                (
                    p,
                    engine.match_aggregation(p).aggregation_method,
                    engine.match_aggregation(p).x_files_factor,
                )
                for p in spec_paths
            ],
            "path string, method string, xff double",
        )
        rs = RollupSet.build(
            dp.where(F.col("path").isin(spec_paths)),
            parse_retention_str(spec),
            series_meta=meta,
        )
        step, grid = rs.fetch_many(spark, spec_paths, frm, until, now)
        part = grid.select("path", "slot", "value", F.lit(step).alias("step"))
        out = part if out is None else out.unionByName(part)
    return out


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_single_pass_equals_per_spec_composition(spark, seed):
    rng = random.Random(seed)
    engine = rule_engine_from_confs(
        schemas_conf=SCHEMAS_CONF, aggregation_conf=AGG_CONF
    )
    paths = [
        f"m.{kind}.s{i}" for kind in ("deep", "shallow", "flat")
        for i in range(3)
    ]
    now = T_MAX
    rows = []
    seq = 0
    for p in paths:
        for _ in range(rng.randrange(150, 250)):
            rows.append(
                (p, rng.randrange(0, T_MAX), seq,
                 round(rng.uniform(-50, 50), 3))
            )
            seq += 1
    dp = spark.createDataFrame(
        rows, "path string, ts_sec bigint, ts_us bigint, value double"
    )

    # window ages chosen to hit: all specs at finest (recent), deep spec
    # mid-cascade, everything at its coarsest (old), and the clamp edge
    windows = [
        (now - 1_800, now),                    # recent: deep→1m, shallow→10m
        (now - 4 * 3_600, now - 3 * 3_600),    # deep→10m level
        (now - 30 * 3_600, now - 20 * 3_600),  # deep→1h, shallow→1h
        (now - 48 * 3_600, now - 37 * 3_600),  # until < oldest for all: empty
        (now - 40 * 3_600, now),               # frm clamps to oldest
    ]
    for frm, until in windows:
        got_df = mixed_fetch(spark, dp, engine, paths, frm, until, now)
        want_df = _reference_mixed_fetch(
            spark, dp, engine, paths, frm, until, now
        )
        def key(rows_):
            return {
                (r["path"], r["slot"], r["step"]):
                    None if r["value"] is None else round(r["value"], 6)
                for r in rows_
            }
        got, want = key(got_df.collect()), key(want_df.collect())
        assert got == want, f"window ({frm}, {until}): mismatch"
        if until >= now - 36 * 3_600:
            assert got, f"window ({frm}, {until}): unexpectedly empty"
