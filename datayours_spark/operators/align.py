"""Multi-series alignment, as-of resampling, null policies, staircase.

Reproduces:
- **J1 grid pivot** (`/root/reference/L_DataGraph.lua:205-254`): fetch N
  series, union their time axes, one row per timestamp with one column per
  series, sorted by time ("mixed timebase support").
- **J2 as-of resample** (`L_DataMineServer.lua:148-164`,
  `L_DataBaseDM.lua:102-116`): for each target grid time, the value of the
  latest sample ≤ t (backward as-of / LOCF against irregular samples).
- **F8 null policies** (`L_DataGraph.lua:149-183, 226-231`): drawNullAs
  null (keep) / zero / hold (last observation carried forward); defaults by
  aggregation method: average→null, sum→zero, last/max/min→hold.
- **F9 staircase** (`L_DataGraph.lua:244-254`): duplicate the previous row
  at each new timestamp (step-function rendering).

Scale notes:
- LOCF/as-of use a window partitioned by series path — state per partition
  is one running value; for series long enough to make a hot partition,
  `locf_chunked` bounds every sort to a chunk and carries chunk boundaries
  through a tiny summary table (identical results, verified by test).
- `apply_null_policy`/`staircase` accept unpartitioned input ONLY because
  their input is a fetched render grid — bounded by maxpoints per series,
  like the reference's per-series render loop; bulk LOCF goes through the
  partitioned/chunked paths.
- The pivot shuffles once on the quantized timestamp; column count equals
  the (small) target list, driver-enumerated like the reference's targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datayours_spark.operators.fetch import time_grid


def pivot_align(slots: DataFrame, paths: list[str]) -> DataFrame:
    """Union time axes of N series into one row per slot, one column per path.

    Input: (path, slot, value); output: (slot, <path1>, ..., <pathN>) sorted
    by slot.  Explicit `paths` keeps the pivot single-pass (no value-scan job).
    """
    return (
        slots.where(F.col("path").isin(paths))
        .groupBy("slot")
        .pivot("path", paths)
        .agg(F.first("value"))
        .orderBy("slot")
    )


def asof_resample(
    spark: SparkSession,
    samples: DataFrame,
    from_time: int,
    until_time: int,
    step: int,
) -> DataFrame:
    """Backward as-of join of a regular grid against irregular samples.

    For every (path, grid slot t): value of the latest sample with
    ``ts_sec <= t`` (carrying across empty slots — `getPrev()` semantics,
    `L_DataMineServer.lua:148-164`).  Samples before the grid start still
    seed the carried value.

    Implemented as union-merge + LOCF window rather than a range join: one
    sort per path partition, linear state, no quadratic blow-up on dense
    sample runs.
    """
    # time_grid already starts at from_time - from_time % step
    grid = time_grid(spark, from_time, until_time, step)
    return asof_on_grid(samples, grid, hi=until_time)


def asof_on_grid(
    samples: DataFrame, grid: DataFrame, hi: int
) -> DataFrame:
    """Backward as-of of an ARBITRARY instant grid against irregular
    samples — the shared kernel of :func:`asof_resample` (uniform grid)
    and the dataMine graph plot's rounded 721-point range
    (`L_DataMineServer.lua:138-164`).

    ``grid`` is a one-column (slot) table of ascending instants, ``hi``
    its driver-known upper bound (callers construct the grid, so no
    bound-discovery job runs).  One union-merge LOCF pass covers every
    path × instant; samples at a grid instant win over the carried value.
    """
    paths = samples.select("path").distinct()
    grid_rows = paths.crossJoin(grid.select("slot")).select(
        "path", F.col("slot").cast("long").alias("ts_sec"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    sample_rows = samples.select(
        "path", "ts_sec", "value", F.lit(0).alias("is_grid")
    ).where(F.col("ts_sec") <= hi)
    # samples sort BEFORE the grid row at the same ts_sec (is_grid ascending
    # puts the sample first so an exact-time sample is visible to the grid row)
    w = (
        Window.partitionBy("path")
        .orderBy("ts_sec", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = grid_rows.unionByName(sample_rows).withColumn(
        "locf", F.last("value", ignorenulls=True).over(w)
    )
    return (
        merged.where(F.col("is_grid") == 1)
        .select(
            "path", F.col("ts_sec").cast("long").alias("slot"),
            F.col("locf").alias("value"),
        )
    )


def apply_null_policy(
    grid: DataFrame, policy: str, order_col: str = "slot", partition_cols: list[str] | None = None
) -> DataFrame:
    """drawNullAs semantics over a dense fetch grid (`L_DataGraph.lua:226-231`).

    policy: 'null' (identity), 'zero' (coalesce 0), 'hold' (LOCF within the
    fetched range — previous starts empty, so leading nulls stay null),
    'connected' (linear interpolation across interior null runs — the
    reference's connected line mode, `L_DataGraph.lua:149-156, 264`, drawn
    at plot time there, materialized here; leading/trailing nulls stay
    null because there is no second endpoint to connect to).
    """
    if policy == "null":
        return grid
    if policy == "zero":
        return grid.withColumn("value", F.coalesce(F.col("value"), F.lit(0.0)))
    if policy in ("hold", "connected"):
        def _w(rows):
            w = Window.orderBy(order_col)
            if partition_cols:
                w = Window.partitionBy(*partition_cols).orderBy(order_col)
            return w.rowsBetween(*rows)
        back = _w((Window.unboundedPreceding, 0))
        held = F.last("value", ignorenulls=True).over(back)
        if policy == "hold":
            return grid.withColumn("value", held)
        fwd = _w((0, Window.unboundedFollowing))
        slot = F.col(order_col)
        prev_v = held
        prev_t = F.last(
            F.when(F.col("value").isNotNull(), slot), ignorenulls=True
        ).over(back)
        next_v = F.first("value", ignorenulls=True).over(fwd)
        next_t = F.first(
            F.when(F.col("value").isNotNull(), slot), ignorenulls=True
        ).over(fwd)
        interp = prev_v + (next_v - prev_v) * (slot - prev_t) / (next_t - prev_t)
        return grid.withColumn(
            "value",
            F.when(F.col("value").isNotNull(), F.col("value")).otherwise(interp),
        )
    raise ValueError(f"unknown null policy {policy}")


def locf_chunked(
    grid: DataFrame,
    chunk_span: int,
    order_col: str = "slot",
    partition_col: str = "path",
) -> DataFrame:
    """Skew-safe LOCF: identical results to the `hold` policy, but no single
    sort partition ever exceeds `chunk_span` worth of one series.

    SURVEY §7.2(c): a years-long 1s-resolution series makes
    `Window.partitionBy(path)` a hot partition at 100 TB.  Classic two-phase
    fix: (1) LOCF within (path, chunk) — parallel across chunks; (2) carry
    the last known value per chunk through a window over the TINY per-chunk
    summary (rows / chunk_span); (3) fill each chunk's leading nulls from
    the carried value.  Total: one bounded sort + one small-table window +
    one co-partitioned join.
    """
    chunk = (F.col(order_col) - (F.col(order_col) % F.lit(chunk_span))).alias("__chunk")
    w1 = (
        Window.partitionBy(partition_col, "__chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = grid.withColumn("__chunk", chunk).withColumn(
        "__locf", F.last("value", ignorenulls=True).over(w1)
    )
    # last known value leaving each chunk = the final row's running LOCF
    carry = within.groupBy(partition_col, "__chunk").agg(
        F.max_by("__locf", F.col(order_col)).alias("__carry")
    )
    w2 = (
        Window.partitionBy(partition_col)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    incoming = carry.withColumn(
        "__incoming", F.last("__carry", ignorenulls=True).over(w2)
    ).select(partition_col, "__chunk", "__incoming")
    out_cols = grid.columns
    return (
        within.join(incoming, [partition_col, "__chunk"], "left")
        .withColumn("value", F.coalesce("__locf", "__incoming"))
        .select(*out_cols)
    )


def default_modes_for_method(method: str) -> tuple[str, str]:
    """(lineMode, drawNullAs) defaults per aggregation method
    (`L_DataGraph.lua:172-175`)."""
    action = {"average": "connected", "sum": "staircase", "last": "staircase",
              "max": "staircase", "min": "staircase"}
    nulls = {"average": "null", "sum": "zero", "last": "hold",
             "max": "hold", "min": "hold"}
    return action.get(method, "connected"), nulls.get(method, "null")


def staircase(
    rows: DataFrame,
    order_col: str = "slot",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Duplicate the previous row at each new timestamp (`L_DataGraph.lua:244-254`).

    Input rows (slot, value...); output interleaves, for every consecutive
    pair (t_prev, t), an extra row carrying t with t_prev's values.  The
    first timestamp gets no duplicate.  Implemented with lag + posexplode —
    no driver loop, one window pass.  Pass `partition_cols` (e.g. the
    series key) whenever the input holds one — the lag window then
    parallelizes per series instead of sorting globally on one partition.
    """
    parts = list(partition_cols or [])
    value_cols = [c for c in rows.columns if c != order_col and c not in parts]
    w = Window.orderBy(order_col)
    if parts:
        w = Window.partitionBy(*parts).orderBy(order_col)
    lagged = rows.select(
        *[F.col(c) for c in parts],
        F.col(order_col),
        *[F.col(c) for c in value_cols],
        *[F.lag(c).over(w).alias(f"__prev_{c}") for c in value_cols],
        F.lag(order_col).over(w).alias("__prev_t"),
    )
    dup_struct = F.struct(
        F.lit(0).alias("__ord"),
        *[F.col(f"__prev_{c}").alias(c) for c in value_cols],
    )
    cur_struct = F.struct(
        F.lit(1).alias("__ord"), *[F.col(c).alias(c) for c in value_cols]
    )
    pair = F.when(
        F.col("__prev_t").isNotNull(), F.array(dup_struct, cur_struct)
    ).otherwise(F.array(cur_struct))
    exploded = lagged.select(
        *[F.col(c) for c in parts],
        F.col(order_col),
        F.explode(pair).alias("r"),
    ).select(
        *[F.col(c) for c in parts],
        F.col(order_col),
        F.col("r.__ord").alias("__ord"),
        *[F.col(f"r.{c}").alias(c) for c in value_cols],
    )
    return exploded.orderBy(*parts, order_col, "__ord").drop("__ord")
