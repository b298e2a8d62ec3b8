"""Resolution router: pick the rollup level that serves a time range.

Reproduces read-side archive selection (`/root/reference/L_DataWhisper.lua:
544-549`): the FINEST archive whose retention still covers `fromTime` serves
the query — older ranges are answered from coarser, longer-retention levels.
This is the reference's only "planner"; here it is a small driver-side router
over materialized rollup DataFrames (SURVEY.md §4: a parameterized view, not
a Catalyst rule).

Scale notes: each rollup level is a separate (much smaller) table; routing
means the query touches ONLY that level — the 100 TB raw table is never
scanned for a month-long dashboard query.  Levels are derived finest→coarsest
so each aggregation reads the previous level, not the raw data (cascade, as
the reference propagates archive-to-archive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.kernel.archives import Archive, select_read_archive
from datayours_spark.operators.fetch import lww_slots, time_grid
from datayours_spark.operators.rollup import rollup, rollup_all_methods


class RollupSet:
    """Materialized rollup chain: step → (path, slot, value) DataFrame."""

    def __init__(self, levels: dict[int, DataFrame], archives: list[Archive]):
        self.levels = levels
        self.archives = sorted(archives, key=lambda a: a.seconds_per_point)

    @classmethod
    def build(
        cls,
        datapoints: DataFrame,
        archives: list[Archive],
        method: str = "average",
        xff: float = 0.5,
        order_col: str = "ts_us",
        series_meta: DataFrame | None = None,
        methods: "tuple[str, ...] | None" = None,
    ) -> "RollupSet":
        """Derive every level by cascading from the finest (A2 propagation).

        With `series_meta` (a small (path, method, xff) table), every cascade
        hop dispatches the aggregation method and xFilesFactor PER SERIES —
        the reference reads both from storage-aggregation.conf on every
        propagate (`L_DataWhisper.lua:493-523`, assignment
        `L_DataCache.lua:146-160`); `method`/`xff` become the defaults for
        unmatched paths.  Without it, one global method/xff applies.
        """
        archives = sorted(archives, key=lambda a: a.seconds_per_point)
        finest = archives[0].seconds_per_point
        levels: dict[int, DataFrame] = {
            finest: lww_slots(datapoints, finest, order_col=order_col)
        }
        prev_step = finest
        for a in archives[1:]:
            step = a.seconds_per_point
            if series_meta is not None:
                level = rollup_all_methods(
                    levels[prev_step], prev_step, step, series_meta,
                    default_method=method, default_xff=xff, methods=methods,
                )
            else:
                level = rollup(
                    levels[prev_step], prev_step, step, method=method, xff=xff
                )
            levels[step] = level.select("path", "slot", "value")
            prev_step = step
        return cls(levels, archives)

    def route(self, from_time: int, now: int) -> int:
        """Step of the finest archive covering from_time (A5)."""
        return select_read_archive(self.archives, from_time, now).seconds_per_point

    def fetch(
        self,
        spark: SparkSession,
        path: str,
        from_time: int,
        until_time: int,
        now: int,
    ) -> tuple[int, DataFrame]:
        """Routed dense-grid fetch: returns (chosen_step, (slot, value) grid).

        Applies the reference's clamp rules (`L_DataWhisper.lua:535-542`)
        against the coarsest archive's retention horizon.
        """
        coarsest = self.archives[-1]
        oldest = coarsest.oldest(now)
        if from_time > now or until_time < oldest:
            step = self.route(max(from_time, oldest), now)
            empty = spark.range(0).select(
                F.col("id").alias("slot"), F.lit(None).cast("double").alias("value")
            )
            return step, empty
        from_time = max(from_time, oldest)
        until_time = min(until_time, now)
        step = self.route(from_time, now)
        slots = (
            self.levels[step]
            .where(F.col("path") == path)
            .where(
                F.col("slot").between(
                    from_time - from_time % step, until_time - until_time % step
                )
            )
            .drop("path")
        )
        grid = time_grid(spark, from_time, until_time, step)
        return step, grid.join(F.broadcast(slots), "slot", "left").orderBy("slot")

    def fetch_many(
        self,
        spark: SparkSession,
        paths: list[str],
        from_time: int,
        until_time: int,
        now: int,
    ) -> tuple[int, DataFrame]:
        """Multi-target routed fetch in ONE distributed pass.

        Same clamping/routing as :meth:`fetch` (all targets share the
        window, so they route to the same level), but the level is scanned
        once with ``path IN (...)`` and the dense grid is `paths ×
        time_grid` — N targets cost one filtered aggregation + one join,
        not N plan copies (the reference loops per leaf; at 100 TB the loop
        is the difference between 1 scan and N scans).  Returns
        (step, (path, slot, value) grid).
        """
        coarsest = self.archives[-1]
        oldest = coarsest.oldest(now)
        if from_time > now or until_time < oldest:
            step = self.route(max(from_time, oldest), now)
            empty = spark.range(0).select(
                F.lit("").alias("path"),
                F.col("id").alias("slot"),
                F.lit(None).cast("double").alias("value"),
            )
            return step, empty
        from_time = max(from_time, oldest)
        until_time = min(until_time, now)
        step = self.route(from_time, now)
        slots = self.levels[step].where(F.col("path").isin(paths)).where(
            F.col("slot").between(
                from_time - from_time % step, until_time - until_time % step
            )
        )
        grid = (
            spark.createDataFrame([(p,) for p in paths], "path string")
            .crossJoin(time_grid(spark, from_time, until_time, step))
        )
        return step, grid.join(F.broadcast(slots), ["path", "slot"], "left")


def mixed_fetch(
    spark: SparkSession,
    datapoints: DataFrame,
    engine,
    paths: list[str],
    from_time: int,
    until_time: int,
    now: int,
    order_col: str = "ts_us",
) -> DataFrame:
    """Mixed-timebase multi-target fetch (J1 + A5 combined): every path is
    served from ITS OWN schema-assigned archive set, at the step its own
    retention routes to for the same [from, until] window.

    The reference's "mixed timebase support" (`L_DataGraph.lua:205-254`):
    one graph can span a 1-minute series and a 1-hour series — each series
    fetches at its own archive resolution and the time axis unions them.
    Here `engine` (kernel.rules.RuleEngine) assigns retentions (storage-
    schemas) and method/xff (storage-aggregation) per path.

    Output: (path, slot, value, step) — rows at different slot cadences per
    path, the union the reference draws.

    One-scan plan: K retention specs used to mean K filtered scans of
    `datapoints` (one RollupSet per spec); now the routing arithmetic is
    all driver-side and the data path is a SINGLE scan tagged with a
    broadcast path→(spec, method, xff, finest step, time bounds) map,
    cascaded hop-by-hop with per-row step columns.  Specs that reached
    their routed step ride the remaining hops as exact identity
    aggregations (single-row groups: every method and the xFF gate are
    fixpoints), so the lineage stays linear — no per-spec branch ever
    re-scans the source.  At 100 TB that is 1 scan instead of K.
    """
    from pyspark.sql import functions as F

    from datayours_spark.kernel.archives import (
        parse_retention_str,
        select_read_archive,
    )

    by_spec: dict[str, list[str]] = {}
    for p in paths:
        by_spec.setdefault(engine.match_schema(p).retentions, []).append(p)

    # -- driver-side routing arithmetic (|specs| ~ a dashboard, tiny) --
    specs: list[tuple[int, list[str], int, int, int, list[int]]] = []
    path_rows: list[tuple] = []
    for spec_id, (spec, spec_paths) in enumerate(sorted(by_spec.items())):
        archives = parse_retention_str(spec)
        oldest = archives[-1].oldest(now)
        if from_time > now or until_time < oldest:
            # reference clamp: nothing to serve (`L_DataWhisper.lua:535-542`)
            continue
        from_c = max(from_time, oldest)
        until_c = min(until_time, now)
        routed = select_read_archive(archives, from_c, now).seconds_per_point
        steps = [a.seconds_per_point for a in archives]
        chain = steps[: steps.index(routed) + 1]
        # whisper validates consecutive divisibility, so `routed` is a
        # multiple of every finer step in its chain: a raw filter aligned
        # at the routed step captures exactly the points that can reach
        # the in-window routed slots at every cascade level.
        lo = from_c - from_c % routed
        hi = until_c - until_c % routed + routed - 1
        specs.append((spec_id, spec_paths, from_c, until_c, routed, chain))
        for p in spec_paths:
            agg = engine.match_aggregation(p)
            path_rows.append(
                (p, spec_id, agg.aggregation_method, agg.x_files_factor,
                 chain[0], lo, hi)
            )

    if not specs:
        return spark.range(0).select(
            F.lit("").alias("path"),
            F.col("id").alias("slot"),
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("step"),
        )

    path_meta = spark.createDataFrame(
        path_rows,
        "path string, spec_id int, method string, xff double, "
        "f0 bigint, lo bigint, hi bigint",
    )

    # -- the ONE datapoints scan: tag, bound, LWW at each spec's finest --
    tagged = (
        datapoints.where(F.col("path").isin([r[0] for r in path_rows]))
        .join(F.broadcast(path_meta), "path")
        .where(F.col("ts_sec").between(F.col("lo"), F.col("hi")))
    )
    cur = tagged.groupBy(
        "path", "spec_id", "method", "xff",
        (F.col("ts_sec").cast("long")
         - F.col("ts_sec").cast("long") % F.col("f0")).alias("slot"),
    ).agg(F.max_by("value", order_col).alias("value"))

    # -- cascade hops with per-row steps; finished specs are identity --
    max_hops = max(len(chain) - 1 for *_, chain in specs)
    for i in range(1, max_hops + 1):
        hop_rows = []
        for spec_id, *_, chain in specs:
            prev_s, this_s = (
                (chain[i - 1], chain[i]) if len(chain) > i
                else (chain[-1], chain[-1])
            )
            hop_rows.append((spec_id, this_s, this_s // prev_s))
        hop = spark.createDataFrame(
            hop_rows, "spec_id int, this_step bigint, ratio int"
        )
        agged = (
            cur.join(F.broadcast(hop), "spec_id")
            .groupBy(
                "path", "spec_id", "method", "xff", "ratio",
                (F.col("slot") - F.col("slot") % F.col("this_step"))
                .alias("lslot"),
            )
            .agg(
                F.avg("value").alias("v_average"),
                F.sum("value").alias("v_sum"),
                F.max_by("value", "slot").alias("v_last"),
                F.max("value").alias("v_max"),
                F.min("value").alias("v_min"),
                F.count("value").alias("known"),
            )
            .where(F.col("known") / F.col("ratio") >= F.col("xff"))
        )
        value = (
            F.when(F.col("method") == "sum", F.col("v_sum"))
            .when(F.col("method") == "last", F.col("v_last"))
            .when(F.col("method") == "max", F.col("v_max"))
            .when(F.col("method") == "min", F.col("v_min"))
            .otherwise(F.col("v_average"))
        )
        cur = agged.select(
            "path", "spec_id", "method", "xff",
            F.col("lslot").alias("slot"), value.alias("value"),
        )

    slots = cur.select("path", "slot", "value")

    # -- dense grids per spec: generated (range+sequence), never a scan --
    grid: DataFrame | None = None
    for spec_id, spec_paths, from_c, until_c, routed, chain in specs:
        g = (
            spark.createDataFrame([(p,) for p in spec_paths], "path string")
            .crossJoin(time_grid(spark, from_c, until_c, routed))
            .withColumn("step", F.lit(routed))
        )
        grid = g if grid is None else grid.unionByName(g)
    return grid.join(F.broadcast(slots), ["path", "slot"], "left").select(
        "path", "slot", "value", "step"
    )
