"""Downsample propagation (rollups) with the xFilesFactor gate.

Reproduces `propagate` (`/root/reference/L_DataWhisper.lua:469-491`):

- A lower-resolution slot aggregates the higher-resolution slots it covers
  (``lower_step / higher_step`` of them).
- The aggregate is emitted only if ``known / total_slots >= xFilesFactor``
  where `known` counts non-empty higher slots.
- Aggregation methods: average, sum, last, max, min over the KNOWN values,
  "last" meaning the latest-in-time slot's value (`L_DataWhisper.lua:205-215`).

Design difference vs the reference (SURVEY.md §2.3 A4): writes always land in
the raw table and every rollup level derives from the previous level's gated
output, rather than cascading archive-to-archive on each write.  Windows
re-aggregate the full covered range, so results match the reference's final
state in every case except one corner: when a LATER write's cascade aborts
at the xFF gate, the reference leaves the lower slot's PREVIOUS value in
place (stale), while this engine reports the re-aggregated current state
(absent until the gate passes again) — strictly fresher, never stale.

Scale notes:
- One hash aggregation per level, keyed (path, lower_slot): partial (map-side)
  aggregation halves the shuffle; with AQE the post-shuffle partition count
  adapts to the actual slot cardinality.
- `rollup_all_methods` computes all five aggregates in ONE pass and selects
  per-series via a broadcast-joined `series_meta` — one shuffle total instead
  of one per method group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datayours_spark.kernel.rules import _KNOWN_AGG_METHODS as AGG_METHODS


def _method_agg(method: str) -> F.Column:
    if method == "average":
        return F.avg("value")
    if method == "sum":
        return F.sum("value")
    if method == "last":
        return F.max_by("value", "slot")  # latest higher-res slot's value
    if method == "max":
        return F.max("value")
    if method == "min":
        return F.min("value")
    raise ValueError(f"Unrecognized aggregation method {method}")


def rollup(
    higher_slots: DataFrame,
    higher_step: int,
    lower_step: int,
    method: str = "average",
    xff: float = 0.5,
) -> DataFrame:
    """Aggregate (path, slot, value) at `higher_step` into `lower_step` slots.

    Output: (path, slot, value, known) filtered by the xFilesFactor gate
    ``known / (lower_step/higher_step) >= xff`` (`L_DataWhisper.lua:481-488`).
    """
    if lower_step % higher_step != 0:
        raise ValueError("lower_step must be a multiple of higher_step")
    slots_per_window = lower_step // higher_step
    out = (
        higher_slots.groupBy(
            "path",
            (F.col("slot") - (F.col("slot") % F.lit(lower_step))).alias("lslot"),
        )
        .agg(_method_agg(method).alias("value"), F.count("value").alias("known"))
        .where(F.col("known") / F.lit(slots_per_window) >= F.lit(xff))
    )
    return out.select(
        F.col("path"), F.col("lslot").cast("long").alias("slot"), "value", "known"
    )


def rollup_all_methods(
    higher_slots: DataFrame,
    higher_step: int,
    lower_step: int,
    series_meta: DataFrame,
    default_method: str = "average",
    default_xff: float = 0.5,
    methods: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Per-series aggregation-method dispatch in a single aggregation pass.

    `series_meta` is a small (path, method, xff) table — broadcast-joined.
    The needed aggregates are computed once; a CASE expression picks the
    series' configured method, and the xFF gate uses the series' xff
    (`L_DataCache.lua:146-160` rule assignment → `L_DataWhisper.lua:481-488`).

    `methods` is the caller's DRIVER-SIDE guarantee of which methods the
    meta table can assign (`RuleEngine.methods_used()` — conf knowledge,
    no pre-job): only those aggregate buffers are built.  A typical conf
    uses 2–3 of the 5 methods, and pruning drops the expensive `max_by`
    struct buffer whenever 'last' is unused (the r4→r5 q_rollup_routed
    bench recovery).  None keeps all five (correct for arbitrary meta).
    """
    wanted = set(AGG_METHODS if methods is None else methods)
    wanted.add(default_method)
    if methods is None:
        # only the tolerant (undeclared) path falls through to average;
        # a declared set keeps its raise_error fall-through, so adding
        # average here would both rebuild a pruned buffer and silently
        # exempt 'average' from the fail-loud contract (review finding)
        wanted.add("average")
    unknown = wanted - set(AGG_METHODS)
    if unknown:
        raise ValueError(f"Unrecognized aggregation methods {sorted(unknown)}")
    slots_per_window = lower_step // higher_step
    per_method = {
        "average": F.avg("value"),
        "sum": F.sum("value"),
        "last": F.max_by("value", "slot"),
        "max": F.max("value"),
        "min": F.min("value"),
    }
    aggregated = higher_slots.groupBy(
        "path",
        (F.col("slot") - (F.col("slot") % F.lit(lower_step))).alias("lslot"),
    ).agg(
        *[per_method[m].alias(f"v_{m}") for m in AGG_METHODS if m in wanted],
        F.count("value").alias("known"),
    )
    joined = aggregated.join(F.broadcast(series_meta), "path", "left").fillna(
        {"method": default_method, "xff": default_xff}
    )
    if methods is None:
        fallthrough = F.col("v_average")
        arms = sorted(wanted - {"average"})
    else:
        # the pruning contract is a caller guarantee — a meta row naming a
        # method outside it must fail loudly, not fall back to average.
        # The guard is the CASE's fall-through arm (free on the happy
        # path), not a separate per-row membership test.
        fallthrough = F.raise_error(
            F.concat(
                F.lit("series_meta method outside the declared set: "),
                F.col("method"),
            )
        ).cast("double")
        arms = sorted(wanted)
    value = fallthrough
    for m in arms:
        value = F.when(F.col("method") == m, F.col(f"v_{m}")).otherwise(value)
    return (
        joined.where(F.col("known") / F.lit(slots_per_window) >= F.col("xff"))
        .select(
            "path",
            F.col("lslot").cast("long").alias("slot"),
            value.alias("value"),
            "known",
            "method",
        )
    )


def carbon_aggregate(datapoints: DataFrame, rules) -> DataFrame:
    """A9 carbon-aggregator: cross-series aggregation rules
    (`aggregation-rules.conf.example:1-29`; documented but unimplemented in
    the reference, `L_DataCache.lua:121`).

    Each rule buffers matching series into `frequency`-second buckets under
    the substituted output path.  Output: (path, slot, value, n) per rule,
    unioned.  The rule list is tiny (driver-side); each rule is one
    hash aggregation with map-side combine — the match/rename are JVM-side
    regex column expressions.
    """
    from pyspark.sql import functions as F

    outs = []
    for rule in rules:
        regex, replacement = rule.compile()
        agg = F.sum("value") if rule.method == "sum" else F.avg("value")
        outs.append(
            datapoints.where(F.col("path").rlike(regex))
            .groupBy(
                F.regexp_replace("path", regex, replacement).alias("path"),
                (F.col("ts_sec").cast("long")
                 - F.col("ts_sec").cast("long") % rule.frequency).alias("slot"),
            )
            .agg(agg.alias("value"), F.count("*").alias("n"))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
