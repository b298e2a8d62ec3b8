"""series_meta: per-series storage configuration, rule-assigned at scale.

Reproduces the creation-time schema assignment (`/root/reference/
L_DataCache.lua:142-162`): when a path is first seen, ordered regex rules
from storage-schemas.conf / storage-aggregation.conf are matched
first-match-wins to pick retentions, xFilesFactor, and aggregationMethod
(defaults `1h:7d`, 0.5, average — `L_DataCache.lua:55-58`).

Spark-first shape: the rule tables are tiny and driver-side (kernel.rules),
but the ASSIGNMENT runs distributed — the ordered rules compile into one
`when(rlike).otherwise` cascade evaluated JVM-side over the path catalog, so
registering a billion new series is a single narrow projection, not a
driver loop.  The resulting series_meta table is the broadcast side of every
per-series dispatch (rollup methods, xff gates, retention routing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datayours_spark.kernel.rules import (
    DEFAULT_AGGREGATION,
    DEFAULT_SCHEMA,
    RuleEngine,
)


def _cascade(rules, value_of, default) -> F.Column:
    """Ordered first-match-wins rules → when/otherwise column cascade."""
    col = None
    for rule in rules:
        if not rule.pattern:
            continue
        cond = F.col("path").rlike(rule.pattern)
        branch = F.lit(value_of(rule))
        col = F.when(cond, branch) if col is None else col.when(cond, branch)
    return F.lit(default) if col is None else col.otherwise(F.lit(default))


def assign_series_meta(catalog: DataFrame, engine: RuleEngine) -> DataFrame:
    """(path) catalog → (path, retentions, xff, method), rule-assigned.

    Patterns are unanchored regex searches, matching the reference's
    `string.find` semantics (`L_DataCache.lua:70-75`).
    """
    return catalog.select(
        "path",
        _cascade(
            engine.schemas, lambda r: r.retentions, DEFAULT_SCHEMA.retentions
        ).alias("retentions"),
        _cascade(
            engine.aggregations,
            lambda r: r.x_files_factor,
            DEFAULT_AGGREGATION.x_files_factor,
        ).alias("xff"),
        _cascade(
            engine.aggregations,
            lambda r: r.aggregation_method,
            DEFAULT_AGGREGATION.aggregation_method,
        ).alias("method"),
    )
