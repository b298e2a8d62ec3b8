"""Adapter: the driver's `events` table → Whisper-style datapoints.

Maps the fixture's entity/time/value columns onto the reference's metric
model (TESTDATA.md / FIXTURES.md §7): one dot-hierarchical series path per
(event_type, user bucket), epoch-second timestamps, double values —
mirroring `series()` path construction (`/root/reference/L_DataWatcher.lua:72-73`).

Scale note: this is a narrow projection — no shuffle, fully
whole-stage-codegen'd, and the `path` expression is computed from columns
that survive predicate pushdown (filters on event_type/user_id reach the
parquet scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.io import epoch_us_col, load_table

#: number of user buckets folded into the series path (50 series at 5 types)
USER_BUCKETS = 10


def datapoints_from_events(
    spark: SparkSession, sf_dir: str, per_user: bool = True
) -> DataFrame:
    """Return (path, ts_sec, ts_us, value) datapoints from the events table.

    per_user=True → path = events.<event_type>.u<user_id % 10>  (~50 series)
    per_user=False → path = events.<event_type>                  (5 series)

    ts_us (epoch microseconds) is retained as the arrival-order key for
    last-write-wins slot semantics (`L_DataWhisper.lua:346-354`): within one
    quantized slot the latest write's value is the slot value.
    """
    events = load_table(spark, sf_dir, "events")
    if per_user:
        path = F.concat(
            F.lit("events."),
            F.col("event_type"),
            F.lit(".u"),
            (F.col("user_id") % USER_BUCKETS).cast("string"),
        )
    else:
        path = F.concat(F.lit("events."), F.col("event_type"))
    return events.select(
        path.alias("path"),
        F.col("ts_sec"),
        epoch_us_col(events, "ts").alias("ts_us"),
        F.col("value"),
    )


#: the equivalent DuckDB SQL fragment for the same datapoints relation —
#: kept adjacent to the Spark expression so the two stay in lock-step.
DATAPOINTS_ORACLE_PER_USER = (
    "SELECT 'events.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR) AS path, "
    "epoch_us(ts) // 1000000 AS ts_sec, epoch_us(ts) AS ts_us, value FROM events"
)
DATAPOINTS_ORACLE_PER_TYPE = (
    "SELECT 'events.' || event_type AS path, "
    "epoch_us(ts) // 1000000 AS ts_sec, epoch_us(ts) AS ts_us, value FROM events"
)
