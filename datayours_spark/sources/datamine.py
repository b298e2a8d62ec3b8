"""dataMine-style federated source: irregular per-channel weekly CSV files.

Reproduces the read-only dataMine reader (`/root/reference/L_DataBaseDM.lua`):

- layout ``<db>/database/<channelId>/raw/<weeknum>.txt`` with ``time,value``
  rows (`L_DataBaseDM.lua:199-230`); sampling is event-driven (non-uniform).
- channel metadata in ``dataMineConfig.json`` → Variables array
  (`L_DataBaseDM.lua:163-177`) with per-channel DataOffset and
  Filter{Enable,minimum,Maximum} (`L_DataMineServer.lua:166-183`).
- query semantics: time-range scan capped at ``maxpoints``
  (`L_DataBaseDM.lua:74,313`), as-of resample (J2), value clamp (P4).

Scale notes: the ``<channel>/raw/<week>.txt`` layout IS a partitioning —
Spark's file listing + the week/channel columns parsed from the path give
partition pruning equivalent to the reference's directory-scan week pruning
(`L_DataBaseDM.lua:210-218`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

WEEK_SECONDS = 7 * 86_400  # dataMine week number = unix_time // week


def read_channels(spark: SparkSession, db_dir: str) -> DataFrame:
    """All channel samples: (channel_id, week, ts_sec, value).

    One csv read over the glob; channel and week derive from the file path
    (no per-file driver loop), so channel/week predicates prune files.
    """
    df = (
        spark.read.schema("ts_sec bigint, value double")
        .option("pathGlobFilter", "*.txt")
        .csv(f"{db_dir}/database/*/raw/*.txt")
        .withColumn("file", F.input_file_name())
    )
    return df.select(
        F.regexp_extract("file", r"/database/(\d+)/raw/", 1).cast("int").alias("channel_id"),
        F.regexp_extract("file", r"/raw/(\d+)\.txt$", 1).cast("int").alias("week"),
        "ts_sec",
        "value",
    )


def read_config(spark: SparkSession, db_dir: str) -> DataFrame:
    """Channel config from dataMineConfig.json's Variables array:
    (channel_id, name, data_offset, filter_enable, filter_min, filter_max)."""
    raw = spark.read.option("multiLine", "true").json(f"{db_dir}/dataMineConfig.json")
    vars_df = raw.select(F.explode("Variables").alias("v"))
    return vars_df.select(
        F.col("v.Id").cast("int").alias("channel_id"),
        F.col("v.Name").alias("name"),
        F.coalesce(F.col("v.DataOffset"), F.lit(0.0)).cast("double").alias("data_offset"),
        F.coalesce(F.col("v.FilterEnable"), F.lit(0)).cast("int").alias("filter_enable"),
        F.col("v.Filterminimum").cast("double").alias("filter_min"),
        F.col("v.FilterMaximum").cast("double").alias("filter_max"),
    )


def apply_channel_filters(samples: DataFrame, config: DataFrame) -> DataFrame:
    """P4: value + DataOffset, clamped to [min, max] when FilterEnable
    (`L_DataMineServer.lua:166-183`)."""
    joined = samples.join(F.broadcast(config), "channel_id", "left")
    shifted = F.col("value") + F.coalesce(F.col("data_offset"), F.lit(0.0))
    clamped = F.when(
        F.col("filter_enable") == 1,
        F.least(F.greatest(shifted, F.col("filter_min")), F.col("filter_max")),
    ).otherwise(shifted)
    return samples.select("channel_id", "week", "ts_sec").join(
        joined.select("channel_id", "ts_sec", clamped.alias("value")),
        ["channel_id", "ts_sec"],
    )


def range_scan(
    samples: DataFrame, t1: int, t2: int, maxpoints: int = 10_080
) -> DataFrame:
    """Ascending range scan capped at maxpoints per channel (O4,
    `L_DataBaseDM.lua:74,313`)."""
    w = Window.partitionBy("channel_id").orderBy("ts_sec")
    return (
        samples.where(F.col("ts_sec").between(t1, t2))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= maxpoints)
        .drop("rn")
    )


def asof_query(
    spark: SparkSession,
    samples: DataFrame,
    t1: int,
    t2: int,
    dt: int,
) -> DataFrame:
    """J2: resample irregular channels onto a regular grid with backward
    as-of lookup (`L_DataMineServer.lua:148-164`)."""
    from datayours_spark.operators.align import asof_resample

    renamed = samples.select(
        F.concat(F.lit("dm."), F.col("channel_id").cast("string")).alias("path"),
        "ts_sec",
        "value",
    )
    return asof_resample(spark, renamed, t1, t2, dt)


def search_channels(config: DataFrame, **criteria) -> DataFrame:
    """F17: dmDB.search — multi-criteria channel search where STRING
    criteria match by substring (plain find, not regex) and everything else
    matches exactly (`/root/reference/L_DataBaseDM.lua:82-99`)."""
    out = config
    for name, value in criteria.items():
        if isinstance(value, str):
            out = out.where(F.contains(F.col(name), F.lit(value)))
        else:
            out = out.where(F.col(name) == value)
    return out
