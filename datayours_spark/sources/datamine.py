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
    (pos, channel_id, name, data_offset, filter_enable, filter_min,
    filter_max[, device, service, variable]).

    ``pos`` is the array position — the reference's index order, which
    breaks ties when a search key matches several channels (``found[1]``,
    `L_DataBaseDM.lua:362-365`). The Luup coordinates (Device/Service/
    Variable) are carried when present in the JSON.
    """
    raw = spark.read.option("multiLine", "true").json(f"{db_dir}/dataMineConfig.json")
    vars_df = raw.select(F.posexplode("Variables").alias("pos", "v"))
    cols = [
        F.col("pos"),
        F.col("v.Id").cast("int").alias("channel_id"),
        F.col("v.Name").alias("name"),
        F.coalesce(F.col("v.DataOffset"), F.lit(0.0)).cast("double").alias("data_offset"),
        F.coalesce(F.col("v.FilterEnable"), F.lit(0)).cast("int").alias("filter_enable"),
        F.col("v.Filterminimum").cast("double").alias("filter_min"),
        F.col("v.FilterMaximum").cast("double").alias("filter_max"),
    ]
    fields = {f.name for f in vars_df.schema["v"].dataType.fields}
    for src, out in (("Device", "device"), ("Service", "service"), ("Variable", "variable")):
        if src in fields:
            cols.append(F.col(f"v.{src}").alias(out))
    return vars_df.select(*cols)


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


# --- dmDB CLI (`lr_dmDB`) -------------------------------------------------
#
# The reference's HTTP command-line surface over dataMine
# (`/root/reference/L_DataMineServer.lua:502-591`): parameter groups
# times (t1/t2/dt), searchKeys (Device/Service/Variable/Id/Name), and
# format (csv | iso | Table | LineChart | AreaChart).

#: dt durations (`L_DataMineServer.lua:503-504`) — NOTE month=31d here,
#: unlike the Graphite relative-time parse where mon=30d (F1).
DT_SECONDS = {"day": 86_400, "week": 7 * 86_400, "month": 31 * 86_400, "year": 365 * 86_400}

#: CLI alias → canonical name, from the cli.parameter spec
#: (`L_DataMineServer.lua:572-591`).
_TIME_ALIASES = {"t1": "t1", "start": "t1", "from": "t1",
                 "t2": "t2", "stop": "t2", "to": "t2", "until": "t2",
                 "dt": "dt", "interval": "dt"}
_KEY_ALIASES = {"devicenum": "device", "serviceid": "service",
                "variable": "variable", "channel": "channel_id", "name": "name"}


def resolve_times(
    t1=None, t2=None, dt: str | None = None, now: int | None = None
) -> tuple[int | None, int | None]:
    """The handler's time-group resolution (`L_DataMineServer.lua:508-526`):
    t1/t2 parse as relative or ISO (unparseable t1 → now-24h, t2 → now);
    dt extends whichever endpoint is missing and is IGNORED when both are
    given; neither+dt → [now-dt, now]."""
    import time as _time

    from datayours_spark.kernel.timeparse import parse_time

    now = int(_time.time()) if now is None else now
    r1 = (parse_time(t1, now) or now - 86_400) if t1 is not None else None
    r2 = (parse_time(t2, now) or now) if t2 is not None else None
    if dt is not None:
        if dt not in DT_SECONDS:
            raise ValueError(f"bad dt '{dt}' (expected one of {sorted(DT_SECONDS)})")
        span = DT_SECONDS[dt]
        if r1 is not None and r2 is None:
            r2 = r1 + span
        elif r2 is not None and r1 is None:
            r1 = r2 - span
        elif r1 is None and r2 is None:
            r2 = now
            r1 = r2 - span
    return r1, r2


def dmdb_query(
    samples: DataFrame,
    config: DataFrame,
    params: dict,
    now: int | None = None,
    maxpoints: int = 10_080,
    graphs: DataFrame | None = None,
) -> str:
    """One dmDB CLI query → formatted report string
    (`L_DataMineServer.lua:502-567`).

    params uses the CLI names/aliases, e.g. ``{"channel": 2, "format":
    "iso", "start": "-1day"}``. Channel selection mirrors openCursor: a
    direct Id wins; otherwise the FIRST index entry matching the search
    keys (string keys by substring) — `L_DataBaseDM.lua:358-365`.

    The bounded (maxpoints-capped) rows are collected and formatted
    driver-side like every reference report; the scan itself stays a
    pruned Spark job. Output quirk kept: the reference concatenates lines
    plus a final lone ``"\\n"`` element with newline separators, so a
    non-empty report ends ``"\\n\\n"`` (`L_DataMineServer.lua:558-560`).
    """
    from datetime import datetime, timezone

    times = {}
    keys = {}
    options = {}
    actions = {}
    for name, value in params.items():
        name = name.lower()
        if name in _TIME_ALIASES:
            times[_TIME_ALIASES[name]] = value
        elif name in _KEY_ALIASES:
            keys[_KEY_ALIASES[name]] = value
        elif name in ("format", "width", "height"):
            options[name] = value
        elif name in ("report", "plot", "graph"):
            actions[name] = value

    t1, t2 = resolve_times(times.get("t1"), times.get("t2"), times.get("dt"), now)

    # report/plot/graph actions dispatch BEFORE cursor search
    # (`L_DataMineServer.lua:528-537`)
    if actions:
        from datayours_spark.render import dmreports

        spark = samples.sparkSession
        if graphs is None:
            graphs = dmreports.empty_graphs(spark)
        report = actions.get("report")
        if report == "channels":
            return dmreports.report_channels(config, options)
        if report == "timeline":
            return dmreports.report_timeline(samples, config, options)
        if report == "graphs":
            return dmreports.report_graphs(graphs, config, options)
        if report == "graphmap":
            return dmreports.report_graphmap(graphs, config, options)
        if report == "dataMine":
            return dmreports.report_datamine_map(config, options)
        # plot before graph, the reference's order (`:542-543`)
        if "plot" in actions:
            # plot=<channel Id> → LineChart through the normal cursor path
            keys = {"channel_id": int(actions["plot"])}
            options["format"] = "LineChart"
        elif "graph" in actions:
            return dmreports.graph_plot(
                spark, samples, config, graphs, int(actions["graph"]),
                t1=t1, now=now, options=options,
            )

    # openCursor: direct Id, else first search match in index order
    if "channel_id" in keys:
        channel = keys["channel_id"]
        info = {"Id": channel}
        picked = config.where(F.col("channel_id") == channel).limit(1).collect()
        if picked:
            info["Name"] = picked[0]["name"]
    else:
        picked = search_channels(config, **keys).orderBy("pos").limit(1).collect()
        if not picked:
            return "cursor key not found"
        channel = picked[0]["channel_id"]
        info = {"Id": channel, "Name": picked[0]["name"]}

    scan = samples.where(F.col("channel_id") == channel)
    if t1 is not None:
        scan = scan.where(F.col("ts_sec") >= t1)
    if t2 is not None:
        scan = scan.where(F.col("ts_sec") <= t2)
    rows = [
        (r["ts_sec"], r["value"])
        for r in scan.orderBy("ts_sec").limit(maxpoints).collect()
    ]

    fmt = options.get("format", "csv")
    if fmt == "csv":  # "%d,%g" (`L_DataMineServer.lua:553`)
        lines = ["%d,%g" % (t, v) for t, v in rows]
    elif fmt == "iso":  # "%s,%g" with ISO datetime (:555, ISOdateTime :102-104)
        lines = [
            "%s,%g" % (datetime.fromtimestamp(t, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S"), v)
            for t, v in rows
        ]
    elif fmt in ("Table", "LineChart", "AreaChart"):
        from datayours_spark.render.gviz import gviz_chart

        # title = channel info pairs (`L_DataMineServer.lua:427-431`);
        # deterministic key order where the reference's pairs() is unspecified
        title = ", ".join(f"{k}={info[k]}" for k in sorted(info))
        lines = [gviz_chart(rows, fmt, title, options)]
    else:
        raise ValueError(f"bad format '{fmt}'")
    return "\n".join(lines + ["\n"])
