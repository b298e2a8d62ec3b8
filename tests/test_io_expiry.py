"""Retention expiry: date-partition drops + fetch clamp interplay (T7)."""

from __future__ import annotations

import os
from pathlib import Path

from datayours_spark.io import expire_retention, read_datapoints, write_datapoints
from datayours_spark.operators.fetch import fetch_grid

TMP = str(Path(__file__).parent / "_tmp" / "expiry_datapoints")

DAY = 86_400
T0 = 1_704_067_200  # 2024-01-01


def test_expire_drops_only_whole_old_partitions(spark, make_datapoints):
    rows = [("a.b", T0 + d * DAY + 60, float(d)) for d in range(6)]
    write_datapoints(make_datapoints(rows), TMP)

    now = T0 + 5 * DAY + 120  # during 2024-01-06
    dropped = expire_retention(TMP, max_retention=3 * DAY, now=now)
    # cutoff instant is inside 2024-01-03 → 01 and 02 drop, 03 (mixed) stays
    assert dropped == ["date=2024-01-01", "date=2024-01-02"]
    left = sorted(e for e in os.listdir(TMP) if e.startswith("date="))
    assert left == [f"date=2024-01-0{d}" for d in (3, 4, 5, 6)]

    # fetch-side clamp hides the not-yet-dropped tail of the boundary day
    stored = read_datapoints(spark, TMP)
    grid = fetch_grid(
        spark, stored, "a.b", T0, now, 86_400, now=now, oldest=now - 3 * DAY
    )
    vals = [r["value"] for r in grid.collect()]
    assert vals == [2.0, 3.0, 4.0, 5.0]


def test_compaction_keeps_lww_winners(spark, make_datapoints):
    from datayours_spark.io import compact_datapoints

    tmp = TMP + "_compact"
    # three writes to one slot (arrival order = ts_us order from the fixture)
    rows = [("a.b", T0 + 5, 1.0), ("a.b", T0 + 5, 2.0), ("a.b", T0 + 5, 3.0),
            ("a.c", T0 + DAY, 7.0)]
    dp = make_datapoints(rows)
    write_datapoints(dp, tmp)
    # append a second batch: later arrival overwrites the same second
    import pyspark.sql.functions as F

    later = dp.where("path = 'a.b'").withColumn(
        "value", F.lit(9.0)
    ).withColumn("ts_us", F.col("ts_us") + 1_000_000)
    (later.withColumn("date", F.to_date(F.timestamp_seconds("ts_sec")))
        .write.mode("append").partitionBy("date").parquet(tmp))

    assert spark.read.parquet(tmp).count() == 7
    n = compact_datapoints(spark, tmp)
    assert n == 2  # one winner per (path, second)
    got = {(r["path"], r["ts_sec"]): r["value"]
           for r in spark.read.parquet(tmp).collect()}
    assert got == {("a.b", T0 + 5): 9.0, ("a.c", T0 + DAY): 7.0}

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_orders_by_batch_seq_past_the_cap(spark):
    """Streaming-written tables carry batch_seq; compaction must pick the
    within-second winner by the UNCAPPED epoch even when both writes'
    ts_us tie at the 999_999 addend cap, and keep the batch_seq column so
    later reads keep the same ordering information."""
    import shutil

    import pyspark.sql.functions as F

    from datayours_spark.io import compact_datapoints

    tmp = TMP + "_compact_seq"
    shutil.rmtree(tmp, ignore_errors=True)
    t = T0 + 5
    capped = t * 1_000_000 + 999_999
    rows = [
        # same second, both beyond the cap: ts_us tie, batch_seq decides
        ("a.b", t, capped, 1_200_000, 1.0),
        ("a.b", t, capped, 1_500_000, 2.0),
        # second series, single write
        ("a.c", t, capped, 1_200_000, 7.0),
    ]
    (
        spark.createDataFrame(
            rows,
            "path string, ts_sec bigint, ts_us bigint, batch_seq bigint, "
            "value double",
        )
        .withColumn("date", F.to_date(F.timestamp_seconds("ts_sec")))
        .write.partitionBy("date")
        .parquet(tmp)
    )
    n = compact_datapoints(spark, tmp)
    assert n == 2
    got = {
        (r["path"], r["ts_sec"]): (r["value"], r["batch_seq"])
        for r in spark.read.parquet(tmp).collect()
    }
    assert got[("a.b", t)] == (2.0, 1_500_000)  # later epoch won the tie
    assert got[("a.c", t)] == (7.0, 1_200_000)
    shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_swap_leaves_no_debris_and_recovers(spark, make_datapoints):
    """The rename-aside swap: after a successful compaction neither the
    .compacting scratch nor the .old backup remains, and a leftover .old
    from a previous crash is cleared on the next run."""
    import os

    from datayours_spark.io import compact_datapoints

    tmp = TMP + "_swapsafe"
    write_datapoints(make_datapoints([("a.b", T0 + 5, 1.0)]), tmp)
    # simulate debris from a crashed earlier run
    os.makedirs(tmp + ".old", exist_ok=True)
    with open(tmp + ".old/marker", "w") as f:
        f.write("stale")
    compact_datapoints(spark, tmp)
    assert not os.path.exists(tmp + ".old")
    assert not os.path.exists(tmp + ".compacting")
    assert spark.read.parquet(tmp).count() == 1


def test_compaction_mixed_legacy_rows_without_batch_seq(spark):
    """Upgrade hazard (round-3 ADVICE): files written before batch_seq
    existed read as NULL in a mixed table.  Compaction must never let a
    NULL ordering key win (or return NULL for legacy-only groups): legacy
    rows order below any real batch, and among themselves by ts_us."""
    import shutil

    import pyspark.sql.functions as F

    from datayours_spark.io import compact_datapoints

    tmp = TMP + "_compact_legacy"
    shutil.rmtree(tmp, ignore_errors=True)
    t = T0 + 5
    # legacy file: no batch_seq column at all
    legacy = spark.createDataFrame(
        [
            ("a.b", t, t * 1_000_000 + 1, 1.0),
            ("a.b", t, t * 1_000_000 + 2, 2.0),  # later legacy arrival
            ("old.only", t, t * 1_000_000 + 1, 5.0),
        ],
        "path string, ts_sec bigint, ts_us bigint, value double",
    ).withColumn("date", F.to_date(F.timestamp_seconds("ts_sec")))
    legacy.write.partitionBy("date").parquet(tmp)
    # new streaming file: batch_seq present; overwrites a.b
    new = spark.createDataFrame(
        [("a.b", t, t * 1_000_000 + 0, 3, 9.0)],
        "path string, ts_sec bigint, ts_us bigint, batch_seq bigint, "
        "value double",
    ).withColumn("date", F.to_date(F.timestamp_seconds("ts_sec")))
    new.write.mode("append").partitionBy("date").parquet(tmp)

    n = compact_datapoints(spark, tmp)
    assert n == 2
    got = {
        (r["path"], r["ts_sec"]): r["value"]
        for r in spark.read.parquet(tmp).collect()
    }
    # the real batch (batch_seq=3) beats every legacy row even though its
    # ts_us is OLDER; the legacy-only group resolves by ts_us, not NULL
    assert got[("a.b", t)] == 9.0
    assert got[("old.only", t)] == 5.0
    shutil.rmtree(tmp, ignore_errors=True)
