"""Polling sources + fan-out sink (S4/S5/F15, L_DataWatcher/L_DataDaemon)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from datayours_spark.streaming.daemons import (
    fanout_sink,
    polling_source,
    scrape_meminfo,
    watts_to_kwh_per_min,
)

TMP = Path(__file__).resolve().parent / "_tmp" / "daemons"


@pytest.fixture()
def tmp_dir():
    shutil.rmtree(TMP, ignore_errors=True)
    TMP.mkdir(parents=True)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


def test_meminfo_scrape_derivations():
    rows = dict_rows = {p: v for p, v in scrape_meminfo()(0)}
    if not rows:
        pytest.skip("/proc/meminfo unavailable")
    assert rows["sys.memory.MemUsed"] == (
        rows["sys.memory.MemTotal"] - rows["sys.memory.MemFree"]
    )
    assert rows["sys.memory.MemAvail"] == (
        rows["sys.memory.Cached"] + rows["sys.memory.MemFree"]
    )


def test_watts_conversion():
    assert watts_to_kwh_per_min(60_000.0) == 1.0
    assert watts_to_kwh_per_min(250.0) == pytest.approx(250 / 60_000)


def test_polling_source_emits_scraped_records(spark, tmp_dir):
    fake = lambda ts: [("m.a", 1.5), ("m.b", float(ts % 7))]  # noqa: E731
    stream = polling_source(spark, fake, interval_sec=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("poll_t1")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        deadline = time.time() + 20
        while time.time() < deadline and spark.table("poll_t1").count() < 2:
            q.processAllAvailable()
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table("poll_t1").collect()
    assert len(rows) >= 2
    by_path = {r["path"] for r in rows}
    assert by_path == {"m.a", "m.b"}
    assert all(r["ts_sec"] > 0 for r in rows)


def test_fanout_writes_every_destination(spark, tmp_dir):
    (tmp_dir / "in").mkdir()
    (tmp_dir / "in" / "one.csv").write_text("s.a,10,1.0\ns.b,20,2.0\n")
    records = (
        spark.readStream.schema("path string, ts_sec bigint, value double")
        .csv(str(tmp_dir / "in"))
    )
    dests = [str(tmp_dir / "dest1"), str(tmp_dir / "dest2")]
    q = fanout_sink(records, dests, str(tmp_dir / "ckpt"))
    q.processAllAvailable()
    q.stop()
    for d in dests:
        got = {
            (r["path"], r["ts_sec"], r["value"])
            for r in spark.read.parquet(d).collect()
        }
        assert got == {("s.a", 10, 1.0), ("s.b", 20, 2.0)}
