"""applyInPandasWithState LOCF gap-fill across micro-batches."""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from datayours_spark.streaming.stateful import locf_fill_stream

TMP = Path(__file__).resolve().parent / "_tmp" / "stateful"


@pytest.fixture()
def in_dir():
    shutil.rmtree(TMP, ignore_errors=True)
    (TMP / "in").mkdir(parents=True)
    yield TMP / "in"
    shutil.rmtree(TMP, ignore_errors=True)


def _run(spark, in_dir, table: str):
    lines = (
        spark.readStream.schema("path string, ts_sec bigint, value double")
        .option("maxFilesPerTrigger", 1)  # one micro-batch per dropped file
        .csv(str(in_dir))
    )
    q = (
        locf_fill_stream(lines, step=60)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["path"], r["slot"]): (r["value"], r["filled"])
        for r in spark.table(table).collect()
    }


def test_gap_fill_within_and_across_batches(spark, in_dir):
    # batch 1: slots 0 and 180 (gap at 60, 120); batch 2: slot 360
    # (cross-batch gap at 240, 300 must fill from carried state)
    (in_dir / "a_batch1.csv").write_text("s.x,10,1.0\ns.x,185,4.0\n")
    (in_dir / "b_batch2.csv").write_text("s.x,365,9.0\n")
    got = _run(spark, in_dir, "locf_fill_t1")
    assert got == {
        ("s.x", 0): (1.0, False),
        ("s.x", 60): (1.0, True),
        ("s.x", 120): (1.0, True),
        ("s.x", 180): (4.0, False),
        ("s.x", 240): (4.0, True),
        ("s.x", 300): (4.0, True),
        ("s.x", 360): (9.0, False),
    }


def test_independent_series_state(spark, in_dir):
    (in_dir / "a.csv").write_text("s.a,10,1.0\ns.b,130,7.0\n")
    (in_dir / "b.csv").write_text("s.a,130,2.0\n")
    got = _run(spark, in_dir, "locf_fill_t2")
    assert got[("s.a", 0)] == (1.0, False)
    assert got[("s.a", 60)] == (1.0, True)
    assert got[("s.a", 120)] == (2.0, False)
    assert got[("s.b", 120)] == (7.0, False)
    assert ("s.b", 0) not in got  # series b starts at its first observation
