"""Canonical storage layout: date-partitioned parquet round-trip + pruning.

The 100 TB layout (SURVEY.md §1.8) replaces Whisper's per-series ring files
with parquet partitioned by date(ts), sorted by (path, ts_sec) within files.
These tests check (a) a fetch over the stored layout returns exactly what
the in-memory path returns, and (b) the physical plan prunes partitions and
pushes the path/ts filters into the scan.
"""

from __future__ import annotations

import contextlib
import io
import re
from pathlib import Path

from datayours_spark.io import read_datapoints, write_datapoints
from datayours_spark.operators.fetch import fetch_grid

TMP = str(Path(__file__).parent / "_tmp" / "layout_datapoints")

DAY = 86_400
T0 = 1_704_067_200  # 2024-01-01


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_fetch_matches_memory_fetch(spark, make_datapoints):
    rows = [
        ("a.b", T0 + d * DAY + h * 3_600, d * 100 + h)
        for d in range(5)
        for h in range(0, 24, 3)
    ] + [("a.c", T0 + 10, 1.0)]
    dp = make_datapoints(rows)
    write_datapoints(dp, TMP)
    stored = read_datapoints(spark, TMP)

    frm, until = T0 + DAY, T0 + 3 * DAY
    expect = fetch_grid(spark, dp, "a.b", frm, until, 3_600).collect()
    got = fetch_grid(spark, stored, "a.b", frm, until, 3_600).collect()
    assert got == expect
    assert len(got) == 2 * 24 + 1


def test_partitioned_fetch_prunes_and_pushes(spark, make_datapoints):
    rows = [("a.b", T0 + d * DAY, float(d)) for d in range(5)]
    write_datapoints(make_datapoints(rows), TMP)
    stored = read_datapoints(spark, TMP)
    plan = _plan(fetch_grid(spark, stored, "a.b", T0, T0 + DAY, 3_600))
    assert re.search(r"PartitionFilters: \[[^\]]*date#\d+ >=", plan)
    assert re.search(r"PartitionFilters: \[[^\]]*date#\d+ <=", plan)
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(path", plan)
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(ts_sec", plan)
