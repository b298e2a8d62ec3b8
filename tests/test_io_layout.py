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


class TestTrainingShardExport:
    def test_written_shards_are_balanced_and_partition_pruned(self, spark, tmp_path):
        import contextlib
        import io as _io

        from pyspark.sql import functions as F

        from datayours_spark.io import load_table, write_training_shards

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = str(tmp_path / "shards")
        manifest = write_training_shards(docs, out, n_shards=8)
        rows = {r["shard"]: r for r in manifest.collect()}
        assert set(rows) == set(range(8))
        # every doc landed exactly once
        total = spark.read.parquet(out)
        assert total.count() == docs.count()
        assert total.select("doc_id").distinct().count() == docs.count()
        # token balance: within #strata x stratum_width of each other
        # (shard_balance's documented bound), generous envelope here
        tok = [r["total_tokens"] for r in rows.values()]
        assert max(tok) - min(tok) <= max(tok) * 0.5 + 64
        # the layout IS the loader contract: one shard reads one partition
        one = spark.read.parquet(out).where(F.col("shard") == 3)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            one.explain("formatted")
        import re

        # the shard=3 EQUALITY must prune (not just a null filter)
        assert re.search(
            r"PartitionFilters: \[[^\]]*shard#\d+ = 3", buf.getvalue()
        )
