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


class TestHeavyHitters:
    def _run(self, spark, in_dir, table, capacity=3, shards=2):
        from datayours_spark.streaming.stateful import heavy_hitters_stream

        lines = (
            spark.readStream.schema("token string")
            .option("maxFilesPerTrigger", 1)
            .csv(str(in_dir))
            .withColumn(
                "shard",
                F.pmod(F.xxhash64("token"), F.lit(shards)).cast("int"),
            )
        )
        q = (
            heavy_hitters_stream(lines, capacity=capacity, shards=shards)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update semantics: keep the LAST emission per (shard, token)
        import collections

        latest = collections.OrderedDict()
        for r in spark.table(table).collect():
            latest[(r["shard"], r["token"])] = (r["est_count"], r["max_err"])
        return latest

    def test_space_saving_bounds_across_batches(self, spark, in_dir):
        # hot token appears 7x across two batches; long tail forces
        # evictions within the bounded summary
        (in_dir / "a1.csv").write_text("hot\nhot\nhot\nr1\nr2\nr3\n")
        (in_dir / "b2.csv").write_text("hot\nhot\nhot\nhot\nr4\nr5\nr6\n")
        got = self._run(spark, in_dir, "hh_t1", capacity=3, shards=2)
        hot = [(k, v) for k, v in got.items() if k[1] == "hot"]
        assert len(hot) == 1
        (_, tok), (est, err) = hot[0]
        # space-saving guarantee: est - err <= true (7) <= est
        assert est - err <= 7 <= est
        # per-shard summaries never exceed capacity in any emission
        import collections

        per_shard = collections.Counter(shard for (shard, _t) in got)
        # final summaries respect the bound (latest rows per shard)
        for shard, n in per_shard.items():
            assert n <= 3 + 3  # tokens seen across emissions, bounded small

    def test_state_bounded_per_shard(self, spark, in_dir):
        (in_dir / "a1.csv").write_text("\n".join(f"t{i}" for i in range(40)))
        got = self._run(spark, in_dir, "hh_t2", capacity=4, shards=2)
        # one batch: each shard's emission is its current summary,
        # at most `capacity` rows
        import collections

        per_shard = collections.Counter(shard for (shard, _t) in got)
        assert all(n <= 4 for n in per_shard.values())

    def test_state_survives_query_restart(self, spark, in_dir):
        """GroupState must recover from the checkpoint: a second query
        started on the same checkpoint continues the counts, it does not
        restart them."""
        from datayours_spark.streaming.stateful import heavy_hitters_stream

        ckpt = str(TMP / "ckpt")

        def run_once(table):
            # memory sink cannot recover a checkpoint and file sinks
            # cannot take update mode — foreachBatch is the
            # restart-capable sink for stateful update queries
            rows: list = []

            def sink(batch_df, _epoch):
                rows.extend(batch_df.collect())

            lines = (
                spark.readStream.schema("token string")
                .option("maxFilesPerTrigger", 1)
                .csv(str(in_dir))
                .withColumn(
                    "shard", F.pmod(F.xxhash64("token"), F.lit(2)).cast("int")
                )
            )
            q = (
                heavy_hitters_stream(lines, capacity=4, shards=2)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                (r["shard"], r["token"]): r["est_count"] for r in rows
            }

        (in_dir / "a1.csv").write_text("hot\nhot\nhot\n")
        first = run_once("hh_restart_1")
        assert [v for (s, t), v in first.items() if t == "hot"] == [3]
        # restart on the same checkpoint with MORE data: counts continue
        (in_dir / "b2.csv").write_text("hot\nhot\n")
        second = run_once("hh_restart_2")
        assert [v for (s, t), v in second.items() if t == "hot"] == [5]
