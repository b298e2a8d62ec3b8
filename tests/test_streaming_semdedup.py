"""Streaming SemDeDup: per-batch flag emissions == full recompute over
everything ingested (the SemdedupStream analogue of
test_streaming_embed), under a frozen quantizer."""

import shutil
from pathlib import Path

from datayours_spark.functions.similarity import kmeans_centroids, semdedup
from datayours_spark.streaming.semdedupstream import SemdedupStream

TMP = Path(__file__).resolve().parent / "_tmp" / "semdedupstream"

FAM = [1.0, 2.0, 3.0, 4.0]
ANTI = [-1.0, -2.0, -3.0, -4.0]
VECS = [
    (1, FAM),
    (2, [4.0, -3.0, 2.0, -1.0]),    # unrelated
    (3, ANTI),
    (10, FAM),                      # dup of 1 (cross-batch)
    (11, [1.0, 2.0, 3.0, 4.05]),    # near 1
    (12, ANTI),                     # dup of 3
    (20, FAM),                      # dup again, third batch
    (21, [9.0, 1.0, -9.0, 1.0]),    # unrelated
]
TAU = 0.99


def _drop(name: str, rows) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float64())
            ),
        }
    )
    pq.write_table(t, str(TMP / "in" / name))


class TestSemdedupStream:
    def _stream(self, spark, cent):
        return SemdedupStream(
            spark=spark,
            centroids=cent,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            tau=TAU,
        )

    def test_stream_matches_full_recompute(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        seed = spark.createDataFrame(
            [v for v in VECS if v[0] < 10],
            "vec_id bigint, embedding array<double>",
        )
        # the frozen quantizer: trained once on the first batch's shape
        cent = kmeans_centroids(seed, k=2, iters=2)
        ss = self._stream(spark, cent)

        _drop("b1.parquet", [v for v in VECS if v[0] < 10])
        q = ss.start()
        q.processAllAvailable()
        first = {r["vec_id"]: r["is_dup"] for r in ss.flags().collect()}
        assert set(first) == {1, 2, 3}
        assert not any(first.values())  # no dups within the seed

        _drop("b2.parquet", [v for v in VECS if 10 <= v[0] < 20])
        q.processAllAvailable()
        _drop("b3.parquet", [v for v in VECS if v[0] >= 20])
        q.processAllAvailable()
        q.stop()

        got = {
            (r["vec_id"], r["cluster"], r["is_dup"])
            for r in ss.flags().collect()
        }
        everything = spark.createDataFrame(
            VECS, "vec_id bigint, embedding array<double>"
        )
        want = {
            (r["vec_id"], r["cluster"], r["is_dup"])
            for r in semdedup(everything, cent, tau=TAU).collect()
        }
        assert got == want
        flags = {v: d for v, _, d in got}
        assert flags[10] and flags[12] and flags[20]  # cross-batch dups
        assert not flags[2] and not flags[21]

    def test_foreachbatch_replay_is_idempotent(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        seed = spark.createDataFrame(
            [v for v in VECS if v[0] < 10],
            "vec_id bigint, embedding array<double>",
        )
        cent = kmeans_centroids(seed, k=2, iters=2)
        ss = self._stream(spark, cent)

        def counts():
            from datayours_spark.streaming.semdedupstream import INDEX_SCHEMA

            return (
                sorted(
                    (r["vec_id"], r["is_dup"])
                    for r in ss.flags().collect()
                ),
                ss._read_or_empty("index", INDEX_SCHEMA).count(),
            )

        ss._process(seed, 0)
        first = counts()
        assert first[1] == 3

        # full replay of a committed batch: a strict no-op
        ss._process(seed, 0)
        assert counts() == first

        # partial-commit replay: crash after the flags write — replay
        # recomputes from the pre-batch index state and converges
        import os

        os.remove(TMP / "store" / "index" / "batch-000000000000" / "_SUCCESS")
        ss._process(seed, 0)
        assert counts() == first
        shutil.rmtree(TMP, ignore_errors=True)
