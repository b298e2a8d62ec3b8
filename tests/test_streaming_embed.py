"""Streaming embedding near-dup maintenance: per-batch emissions ==
full recompute (the EmbedStream analogue of test_streaming_dedup)."""

import shutil
from pathlib import Path

from datayours_spark.functions.similarity import cosine_neardup
from datayours_spark.streaming.embedstream import EmbedStream

TMP = Path(__file__).resolve().parent / "_tmp" / "embedstream"

FAM = [1.0, 2.0, 3.0, 4.0]
VECS = [
    (1, FAM),                      # identical family: 1, 2, 10, 30
    (2, FAM),
    (3, [4.0, -3.0, 2.0, -1.0]),   # unrelated
    (10, FAM),
    (11, [1.0, 2.0, 3.0, 4.2]),    # near the family
    (20, [-1.0, -2.0, -3.0, -4.0]),
]
KW = dict(n_planes=4, threshold=0.9, dim=4)


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


class TestEmbedStream:
    def test_stream_matches_full_recompute(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        es = EmbedStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            **KW,
        )
        all_vecs = spark.createDataFrame(
            VECS, "vec_id bigint, embedding array<double>"
        )

        _drop("b1.parquet", [v for v in VECS if v[0] < 10])
        q = es.start()
        q.processAllAvailable()
        batch1 = {(r["id1"], r["id2"]) for r in es.pairs().collect()}
        assert batch1 == {(1, 2)}

        _drop("b2.parquet", [v for v in VECS if v[0] >= 10])
        q.processAllAvailable()
        q.stop()

        got = {
            (r["id1"], r["id2"]): r["sim"] for r in es.pairs().collect()
        }
        want = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(all_vecs, **KW).collect()
        }
        # union of per-batch emissions == full recompute, each pair once
        assert got == want
        assert len(got) == len(es.pairs().collect())
        assert (1, 10) in got and got[(1, 10)] == 1.0  # new×old identical
        assert (10, 11) in got                         # new×new pair

        # restart from the checkpoint: no re-emission; a post-restart drop
        # still pairs against the standing index — including the
        # cross-batch identical case (30 == FAM, indexed under two
        # different reps by now: exactness must survive non-maximal groups)
        q2 = es.start()
        q2.processAllAvailable()
        assert len(es.pairs().collect()) == len(got)
        _drop("b3.parquet", [(30, FAM)])
        q2.processAllAvailable()
        q2.stop()
        after = {
            (r["id1"], r["id2"]): r["sim"] for r in es.pairs().collect()
        }
        full = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(
                all_vecs.unionByName(
                    spark.createDataFrame(
                        [(30, FAM)], "vec_id bigint, embedding array<double>"
                    )
                ),
                **KW,
            ).collect()
        }
        assert after == full
        assert (1, 30) in after and (10, 30) in after
        shutil.rmtree(TMP, ignore_errors=True)

    def test_foreachbatch_replay_is_idempotent(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        es = EmbedStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            **KW,
        )

        def counts():
            from datayours_spark.streaming.embedstream import (
                MEMBERS_SCHEMA,
                REPS_SCHEMA,
            )

            return (
                len(es.pairs().collect()),
                es._read_or_empty("members", MEMBERS_SCHEMA).count(),
                es._read_or_empty("reps", REPS_SCHEMA).count(),
            )

        b0 = spark.createDataFrame(
            [v for v in VECS if v[0] < 10],
            "vec_id bigint, embedding array<double>",
        )
        es._process(b0, 0)
        first = counts()
        assert first[0] == 1  # the (1, 2) pair
        assert first[1] == 3 and first[2] == 2  # 3 members, 2 distinct reps

        # full replay of a committed batch: a strict no-op
        es._process(b0, 0)
        assert counts() == first

        # partial-commit replay: crash after the pairs write — replay
        # converges, no duplicate pairs, no self-join through the
        # half-written index
        import os

        for name in ("members", "reps"):
            os.remove(TMP / "store" / name / "batch-000000000000" / "_SUCCESS")
        es._process(b0, 0)
        assert counts() == first
        shutil.rmtree(TMP, ignore_errors=True)
