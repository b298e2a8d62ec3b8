"""Streaming near-dup maintenance: per-batch emissions == full recompute."""

import shutil
from pathlib import Path

from datayours_spark.functions.dedup import minhash_dedup
from datayours_spark.streaming.dedupstream import DedupStream

TMP = Path(__file__).resolve().parent / "_tmp" / "dedupstream"

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    (1, BASE + " one"),       # near-dup family: 1, 2, 10, 11
    (2, BASE + " two"),
    (3, "unrelated words entirely distinct content here now"),
    (10, BASE + " ten"),
    (11, BASE + " eleven"),
    (20, "another island of totally different tokens altogether"),
]


class TestDedupStream:
    def test_stream_matches_full_recompute(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ds = DedupStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
        )
        all_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")

        def drop(name: str, rows: list[tuple[int, str]]) -> None:
            # single parquet FILE (the file stream source does not recurse
            # into nested directories)
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                }
            )
            pq.write_table(t, str(TMP / "in" / name))

        # batch 1: docs 1-3 (one in-batch pair: 1-2)
        drop("b1.parquet", [d for d in DOCS if d[0] < 10])
        q = ds.start()
        q.processAllAvailable()
        batch1 = {(r["id1"], r["id2"]) for r in ds.pairs().collect()}
        assert batch1 == {(1, 2)}

        # batch 2: docs 10, 11, 20 — introduces new×old AND new×new pairs
        drop("b2.parquet", [d for d in DOCS if d[0] >= 10])
        q.processAllAvailable()
        q.stop()

        got = {
            (r["id1"], r["id2"]): r["jaccard"] for r in ds.pairs().collect()
        }
        want = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in minhash_dedup(all_docs).collect()
        }
        # the union of per-batch emissions is EXACTLY the full recompute,
        # with each pair emitted once by the batch that completed it
        assert got == want
        assert len(got) == len(ds.pairs().collect())  # no duplicate rows
        assert any(a < 10 <= b for a, b in got)       # new×old pairs exist
        assert (10, 11) in got                        # new×new pair exists

        # restart from the checkpoint: processed drops are NOT re-emitted
        # (exactly-once), and a post-restart drop still pairs against the
        # standing index
        q2 = ds.start()
        q2.processAllAvailable()
        assert len(ds.pairs().collect()) == len(got)  # no re-emission
        drop("b3.parquet", [(30, BASE + " thirty")])
        q2.processAllAvailable()
        q2.stop()
        after = {(r["id1"], r["id2"]) for r in ds.pairs().collect()}
        assert (1, 30) in after and (11, 30) in after  # joined the family
        shutil.rmtree(TMP, ignore_errors=True)

    def test_foreachbatch_replay_is_idempotent(self, spark):
        """foreachBatch is at-least-once: a crash between the sink writes
        and the checkpoint commit replays the batch.  Replays must not
        duplicate pairs or double the index/corpus (ADVICE regression)."""
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ds = DedupStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
        )

        def counts():
            return (
                len(ds.pairs().collect()),
                ds._read_or_empty("index", "doc_id bigint, band int, bh string").count(),
                ds._read_or_empty("corpus", "doc_id bigint, text string").count(),
            )

        b0 = spark.createDataFrame(
            [d for d in DOCS if d[0] < 10], "doc_id bigint, text string"
        )
        ds._process(b0, 0)
        first = counts()
        assert first[0] == 1  # the (1, 2) pair

        # full replay of a committed batch: a strict no-op
        ds._process(b0, 0)
        assert counts() == first

        # partial-commit replay: simulate a crash after the pairs write by
        # deleting the index/corpus markers, then replay — converges to the
        # same state, no duplicated pairs, no self-join through a
        # half-written index
        import os

        for name in ("index", "corpus"):
            os.remove(TMP / "store" / name / "batch-000000000000" / "_SUCCESS")
        ds._process(b0, 0)
        assert counts() == first

        # the next batch still sees exactly one standing copy
        b1 = spark.createDataFrame(
            [d for d in DOCS if d[0] >= 10], "doc_id bigint, text string"
        )
        ds._process(b1, 1)
        got = {(r["id1"], r["id2"]) for r in ds.pairs().collect()}
        from datayours_spark.functions.dedup import minhash_dedup

        all_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
        want = {(r["id1"], r["id2"]) for r in minhash_dedup(all_docs).collect()}
        assert got == want
        shutil.rmtree(TMP, ignore_errors=True)
