"""Streaming quality gating: per-batch emissions == the batch operator,
running report folds without a corpus rescan, replay is a no-op."""

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from datayours_spark.functions.text import gopher_rules
from datayours_spark.streaming.qualitystream import QualityStream

TMP = Path(__file__).resolve().parent / "_tmp" / "qualitystream"

GOOD = " ".join(
    "the be to of and that have with word" + str(i % 7) for i in range(8)
)  # 72 words, stopword-rich, alphabetic -> passes all gates (min_words=50)
BAD = "# # # # #"  # too short, symbol-heavy -> fails
DOCS = [
    (1, GOOD, "srcA"),
    (2, BAD, "srcA"),
    (3, GOOD + " extra tail tokens", "srcB"),
    (4, GOOD, "srcB"),
    (5, BAD, "srcB"),
    (6, GOOD, "srcC"),
]
SCHEMA = "doc_id bigint, text string, source string"


class TestQualityStream:
    def test_stream_matches_batch_operator(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        qs = QualityStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            compact_every=1,            # force compaction every batch
        )
        batches = [DOCS[:2], DOCS[2:5], DOCS[5:]]
        for i, rows in enumerate(batches):
            qs._process(spark.createDataFrame(rows, SCHEMA), i)

        # union of per-batch gate rows == the batch operator on the corpus
        got = {r.doc_id: r.asDict() for r in qs.gates().collect()}
        want = {
            r.doc_id: r.asDict()
            for r in gopher_rules(
                spark.createDataFrame(DOCS, SCHEMA), carry_cols=("source",)
            ).collect()
        }
        assert got == want
        assert got[1]["pass_all"] and not got[2]["pass_all"]

        # the running report equals the corpus aggregate and reads ONLY
        # the sources x batches tally rows
        rep = {r.source: (r.n_docs, r.n_pass, r.pass_rate)
               for r in qs.report().collect()}
        assert rep["srcA"] == (2, 1, 0.5)
        assert rep["srcB"] == (3, 2, 0.6667)
        assert rep["srcC"] == (1, 1, 1.0)

        # compaction forced every batch: one folded dir per table
        import os

        for name in ("gates", "tallies"):
            subs = sorted(os.listdir(TMP / "store" / name))
            assert subs == ["compacted-000000000002"], (name, subs)

        # replay of a committed/folded batch is a no-op
        n = qs.gates().count()
        qs._process(spark.createDataFrame(batches[0], SCHEMA), 0)
        assert qs.gates().count() == n
        shutil.rmtree(TMP, ignore_errors=True)

    def test_real_stream_end_to_end(self, spark):
        """Drive the actual readStream/foreachBatch path once."""
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        spark.createDataFrame(DOCS, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(TMP / "in"))
        qs = QualityStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
        )
        q = qs.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert qs.gates().count() == len(DOCS)
        total = qs.report().agg(F.sum("n_docs")).first()[0]
        assert total == len(DOCS)
        shutil.rmtree(TMP, ignore_errors=True)
