"""Streaming span maintenance: latest emissions == full recompute."""

import shutil
from pathlib import Path

from datayours_spark.functions.dedup import repeated_spans
from datayours_spark.streaming.spanstream import SpanStream

TMP = Path(__file__).resolve().parent / "_tmp" / "spanstream"

BOILER_A = " ".join(f"a{i}" for i in range(16))   # 16-token boilerplate
BOILER_B = " ".join(f"b{i}" for i in range(16))
DOCS = [
    # batch 1: 1 and 2 share BOILER_A -> both get a span immediately
    (1, BOILER_A + " tail one is here"),
    (2, "head two " + BOILER_A),
    # batch 2: 3 also carries BOILER_A (affects 1 and 2 too); 4 carries
    # BOILER_B which is UNIQUE so far -> no span for 4 yet
    (3, "three starts " + BOILER_A + " three ends"),
    (4, "four holds " + BOILER_B + " quietly"),
    # batch 3: 5 carries BOILER_B -> OLD doc 4 becomes affected and must
    # be re-emitted with its new span
    (5, BOILER_B + " five finish"),
]


def _drop(name: str, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
        }
    )
    pq.write_table(t, str(TMP / "in" / name))


class TestSpanStream:
    def test_stream_matches_full_recompute(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ss = SpanStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
        )
        _drop("b1.parquet", DOCS[:2])
        q = ss.start()
        q.awaitTermination(60)
        q.processAllAvailable()
        q.stop()
        got1 = {r["doc_id"] for r in ss.current_spans().collect()}
        assert got1 == {1, 2}

        _drop("b2.parquet", DOCS[2:4])
        _drop("b3.parquet", DOCS[4:])
        q = ss.start()
        q.processAllAvailable()
        q.stop()

        all_docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
        want = sorted(
            map(tuple, repeated_spans(all_docs, k=8, min_span=12).collect())
        )
        got = sorted(map(tuple, ss.current_spans().collect()))
        assert got == want
        # doc 4's span arrived only when doc 5 made BOILER_B repeated
        assert any(r[0] == 4 for r in got)
        shutil.rmtree(TMP, ignore_errors=True)

    def test_replay_is_idempotent(self, spark):
        """Re-processing a committed batch must not duplicate span rows."""
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ss = SpanStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
        )
        _drop("b1.parquet", DOCS[:2])
        q = ss.start()
        q.processAllAvailable()
        q.stop()
        before = sorted(map(tuple, ss.current_spans().collect()))
        # simulate an at-least-once replay of the committed batch
        batch = spark.createDataFrame(DOCS[:2], "doc_id bigint, text string")
        ss._process(batch, 0)
        after = sorted(map(tuple, ss.current_spans().collect()))
        assert after == before
        shutil.rmtree(TMP, ignore_errors=True)
