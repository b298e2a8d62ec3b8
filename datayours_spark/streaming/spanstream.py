"""Streaming span maintenance: repeated-span detection as a stream.

The batch operator (`functions.dedup.repeated_spans_incremental`) answers
"which docs' repeated spans does THIS batch create or extend against the
standing posting index".  This module runs it continuously: a Structured
Streaming document source feeds foreachBatch; every micro-batch

1. emits the CURRENT full span set of every affected doc (batch docs plus
   existing docs sharing a now-repeated shingle),
2. appends the batch's own shingle postings to the ``postings`` table —
   keeping the inverted index current for the next batch.

The corpus is append-only, so a doc's repeated coverage only grows; each
re-emission REPLACES that doc's span set, and the current view is the
latest emission per doc (:meth:`SpanStream.current_spans`).  Invariant
(tested): after any number of batches, the current view equals the full
batch recompute over everything ingested.

Same exactly-once discipline as `streaming.dedupstream.DedupStream`:
foreachBatch is at-least-once, so every sink write is keyed by batch_id
(its own ``batch-<id>`` subdirectory); readers only see committed
(_SUCCESS) subdirectories, and a replay overwrites the same
subdirectories with identical content.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.functions.dedup import (
    repeated_spans_incremental,
    shingle_postings,
)

DOC_SCHEMA = "doc_id bigint, text string"
POSTINGS_SCHEMA = "doc_id bigint, off int, h bigint"
SPANS_SCHEMA = (
    "doc_id bigint, start_tok bigint, end_tok bigint, span_tokens bigint,"
    " batch_id bigint"
)


@dataclass
class SpanStream:
    """Continuous repeated-span maintenance over a document file stream."""

    spark: SparkSession
    input_dir: str       # streaming source: parquet drops of (doc_id, text)
    store_dir: str       # holds postings/, spans/
    checkpoint_dir: str
    k: int = 8
    min_span: int = 12
    min_docs: int = 2

    def _committed_dirs(self, name: str) -> list[str]:
        root = os.path.join(self.store_dir, name)
        if not os.path.isdir(root):
            return []
        return sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if os.path.isfile(os.path.join(root, d, "_SUCCESS"))
        )

    def _read_or_empty(self, name: str, schema: str) -> DataFrame:
        dirs = self._committed_dirs(name)
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*dirs)

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        sub = f"batch-{batch_id:012d}"
        dests = {
            name: os.path.join(self.store_dir, name, sub)
            for name in ("spans", "postings")
        }
        if all(
            os.path.isfile(os.path.join(d, "_SUCCESS"))
            for d in dests.values()
        ):
            return
        new = batch.select("doc_id", "text")
        old_posts = self._read_or_empty("postings", POSTINGS_SCHEMA)
        spans = repeated_spans_incremental(
            new, old_posts, k=self.k, min_span=self.min_span,
            min_docs=self.min_docs,
        ).withColumn("batch_id", F.lit(batch_id))
        spans.write.mode("overwrite").parquet(dests["spans"])
        # postings land AFTER the span emission: repeated_spans_incremental
        # already unions the batch's own postings internally
        (
            shingle_postings(new, self.k)
            .write.mode("overwrite")
            .parquet(dests["postings"])
        )

    def start(self):
        docs = (
            self.spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(self.input_dir)
        )
        return (
            docs.writeStream.foreachBatch(self._process)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )

    def current_spans(self) -> DataFrame:
        """Latest emission per doc: each affected doc's most recent FULL
        span set (re-emissions replace; coverage only grows)."""
        all_spans = self._read_or_empty("spans", SPANS_SCHEMA)
        latest = all_spans.groupBy("doc_id").agg(
            F.max("batch_id").alias("batch_id")
        )
        return all_spans.join(latest, ["doc_id", "batch_id"]).select(
            "doc_id", "start_tok", "end_tok", "span_tokens"
        )
