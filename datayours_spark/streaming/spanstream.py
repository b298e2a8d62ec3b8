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
subdirectories with identical content.  Maintenance: `store.BatchStore`
folds the per-batch directories every ``compact_every`` batches
(watermark compaction, crash analysis in store.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.functions.dedup import (
    repeated_spans_incremental,
    shingle_postings,
)
from datayours_spark.streaming.store import BatchStore

DOC_SCHEMA = "doc_id bigint, text string"
POSTINGS_SCHEMA = "doc_id bigint, off int, h bigint"
SPANS_SCHEMA = (
    "doc_id bigint, start_tok bigint, end_tok bigint, span_tokens bigint,"
    " batch_id bigint"
)

SCHEMAS = {"spans": SPANS_SCHEMA, "postings": POSTINGS_SCHEMA}


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
    #: fold the per-batch store dirs every N batches (store.BatchStore)
    compact_every: int | None = 64
    _store: BatchStore = field(default=None, repr=False)

    @property
    def store(self) -> BatchStore:
        if self._store is None:
            self._store = BatchStore(
                self.spark, self.store_dir, compact_every=self.compact_every
            )
        return self._store

    def _read_or_empty(self, name: str, schema: str) -> DataFrame:
        return self.store.read_or_empty(name, schema)

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        dests = {
            name: self.store.batch_dest(name, batch_id) for name in SCHEMAS
        }
        if all(
            self.store.batch_committed(name, batch_id) for name in SCHEMAS
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
        self.store.maybe_compact(batch_id, SCHEMAS)

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
