"""Streaming winnowing maintenance: the MOSS-fingerprint dedup path as a
stream (completes the streaming incremental family next to
`dedupstream.DedupStream` (MinHash), `spanstream.SpanStream` (spans),
`embedstream.EmbedStream` (cosine), `semdedupstream.SemdedupStream`).

The batch operator (`functions.dedup.winnow_incremental`) answers "which
containment near-dup pairs does THIS batch introduce against the
standing fingerprint index".  This module runs it continuously: a
Structured Streaming document source feeds foreachBatch; every
micro-batch

1. computes its pairs against the standing (doc_id, h) index (new×old
   via the posting equi-join, new×new within the batch),
2. appends the verified pairs to the ``pairs`` table,
3. appends the batch's own distinct fingerprints to the ``index`` table
   — keeping it current for the next batch.

Invariant (tested): the union of per-batch pair emissions equals the
full recompute's pair set — WITH the caveat every containment metric
carries: a pair's containment denominator is min(n_fp) of the two docs,
both fixed at fingerprinting time, so per-batch emission is exact (no
later batch can change an earlier pair's score; unlike a global metric
there is nothing corpus-dependent in the pair score).

Exactly-once + compaction: the same ``BatchStore`` discipline as every
member of the family (batch-keyed dirs, `_SUCCESS` markers, watermark
compaction every ``compact_every`` batches — crash analysis in
store.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.functions.dedup import winnow_incremental_indexed
from datayours_spark.streaming.store import BatchStore

DOC_SCHEMA = "doc_id bigint, text string"
# ``batch`` stamps the ingesting micro-batch so re-ingestion is
# REPLACEMENT all the way down: the reader keeps only each doc's
# latest-batch fingerprints (last-writer-wins), so a doc re-ingested in
# batch i never unions old+new rows when batch i+1 reads the index —
# the n_fp containment denominator stays single-version (ADVICE r8).
INDEX_SCHEMA = "doc_id bigint, h bigint, batch bigint"
PAIRS_SCHEMA = "id1 bigint, id2 bigint, shared bigint, containment double"

SCHEMAS = {"pairs": PAIRS_SCHEMA, "index": INDEX_SCHEMA}


def _index_lww(index: DataFrame) -> DataFrame:
    """Last-writer-wins view of the stored index: per doc_id, keep only
    the rows of its highest ingesting batch.

    Scale shape: one map-side-combinable per-doc max (docs-sized output)
    joined back on (doc_id, batch) — both sides hash-partition on
    doc_id, no window, no broadcast of anything corpus-sized."""
    latest = index.groupBy("doc_id").agg(F.max("batch").alias("batch"))
    return index.join(latest, ["doc_id", "batch"])


@dataclass
class WinnowStream:
    """Continuous winnowing near-dup maintenance over a document stream."""

    spark: SparkSession
    input_dir: str       # streaming source: parquet drops of (doc_id, text)
    store_dir: str       # holds index/, pairs/
    checkpoint_dir: str
    k: int = 4
    w: int = 4
    threshold: float = 0.5
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
        # Last-writer-wins read: superseded rows for docs re-ingested in
        # EARLIER batches are dropped here (the compute-time anti-join
        # inside winnow_incremental only covers THIS batch's doc_ids).
        index = _index_lww(self._read_or_empty("index", INDEX_SCHEMA))
        # _indexed returns the batch's checkpointed fingerprints so the
        # index append reuses them instead of re-fingerprinting the
        # batch (the EmbedStream build-once contract — ADVICE r7)
        pairs, batch_fp = winnow_incremental_indexed(
            new,
            index.select("doc_id", "h"),
            k=self.k,
            w=self.w,
            threshold=self.threshold,
        )
        pairs.write.mode("overwrite").parquet(dests["pairs"])
        # index rows land AFTER the pair emission so the batch never
        # joins itself through the standing index (new×new is handled
        # inside winnow_incremental)
        batch_fp.withColumn("batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(dests["index"])
        # compaction folds with the same LWW rule, so superseded rows
        # are physically dropped (storage stays bounded by live docs);
        # the fold is a no-op on the reader view, which filters anyway
        self.store.maybe_compact(
            batch_id, SCHEMAS, folds={"index": _index_lww}
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

    def pairs(self) -> DataFrame:
        return self._read_or_empty("pairs", PAIRS_SCHEMA)
