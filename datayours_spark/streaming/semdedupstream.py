"""Streaming SemDeDup: continuous semantic-duplicate flagging against a
standing corpus under a FROZEN quantizer (completes the streaming
incremental family: `dedupstream.DedupStream` (MinHash),
`spanstream.SpanStream` (spans), `embedstream.EmbedStream` (cosine)).

The batch operator (`functions.similarity.semdedup_incremental`) answers
"which of THIS batch's vectors are semantic duplicates of the standing
corpus or of earlier batch members".  This module runs it continuously: a
Structured Streaming embedding source feeds foreachBatch; every
micro-batch

1. assigns the batch with the frozen broadcast centroids and flags it
   against the standing (vec_id, v, nrm, cluster) index — comparisons
   run only within the batch's touched clusters, so per-batch cost
   scales with the batch, never the corpus,
2. appends the flags to the ``flags`` table,
3. appends the batch's own index rows — keeping the standing state
   current for the next batch.

WHY per-batch flags are exact (the keep-lowest-id argument, proved in
``semdedup_incremental``'s docstring): batch ids exceed all standing ids
(the caller owns id allocation, monotone across batches — same contract
as every member of the family) and the quantizer is frozen, so no batch
ever changes a standing vector's lower-id neighbor set; a batch vector's
flag depends only on the standing members of its cluster plus its own
batch — both fully known at its batch's turn.  Hence the union of
per-batch flags equals the full recompute over everything ingested.

Exactly-once: foreachBatch is at-least-once, so every sink write is
keyed by batch_id (same ``batch-<id>`` + ``_SUCCESS`` discipline as
DedupStream — see dedupstream.py's docstring for the crash analysis; a
replay after a partial commit recomputes from the pre-batch index state
and overwrites, converging to the same bytes).  Maintenance:
`store.BatchStore` folds the per-batch directories every
``compact_every`` batches (watermark compaction, crash analysis in
store.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datayours_spark.functions.similarity import (
    semdedup_incremental,
    semdedup_index,
)
from datayours_spark.streaming.store import BatchStore

EMB_SCHEMA = "vec_id bigint, embedding array<double>"
INDEX_SCHEMA = (
    "vec_id bigint, v array<double>, nrm double, cluster bigint"
)
FLAGS_SCHEMA = "vec_id bigint, cluster bigint, is_dup boolean"

SCHEMAS = {"flags": FLAGS_SCHEMA, "index": INDEX_SCHEMA}


@dataclass
class SemdedupStream:
    """Continuous SemDeDup flagging over an embedding stream."""

    spark: SparkSession
    centroids: DataFrame  # the FROZEN quantizer (trained offline)
    input_dir: str        # streaming source: parquet drops of (vec_id, embedding)
    store_dir: str        # holds index/, flags/
    checkpoint_dir: str
    tau: float = 0.3
    max_cluster: int | None = None
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
        new = batch.select("vec_id", "embedding")
        idx = self._read_or_empty("index", INDEX_SCHEMA)
        flags = semdedup_incremental(
            new, self.centroids, idx, tau=self.tau,
            max_cluster=self.max_cluster,
        )
        flags.write.mode("overwrite").parquet(dests["flags"])
        # index rows land AFTER the flag emission so the batch never
        # meets itself through the standing index (batch-internal
        # lower-id neighbors are handled inside semdedup_incremental)
        semdedup_index(new, self.centroids).write.mode("overwrite").parquet(
            dests["index"]
        )
        self.store.maybe_compact(batch_id, SCHEMAS)

    def start(self):
        emb = (
            self.spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(self.input_dir)
        )
        return (
            emb.writeStream.foreachBatch(self._process)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )

    def flags(self) -> DataFrame:
        return self._read_or_empty("flags", FLAGS_SCHEMA)
