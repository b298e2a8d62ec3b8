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
and overwrites, converging to the same bytes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from datayours_spark.functions.similarity import (
    semdedup_incremental,
    semdedup_index,
)

EMB_SCHEMA = "vec_id bigint, embedding array<double>"
INDEX_SCHEMA = (
    "vec_id bigint, v array<double>, nrm double, cluster bigint"
)
FLAGS_SCHEMA = "vec_id bigint, cluster bigint, is_dup boolean"


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
            for name in ("flags", "index")
        }
        if all(
            os.path.isfile(os.path.join(d, "_SUCCESS"))
            for d in dests.values()
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
