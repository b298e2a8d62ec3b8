"""Streaming embedding near-dup maintenance: the cosine dedup path as a
stream (completes the streaming incremental family next to
`dedupstream.DedupStream` (MinHash) and `spanstream.SpanStream` (spans)).

The batch operator (`functions.similarity.cosine_neardup_incremental`)
answers "which near-dup pairs does THIS batch introduce against the
standing collapsed cosine index".  This module runs it continuously: a
Structured Streaming embedding source feeds foreachBatch; every
micro-batch

1. computes its pairs against the standing index (new×old via ONE bucket
   equi-join against the corpus REPS with member expansion, new×new via
   the guarded pipeline within the batch),
2. appends the verified pairs to the ``pairs`` table,
3. appends the batch's own collapse-index rows (members + tagged reps) —
   keeping the index current for the next batch.

Index-growth invariant (why per-batch appends stay EXACT even when a
batch vector is bit-identical to an earlier batch's vector): the members
table is a PARTITION of every indexed vec_id into identical-vector
groups; groups need not be maximal across batches.  A future batch
vector co-bucketed with two rep rows carrying the same vector (one per
past batch) matches both, but each expansion reaches a DISJOINT member
set, so every (new, old) pair is still emitted exactly once, with the
identical sim (bit-identical rep vectors ⇒ identical arithmetic).  The
only cost of non-maximality is extra rep rows — one per (batch, distinct
value) — never correctness.

Invariant (tested): the union of per-batch pair emissions equals the
full recompute's pair set — every pair is emitted exactly once, by the
first batch that completes it.

Exactly-once: foreachBatch is at-least-once, so every sink write is
keyed by batch_id (same ``batch-<id>`` + ``_SUCCESS`` discipline as
DedupStream — see dedupstream.py's docstring for the crash analysis).
Maintenance: `store.BatchStore` folds the per-batch directories every
``compact_every`` batches (watermark compaction, crash analysis in
store.py), and its Hadoop-FileSystem bookkeeping makes the store valid
on any URI Spark can write, not just local POSIX paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datayours_spark.functions.similarity import (
    cosine_neardup_incremental_indexed,
)
from datayours_spark.streaming.store import BatchStore

EMB_SCHEMA = "vec_id bigint, embedding array<double>"
MEMBERS_SCHEMA = "vec_id bigint, rep bigint, self_sim double"
REPS_SCHEMA = (
    "vec_id bigint, v array<double>, nrm double, bucket bigint"
)
PAIRS_SCHEMA = "id1 bigint, id2 bigint, sim double"

SCHEMAS = {
    "pairs": PAIRS_SCHEMA, "members": MEMBERS_SCHEMA, "reps": REPS_SCHEMA,
}


@dataclass
class EmbedStream:
    """Continuous cosine near-dup maintenance over an embedding stream."""

    spark: SparkSession
    input_dir: str       # streaming source: parquet drops of (vec_id, embedding)
    store_dir: str       # holds members/, reps/, pairs/
    checkpoint_dir: str
    n_planes: int = 6
    threshold: float = 0.25
    round_dp: int = 4
    dim: int | None = None
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
        members_idx = self._read_or_empty("members", MEMBERS_SCHEMA)
        reps_idx = self._read_or_empty("reps", REPS_SCHEMA)
        # the indexed variant returns the batch's own collapse-index rows
        # alongside the pairs, so each micro-batch builds (and
        # checkpoints) its collapse window exactly ONCE (round-6 verdict
        # item #6 — previously cosine_collapse_index ran a second time
        # for the index append)
        pairs, new_members, new_reps = cosine_neardup_incremental_indexed(
            new,
            members_idx,
            reps_idx,
            n_planes=self.n_planes,
            threshold=self.threshold,
            round_dp=self.round_dp,
            dim=self.dim,
        )
        pairs.write.mode("overwrite").parquet(dests["pairs"])
        # index rows land AFTER the pair emission so the batch never joins
        # itself through the standing index (new×new is handled inside
        # the incremental computation)
        new_members.write.mode("overwrite").parquet(dests["members"])
        new_reps.write.mode("overwrite").parquet(dests["reps"])
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

    def pairs(self) -> DataFrame:
        return self._read_or_empty("pairs", PAIRS_SCHEMA)
