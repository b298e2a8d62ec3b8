"""Streaming quality gating: the Gopher document filter running
continuously at ingest — the quality member of the streaming family
next to `dedupstream.DedupStream` (MinHash), `spanstream.SpanStream`
(spans), `embedstream.EmbedStream` (cosine),
`semdedupstream.SemdedupStream`, `winnowstream.WinnowStream`.

Every micro-batch:

1. scores the batch with ``functions.text.gopher_rules`` (a zero-shuffle
   projection — the batch never shuffles) and appends the per-doc rule
   booleans to the ``gates`` table: the permanent record of WHICH rule
   rejected each ingested doc,
2. appends the batch's per-source tally (n_docs, n_pass) to the
   ``tallies`` table — sources-sized rows per batch; ``report()`` folds
   them with one tiny aggregate, so the running per-source pass-rate
   dashboard never rescans the corpus.

Invariant (tested): the union of per-batch gate emissions equals the
batch operator over the full corpus — gating is per-row, so streaming
introduces no order dependence at all (unlike the dedup members, not
even a new×old asymmetry).

Exactly-once + compaction: the same ``BatchStore`` discipline as every
member of the family (batch-keyed dirs, `_SUCCESS` markers, watermark
compaction every ``compact_every`` batches).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.functions.text import gopher_rules
from datayours_spark.streaming.store import BatchStore

DOC_SCHEMA = "doc_id bigint, text string, source string"
GATES_SCHEMA = (
    "doc_id bigint, n_words bigint, source string, ok_word_count boolean, "
    "ok_mean_word_len boolean, ok_symbol_ratio boolean, "
    "ok_bullet_lines boolean, ok_ellipsis_lines boolean, "
    "ok_alpha_words boolean, ok_stopwords boolean, pass_all boolean"
)
TALLIES_SCHEMA = "source string, n_docs bigint, n_pass bigint"

SCHEMAS = {"gates": GATES_SCHEMA, "tallies": TALLIES_SCHEMA}


@dataclass
class QualityStream:
    """Continuous Gopher quality gating over a document stream."""

    spark: SparkSession
    input_dir: str       # streaming source: parquet drops of DOC_SCHEMA
    store_dir: str       # holds gates/, tallies/
    checkpoint_dir: str
    min_words: int = 50
    max_words: int = 100_000
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

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        dests = {
            name: self.store.batch_dest(name, batch_id) for name in SCHEMAS
        }
        if all(
            self.store.batch_committed(name, batch_id) for name in SCHEMAS
        ):
            return
        gates = gopher_rules(
            batch,
            min_words=self.min_words,
            max_words=self.max_words,
            carry_cols=("source",),
        ).localCheckpoint(eager=False)  # score once, feed both sinks
        # (lazy: the gates write below is the materializing action —
        # one job instead of an eager-checkpoint job plus the write)
        gates.write.mode("overwrite").parquet(dests["gates"])
        tally = gates.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("pass_all").cast("bigint")).alias("n_pass"),
        )
        tally.write.mode("overwrite").parquet(dests["tallies"])
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

    def gates(self) -> DataFrame:
        return self.store.read_or_empty("gates", GATES_SCHEMA)

    def report(self) -> DataFrame:
        """Running per-source quality report: one tiny aggregate over the
        sources × batches tally rows — never a corpus rescan."""
        return (
            self.store.read_or_empty("tallies", TALLIES_SCHEMA)
            .groupBy("source")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_pass").alias("n_pass"),
            )
            .withColumn(
                "pass_rate", F.round(F.col("n_pass") / F.col("n_docs"), 4)
            )
        )
