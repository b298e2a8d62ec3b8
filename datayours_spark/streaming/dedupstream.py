"""Streaming near-dup maintenance: the operational dedup path as a stream.

The batch operator (`functions.dedup.minhash_incremental`) answers "which
pairs does THIS batch introduce against the standing index".  This module
runs it continuously: a Structured Streaming document source feeds
foreachBatch; every micro-batch

1. computes its near-dup pairs against the standing LSH index (new×old via
   the index equi-join, new×new within the batch),
2. appends the verified pairs to the ``pairs`` table,
3. appends the batch's own band rows to the ``index`` table and its text to
   the ``corpus`` table — keeping both current for the next batch.

Invariant (tested): the union of per-batch pair emissions equals the full
recompute's pair set — every pair is emitted exactly once, by the first
batch that completes it.

Scale notes: per-batch cost follows the BATCH (one explode+agg for its
signatures, one equi-join against the bucketed index); the corpus text is
only read for verified candidates.  This is the T5 incremental-maintenance
story applied to the training-data ops (SURVEY §2.9 shape).

Exactly-once: foreachBatch is at-least-once, so every sink write is keyed
by batch_id — each batch lands in its own ``batch-<id>`` subdirectory and a
fully-committed replay is a no-op.  Readers only see subdirectories whose
``_SUCCESS`` marker exists, so a crash between the pairs/index/corpus
writes and the checkpoint commit can neither duplicate rows (the replay
overwrites the same subdirectories) nor leak half-written files into the
next batch's index join (uncommitted directories are invisible, and the
replay recomputes from exactly the inputs the first attempt saw).

Maintenance: `store.BatchStore` folds the per-batch directories into one
compacted dir every ``compact_every`` batches (watermark compaction —
see store.py for the crash analysis), so a long-horizon stream's
per-batch listing/open cost stays bounded instead of growing one
directory per batch forever.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datayours_spark.functions.dedup import minhash_incremental, minhash_index
from datayours_spark.streaming.store import BatchStore

DOC_SCHEMA = "doc_id bigint, text string"
INDEX_SCHEMA = "doc_id bigint, band int, bh string"
PAIRS_SCHEMA = "id1 bigint, id2 bigint, jaccard double"

SCHEMAS = {
    "pairs": PAIRS_SCHEMA, "index": INDEX_SCHEMA, "corpus": DOC_SCHEMA,
}


@dataclass
class DedupStream:
    """Continuous MinHash-LSH maintenance over a document file stream."""

    spark: SparkSession
    input_dir: str       # streaming source: parquet drops of (doc_id, text)
    store_dir: str       # holds corpus/, index/, pairs/
    checkpoint_dir: str
    bands: int = 5
    rows: int = 4
    threshold: float = 0.5
    shingle_n: int = 3
    seed: int = 42
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
        # idempotence under foreachBatch's at-least-once contract: every
        # sink write is keyed by batch_id; a replay of a fully-committed
        # batch is a no-op (batch_committed also answers True when
        # compaction already folded the batch — store.py crash window 3),
        # a replay of a partially-committed batch overwrites the same
        # subdirectories with identical content (the inputs are the
        # committed dirs only — exactly what the first attempt saw, since
        # this batch's own dirs weren't committed)
        dests = {
            name: self.store.batch_dest(name, batch_id) for name in SCHEMAS
        }
        if all(
            self.store.batch_committed(name, batch_id) for name in SCHEMAS
        ):
            return
        new = batch.select("doc_id", "text")
        index = self._read_or_empty("index", INDEX_SCHEMA)
        corpus = self._read_or_empty("corpus", DOC_SCHEMA)
        pairs = minhash_incremental(
            new,
            index,
            corpus.unionByName(new),
            bands=self.bands,
            rows=self.rows,
            threshold=self.threshold,
            shingle_n=self.shingle_n,
            seed=self.seed,
        )
        pairs.write.mode("overwrite").parquet(dests["pairs"])
        # the index/corpus writes land AFTER the pair emission so the batch
        # never joins itself through the standing index (new×new is handled
        # inside minhash_incremental)
        (
            minhash_index(
                new, bands=self.bands, rows=self.rows,
                shingle_n=self.shingle_n, seed=self.seed,
            )
            .write.mode("overwrite")
            .parquet(dests["index"])
        )
        new.write.mode("overwrite").parquet(dests["corpus"])
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

    def pairs(self) -> DataFrame:
        return self._read_or_empty("pairs", PAIRS_SCHEMA)
