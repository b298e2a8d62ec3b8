"""Watermark compaction for the streaming dedup-family stores
(`streaming.store.BatchStore`): the reader view is preserved exactly,
every crash window recovers, and a folded batch's replay stays a no-op.
"""

import os
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from datayours_spark.streaming.store import BatchStore

TMP = Path(__file__).resolve().parent / "_tmp" / "batchstore"

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    (1, BASE + " one"),
    (2, BASE + " two"),
    (3, "unrelated words entirely distinct content here now"),
    (10, BASE + " ten"),
    (11, BASE + " eleven"),
    (20, "another island of totally different tokens altogether"),
    (30, BASE + " thirty"),
]


def _write_batch(spark, store, name, batch_id, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        store.batch_dest(name, batch_id)
    )


class TestBatchStore:
    def _fresh(self, spark, sub, **kw):
        d = TMP / sub
        shutil.rmtree(d, ignore_errors=True)
        return BatchStore(spark, str(d), **kw)

    def test_compaction_preserves_reader_view(self, spark):
        store = self._fresh(spark, "view")
        schema = "doc_id bigint, text string"
        for b in range(5):
            _write_batch(spark, store, "corpus", b, [DOCS[b]], schema)
        before = {r.doc_id for r in store.read_or_empty("corpus", schema).collect()}
        assert before == {d[0] for d in DOCS[:5]}
        folded = store.compact("corpus", schema, upto_batch_id=4)
        assert folded == 5
        after = {r.doc_id for r in store.read_or_empty("corpus", schema).collect()}
        assert after == before
        # one compacted dir remains; the batch dirs are gone
        subs = sorted(os.listdir(TMP / "view" / "corpus"))
        assert subs == ["compacted-000000000004"]
        assert store.watermark("corpus") == 4

    def test_folded_batch_counts_as_committed(self, spark):
        store = self._fresh(spark, "folded")
        schema = "doc_id bigint, text string"
        _write_batch(spark, store, "corpus", 0, [DOCS[0]], schema)
        store.compact("corpus", schema, upto_batch_id=0)
        # the batch dir is deleted, but a foreachBatch replay of batch 0
        # must still see it as committed (crash window 3)
        assert not os.path.isdir(TMP / "folded" / "corpus" / "batch-000000000000")
        assert store.batch_committed("corpus", 0)
        assert not store.batch_committed("corpus", 1)

    def test_crash_mid_compact_is_invisible_then_recovers(self, spark):
        store = self._fresh(spark, "midcrash")
        schema = "doc_id bigint, text string"
        for b in range(3):
            _write_batch(spark, store, "corpus", b, [DOCS[b]], schema)
        # simulate a compaction that died before _SUCCESS: a compacted
        # dir with data but no marker
        dead = TMP / "midcrash" / "corpus" / "compacted-000000000002"
        dead.mkdir(parents=True)
        pq.write_table(
            pa.table({"doc_id": pa.array([999], pa.int64()), "text": ["junk"]}),
            str(dead / "part-0.parquet"),
        )
        view = {r.doc_id for r in store.read_or_empty("corpus", schema).collect()}
        assert view == {1, 2, 3}          # the dead dir is ignored
        assert store.watermark("corpus") == -1
        # the retry folds the real batches and GCs nothing it shouldn't
        store.compact("corpus", schema, upto_batch_id=2)
        view2 = {r.doc_id for r in store.read_or_empty("corpus", schema).collect()}
        assert view2 == {1, 2, 3}
        assert store.watermark("corpus") == 2

    def test_crash_after_success_before_gc_no_double_count(self, spark):
        store = self._fresh(spark, "gccash")
        schema = "doc_id bigint, text string"
        for b in range(2):
            _write_batch(spark, store, "corpus", b, [DOCS[b]], schema)
        store.compact("corpus", schema, upto_batch_id=1)
        # resurrect a folded batch dir (as if the deletes never ran)
        _write_batch(spark, store, "corpus", 0, [DOCS[0]], schema)
        view = sorted(
            r.doc_id for r in store.read_or_empty("corpus", schema).collect()
        )
        assert view == [1, 2]             # watermark wins: no double-count
        # the next compaction garbage-collects the leftover even with no
        # new batches to fold
        store.compact("corpus", schema, upto_batch_id=1)
        assert sorted(os.listdir(TMP / "gccash" / "corpus")) == [
            "compacted-000000000001"
        ]

    def test_second_compaction_builds_on_first(self, spark):
        store = self._fresh(spark, "twice")
        schema = "doc_id bigint, text string"
        for b in range(3):
            _write_batch(spark, store, "corpus", b, [DOCS[b]], schema)
        store.compact("corpus", schema, upto_batch_id=2)
        for b in range(3, 6):
            _write_batch(spark, store, "corpus", b, [DOCS[b]], schema)
        store.compact("corpus", schema, upto_batch_id=5)
        view = sorted(
            r.doc_id for r in store.read_or_empty("corpus", schema).collect()
        )
        assert view == sorted(d[0] for d in DOCS[:6])
        assert sorted(os.listdir(TMP / "twice" / "corpus")) == [
            "compacted-000000000005"
        ]

    def test_same_tick_rewrite_invalidates_reader_cache(self, spark):
        """_df_cache keys dirs by the _SUCCESS marker's mtime, whose
        granularity is 1 s on several stores (S3 Last-Modified, some
        local filesystems): a same-process rewrite of a committed batch
        dir within the same tick must STILL invalidate cached readers
        (ADVICE r11) — the in-process write-intent epoch, bumped by
        batch_dest, versions the dir at zero I/O cost.  The test forces
        mtime equality with os.utime, so only the epoch can save it."""
        store = self._fresh(spark, "tick")
        schema = "doc_id bigint, text string"
        _write_batch(spark, store, "corpus", 0, [DOCS[0]], schema)
        first = store.read_or_empty("corpus", schema)
        assert [r.doc_id for r in first.collect()] == [DOCS[0][0]]
        success = TMP / "tick" / "corpus" / "batch-000000000000" / "_SUCCESS"
        frozen = success.stat().st_mtime
        # replay rewrites the committed dir with DIFFERENT rows and new
        # random part-file names, then lands on the identical mtime
        _write_batch(spark, store, "corpus", 0, [DOCS[1]], schema)
        os.utime(success, (frozen, frozen))
        again = store.read_or_empty("corpus", schema)
        # stale cache would hold the old part-file names: FileNotFound
        # or the old row — the epoch-keyed cache must see the rewrite
        assert [r.doc_id for r in again.collect()] == [DOCS[1][0]]

    def test_untouched_view_cache_still_hits_across_batches(self, spark):
        """The epoch must invalidate ONLY dirs this process resolved
        for writing — the compacted-side reader (re-read every batch)
        keeps hitting its cache, which is the r10 floor cut's whole
        point.  Same-object identity proves the cache hit."""
        store = self._fresh(spark, "hit")
        schema = "doc_id bigint, text string"
        _write_batch(spark, store, "corpus", 0, [DOCS[0]], schema)
        store.compact("corpus", schema, upto_batch_id=0)
        comp1, _ = store.read_split("corpus", schema)
        # a later batch write (new dir) must not evict the compacted
        # side's cached reader
        _write_batch(spark, store, "corpus", 1, [DOCS[1]], schema)
        comp2, tail2 = store.read_split("corpus", schema)
        assert comp2 is comp1
        assert sorted(r.doc_id for r in tail2.collect()) == [DOCS[1][0]]


class TestStreamWithCompaction:
    def test_dedupstream_invariant_with_compaction_forced(self, spark):
        """The family invariant — union of per-batch emissions == full
        recompute — with compaction firing after EVERY batch, plus the
        no-op replay of a folded batch."""
        from datayours_spark.functions.dedup import minhash_dedup
        from datayours_spark.streaming.dedupstream import DedupStream

        root = TMP / "dedup"
        shutil.rmtree(root, ignore_errors=True)
        ds = DedupStream(
            spark=spark,
            input_dir=str(root / "in"),
            store_dir=str(root / "store"),
            checkpoint_dir=str(root / "ckpt"),
            compact_every=1,
        )
        schema = "doc_id bigint, text string"
        batches = [DOCS[:3], DOCS[3:6], DOCS[6:]]
        for i, rows in enumerate(batches):
            ds._process(spark.createDataFrame(rows, schema), i)
        got = {
            (r["id1"], r["id2"]): r["jaccard"] for r in ds.pairs().collect()
        }
        all_docs = spark.createDataFrame(DOCS, schema)
        want = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in minhash_dedup(all_docs).collect()
        }
        assert got == want
        assert len(got) == ds.pairs().count()      # no duplicate rows
        # every table is down to one compacted dir per crash-free run
        for name in ("pairs", "index", "corpus"):
            subs = sorted(os.listdir(root / "store" / name))
            assert subs == ["compacted-000000000002"], (name, subs)
        # replay of a folded batch: strict no-op
        ds._process(spark.createDataFrame(batches[0], schema), 0)
        assert ds.pairs().count() == len(got)

    def test_embedstream_invariant_with_compaction_forced(self, spark):
        from datayours_spark.functions.similarity import cosine_neardup
        from datayours_spark.streaming.embedstream import EmbedStream

        root = TMP / "embed"
        shutil.rmtree(root, ignore_errors=True)
        vecs = [
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, [1.0, 2.0, 3.0, 4.0]),      # identical to 1
            (3, [4.0, -3.0, 2.0, -1.0]),
            (10, [1.0, 2.0, 3.0, 4.1]),     # near 1/2, lands in batch 2
            (11, [1.0, 2.0, 3.0, 4.0]),     # identical to 1/2, cross-batch
            (20, [-1.0, -2.0, -3.0, -4.0]),
        ]
        es = EmbedStream(
            spark=spark,
            input_dir=str(root / "in"),
            store_dir=str(root / "store"),
            checkpoint_dir=str(root / "ckpt"),
            n_planes=4,
            threshold=0.25,
            dim=4,
            compact_every=1,
        )
        schema = "vec_id bigint, embedding array<double>"
        batches = [vecs[:3], vecs[3:]]
        for i, rows in enumerate(batches):
            es._process(spark.createDataFrame(rows, schema), i)
        got = {
            (r["id1"], r["id2"]): r["sim"] for r in es.pairs().collect()
        }
        want = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(
                spark.createDataFrame(vecs, schema),
                n_planes=4, threshold=0.25, dim=4,
            ).collect()
        }
        assert got == want
        for name in ("pairs", "members", "reps"):
            subs = sorted(os.listdir(root / "store" / name))
            assert subs == ["compacted-000000000001"], (name, subs)
