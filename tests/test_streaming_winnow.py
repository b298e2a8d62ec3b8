"""Streaming winnowing maintenance: per-batch emissions == full recompute."""

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from datayours_spark.functions.dedup import (
    winnow_fingerprints,
    winnow_incremental_indexed,
    winnow_neardup,
)
from datayours_spark.streaming.winnowstream import WinnowStream

TMP = Path(__file__).resolve().parent / "_tmp" / "winnowstream"

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    (1, BASE + " one two three"),      # near-dup family: 1, 2, 10
    (2, BASE + " one two four"),
    (3, "unrelated words entirely distinct content here now ok"),
    (10, BASE + " one two five"),
    (11, "another island of totally different tokens altogether fine"),
    (20, BASE + " one two six"),       # joins the family post-restart
]


class TestWinnowStream:
    def test_stream_matches_full_recompute(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ws = WinnowStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            k=3, w=3, threshold=0.4,
            compact_every=1,           # force compaction every batch
        )
        schema = "doc_id bigint, text string"
        all_docs = spark.createDataFrame(DOCS, schema)

        # batch 0: docs 1-3 (one in-batch pair 1-2); batch 1: 10, 11
        batches = [DOCS[:3], DOCS[3:5]]
        for i, rows in enumerate(batches):
            ws._process(spark.createDataFrame(rows, schema), i)
        got = {
            (r.id1, r.id2): (r.shared, r.containment)
            for r in ws.pairs().collect()
        }
        want = {
            (r.id1, r.id2): (r.shared, r.containment)
            for r in winnow_neardup(
                spark.createDataFrame(DOCS[:5], schema), k=3, w=3, threshold=0.4
            ).collect()
        }
        assert got == want
        assert (1, 2) in got                        # new x new, batch 0
        assert any(b == 10 for _, b in got)         # new x old, batch 1
        # compaction forced every batch: one dir per table
        import os

        for name in ("pairs", "index"):
            subs = sorted(
                s for s in os.listdir(TMP / "store" / name)
                if s.startswith(("batch-", "compacted-"))
            )  # the index dir also holds the _HASH_FORMAT marker
            assert subs == ["compacted-000000000001"], (name, subs)

        # replay of a folded batch is a no-op (watermark path)
        n = ws.pairs().count()
        ws._process(spark.createDataFrame(batches[0], schema), 0)
        assert ws.pairs().count() == n

        # a further batch still pairs against the standing index
        ws._process(spark.createDataFrame([DOCS[5]], schema), 2)
        after = {(r.id1, r.id2) for r in ws.pairs().collect()}
        assert (1, 20) in after and (10, 20) in after
        full = {
            (r.id1, r.id2)
            for r in winnow_neardup(all_docs, k=3, w=3, threshold=0.4).collect()
        }
        assert after == full
        shutil.rmtree(TMP, ignore_errors=True)

    def test_reingestion_is_replacement_across_batches(self, spark):
        """A doc re-ingested in an EARLIER batch must not leave stale
        fingerprints in the standing index: later batches' containment
        denominators see only the latest version (ADVICE r8)."""
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ws = WinnowStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            k=3, w=3, threshold=0.4,
            compact_every=2,
        )
        schema = "doc_id bigint, text string"
        v1 = (1, BASE + " one two three")
        # v2 rewrites doc 1 entirely — different fingerprint set
        v2 = (1, "rewritten body with completely new vocabulary all over")
        probe = (30, "rewritten body with completely new vocabulary all done")
        ws._process(spark.createDataFrame([v1, DOCS[2]], schema), 0)
        ws._process(spark.createDataFrame([v2], schema), 1)   # re-ingest
        ws._process(spark.createDataFrame([probe], schema), 2)

        # the standing index holds exactly ONE version of doc 1
        from datayours_spark.streaming.winnowstream import (
            INDEX_SCHEMA, _index_lww,
        )
        idx = _index_lww(ws._read_or_empty("index", INDEX_SCHEMA))
        batches = [
            r.batch
            for r in idx.filter(F.col("doc_id") == 1)
            .select("batch").distinct().collect()
        ]
        assert batches == [1], batches
        # compaction at batch 1 physically dropped the v1 rows
        raw = ws._read_or_empty("index", INDEX_SCHEMA)
        assert raw.filter(
            (F.col("doc_id") == 1) & (F.col("batch") == 0)
        ).count() == 0

        # batch 2's pair against doc 1 scores v2's fingerprints only ==
        # a clean batch recompute over the LATEST versions
        got = {
            (r.id1, r.id2): (r.shared, r.containment)
            for r in ws.pairs().collect()
            if 30 in (r.id1, r.id2)
        }
        want = {
            (r.id1, r.id2): (r.shared, r.containment)
            for r in winnow_neardup(
                spark.createDataFrame([v2, DOCS[2], probe], schema),
                k=3, w=3, threshold=0.4,
            ).collect()
            if 30 in (r.id1, r.id2)
        }
        assert got == want and (1, 30) in got
        shutil.rmtree(TMP, ignore_errors=True)

    def test_pruned_view_supersedes_outside_bucket_reingestion(self, spark):
        """The hb-prune trap: a doc re-ingested with fingerprints
        ENTIRELY OUTSIDE a later batch's buckets must still supersede
        its compacted rows INSIDE them — the LWW bookkeeping runs over
        the unpruned tail, only the data rows are bucket-filtered.
        With a buggy pruned-LWW, batch 2's probe would pair against
        doc 1's STALE v1 fingerprints and emit a pair the full
        recompute does not contain."""
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        ws = WinnowStream(
            spark=spark,
            input_dir=str(TMP / "in"),
            store_dir=str(TMP / "store"),
            checkpoint_dir=str(TMP / "ckpt"),
            k=3, w=3, threshold=0.3,
            index_buckets=4096,   # tiny fp sets → real pruning
            compact_every=None,   # compaction driven manually below
        )
        schema = "doc_id bigint, text string"
        v1 = (1, BASE + " one two three")
        v2 = (1, "rewritten body with completely new vocabulary all over")
        # probe is a near-copy of V1 — against a correct index it finds
        # nothing (v2 replaced v1); against stale v1 rows it pairs
        probe = (30, BASE + " one two seven")
        ws._process(spark.createDataFrame([v1], schema), 0)
        # fold v1 into the compacted side; v2 then stays in the TAIL —
        # the exact layout the pruned reader must supersede across
        from datayours_spark.streaming.winnowstream import (
            SCHEMAS, _index_lww,
        )
        for name, schema_str in SCHEMAS.items():
            ws.store.compact(
                name, schema_str, 0,
                fold=_index_lww if name in ("index", "counts") else None,
            )
        ws._process(spark.createDataFrame([v2], schema), 1)   # tail
        ws._process(spark.createDataFrame([probe], schema), 2)
        got = {
            (r.id1, r.id2) for r in ws.pairs().collect()
            if 30 in (r.id1, r.id2)
        }
        want = {
            (r.id1, r.id2)
            for r in winnow_neardup(
                spark.createDataFrame([v2, probe], schema),
                k=3, w=3, threshold=0.3,
            ).collect()
            if 30 in (r.id1, r.id2)
        }
        assert got == want == set()
        shutil.rmtree(TMP, ignore_errors=True)


class TestCompactionUnderDynamicOverwrite:
    def test_markers_survive_session_dynamic_mode(self, spark):
        """A lingering session-level partitionOverwriteMode=dynamic
        (set by unrelated maintenance jobs) must not break the
        marker-gated compaction protocol: under dynamic mode a
        partitioned write skips its _SUCCESS, so the watermark never
        advances and batch dirs accumulate forever (found by the full
        suite's test ordering, r10).  The compacted write pins static
        mode per-writer."""
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        shutil.rmtree(TMP, ignore_errors=True)
        (TMP / "in").mkdir(parents=True)
        try:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            ws = WinnowStream(
                spark=spark,
                input_dir=str(TMP / "in"),
                store_dir=str(TMP / "store"),
                checkpoint_dir=str(TMP / "ckpt"),
                k=3, w=3, threshold=0.4,
                compact_every=1,
            )
            schema = "doc_id bigint, text string"
            for i, rows in enumerate([DOCS[:3], DOCS[3:5]]):
                ws._process(spark.createDataFrame(rows, schema), i)
            import os

            for name in ("pairs", "index", "counts"):
                subs = sorted(
                    s for s in os.listdir(TMP / "store" / name)
                    if s.startswith(("batch-", "compacted-"))
                )  # the index dir also holds the _HASH_FORMAT marker
                assert subs == ["compacted-000000000001"], (name, subs)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
            shutil.rmtree(TMP, ignore_errors=True)


class TestBatchProportionalPlan:
    def test_posting_path_never_shuffles_the_index(self, spark):
        """The per-batch pair computation must not plan a shuffle
        exchange on the standing-index side: the hits materialization
        (index scan → broadcast anti-join → broadcast semi-filter) and
        the pair join (broadcast batch build side) are the whole
        corpus-touching surface — at a TB-scale index an Exchange here
        is the difference between a scan and a cluster-wide re-sort."""
        schema = "doc_id bigint, text string"
        corpus = spark.createDataFrame(DOCS[:5], schema)
        index_fp = (
            winnow_fingerprints(corpus, k=3, w=3)
            .select("doc_id", "h").distinct().localCheckpoint(eager=True)
        )
        batch = spark.createDataFrame([DOCS[5]], schema)
        batch_fp = (
            winnow_fingerprints(batch, k=3, w=3)
            .select("doc_id", "h").distinct().localCheckpoint(eager=True)
        )
        from pyspark.sql import functions as F2

        new_ids = batch_fp.select("doc_id").distinct()
        both = (
            index_fp.join(F2.broadcast(new_ids), "doc_id", "left_anti")
            .unionByName(batch_fp)
        )
        hits = both.join(
            F2.broadcast(batch_fp.select("h").distinct()), "h"
        )
        plan = hits._jdf.queryExecution().executedPlan().toString()
        # batch-sized shuffles ARE allowed (the distinct doc_id / h
        # sets feeding the broadcast builds); what must never appear is
        # a shuffle on the index lineage — i.e. every shuffle Exchange
        # must live UNDER a BroadcastExchange build subtree
        lines = plan.splitlines()

        def depth(ln):
            for i, ch in enumerate(ln):
                if ch not in " :+-":
                    return i
            return len(ln)

        for i, ln in enumerate(lines):
            if "Exchange hashpartitioning" not in ln:
                continue
            d = depth(ln)
            anc_broadcast = False
            for j in range(i - 1, -1, -1):
                dj = depth(lines[j])
                if dj < d:
                    if "BroadcastExchange" in lines[j]:
                        anc_broadcast = True
                        break
                    d = dj
            assert anc_broadcast, f"index-side shuffle:\n{plan}"
    def test_broadcast_counts_modes_identical_pairs(self, spark):
        """winnow_incremental_indexed must emit IDENTICAL pairs in
        every mode: shuffle vs broadcast posting join, with vs without
        the standing counts table (the batch-proportional rewrites are
        exact, not approximations)."""
        schema = "doc_id bigint, text string"
        corpus = spark.createDataFrame(DOCS[:5], schema)
        index_fp = (
            winnow_fingerprints(corpus, k=3, w=3)
            .select("doc_id", "h").distinct().localCheckpoint(eager=True)
        )
        counts = index_fp.groupBy("doc_id").agg(
            F.count("*").alias("n_fp")
        )
        batch = spark.createDataFrame(
            [DOCS[5], (21, BASE + " one two three")], schema
        )
        results = []
        for kw in (
            {"broadcast_batch": False},
            {"broadcast_batch": True},
            {"broadcast_batch": True, "index_counts": counts},
            {"broadcast_batch": False, "index_counts": counts},
        ):
            pairs, _ = winnow_incremental_indexed(
                batch, index_fp, k=3, w=3, threshold=0.3, **kw
            )
            results.append({tuple(r) for r in pairs.collect()})
        assert results[0] and all(r == results[0] for r in results[1:])


class TestBloomSummaryPrune:
    """The compacted index's per-bucket bloom summary (r10 verdict #5):
    the BULK-batch prune the hb layout alone cannot provide."""

    def _stream(self, spark, prune, sub):
        shutil.rmtree(TMP / sub, ignore_errors=True)
        (TMP / sub / "in").mkdir(parents=True)
        return WinnowStream(
            spark=spark,
            input_dir=str(TMP / sub / "in"),
            store_dir=str(TMP / sub / "store"),
            checkpoint_dir=str(TMP / sub / "ckpt"),
            k=3, w=3, threshold=0.3,
            index_buckets=2,      # any multi-fp batch touches BOTH
            compact_every=1,      # summary rebuilt after every batch
            summary_prune=prune,
        )

    def test_pruned_pairs_identical_and_fresh_buckets_skipped(self, spark):
        from datayours_spark.streaming.winnowstream import (
            summary_hit_buckets,
        )

        schema = "doc_id bigint, text string"
        fresh = [
            (40, "volcano quartz ribbon lantern meadow sparrow velvet"),
            (41, "granite whisper copper twilight harbor ember thistle"),
        ]
        copy = (50, BASE + " one two nine")  # near-copy of compacted 1
        got = {}
        for prune in (False, True):
            ws = self._stream(spark, prune, f"bloom{prune}")
            ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
            ws._process(
                spark.createDataFrame(fresh + [copy], schema), 1
            )
            got[prune] = {tuple(r) for r in ws.pairs().collect()}
        # byte-identical pair tables with and without the prune — the
        # planted copy pairs THROUGH the compacted side in both
        assert got[True] == got[False]
        assert any(50 in (a, b) for a, b, *_ in got[True])

        # direct probe semantics on the pruned store (summary is at
        # watermark 1 after batch 1's compaction):
        ws = self._stream(spark, True, "bloomprobe")
        ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
        # a present h's bucket can NEVER be skipped (no false negatives)
        present = winnow_fingerprints(
            spark.createDataFrame([DOCS[0]], schema), k=3, w=3
        ).select("doc_id", "h").distinct()
        hit = summary_hit_buckets(ws.store, present, 2)
        from datayours_spark.streaming.winnowstream import _with_hb
        want = {
            r.hb for r in _with_hb(present, 2).select("hb").distinct()
            .collect()
        }
        assert hit is not None and want <= set(hit)
        # an entirely fresh probe skips buckets (deterministic given
        # the fixed vocabulary; bloom fpp ~4e-5 at 24 bits/element)
        fresh_fp = winnow_fingerprints(
            spark.createDataFrame(fresh, schema), k=3, w=3
        ).select("doc_id", "h").distinct()
        fresh_hit = summary_hit_buckets(ws.store, fresh_fp, 2)
        assert fresh_hit is not None and len(fresh_hit) < 2
        # a stale summary (watermark moved without a rebuild) is
        # IGNORED, never misapplied: process a batch with the prune
        # switched off — compaction still fires (wm 0→1) but no rebuild
        ws.summary_prune = False
        ws._process(spark.createDataFrame([fresh[0]], schema), 1)
        assert ws.store.watermark("index") == 1
        assert summary_hit_buckets(ws.store, present, 2) is None
        for prune in (False, True):
            shutil.rmtree(TMP / f"bloom{prune}", ignore_errors=True)
        shutil.rmtree(TMP / "bloomprobe", ignore_errors=True)

    def test_summary_header_memo_survives_same_tick_rewrite(self, spark):
        """ADVICE r12: the (m_p, wm) header memo is keyed on the summary
        dir's _SUCCESS mtime, which is 1-second-granular — a same-tick
        same-process rewrite must still invalidate it (a stale m_p under
        a matching watermark would mis-position probe bits and silently
        skip buckets holding real matches).  Simulate the tick collision
        by rewinding the _SUCCESS mtime after a rebuild: the write-intent
        epoch folded into the key must force a fresh header read."""
        import os

        from datayours_spark.streaming.winnowstream import (
            _summary_path,
            rebuild_index_summary,
            summary_hit_buckets,
        )

        schema = "doc_id bigint, text string"
        ws = self._stream(spark, True, "bloomepoch")
        ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
        present = winnow_fingerprints(
            spark.createDataFrame([DOCS[0]], schema), k=3, w=3
        ).select("doc_id", "h").distinct().localCheckpoint()
        hit1 = summary_hit_buckets(ws.store, present, 2)
        assert hit1 is not None
        spath = _summary_path(ws.store)
        success = os.path.join(spath, "_SUCCESS")
        t = os.stat(success).st_mtime
        # poison every cached header (what a stale memo would serve)
        for key in list(ws.store._scalar_cache):
            if key[0] == "summary_head":
                ws.store._scalar_cache[key] = (
                    None, 12345, ws.store.watermark("index")
                )
        epoch_before = ws.store._dir_epoch.get(spath, 0)
        rebuild_index_summary(ws.store, 2)
        assert ws.store._dir_epoch.get(spath, 0) > epoch_before
        os.utime(success, (t, t))  # same-tick rewrite
        hit2 = summary_hit_buckets(ws.store, present, 2)
        assert hit2 == hit1
        shutil.rmtree(TMP / "bloomepoch", ignore_errors=True)

    def test_hash_format_marker_lifecycle(self, spark):
        """The on-disk fingerprint-format marker (ADVICE r11): a fresh
        store is stamped on its first batch; a store persisted under a
        DIFFERENT format (or a pre-marker build with committed data)
        refuses to reattach instead of silently emitting zero pairs.
        The marker must survive compaction GC (it is a foreign entry
        in the index dir)."""
        import pytest

        from datayours_spark.streaming.winnowstream import (
            _FORMAT_MARKER,
            WINNOW_HASH_FORMAT,
            WinnowHashFormatError,
            ensure_hash_format,
        )

        schema = "doc_id bigint, text string"
        ws = self._stream(spark, False, "fmt")
        ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
        marker = TMP / "fmt" / "store" / "index" / _FORMAT_MARKER
        assert marker.read_text() == WINNOW_HASH_FORMAT
        # compaction ran (compact_every=1) and left the marker alone;
        # a fresh maintainer instance reattaches cleanly
        ws_re = WinnowStream(
            spark=spark,
            input_dir=str(TMP / "fmt" / "in"),
            store_dir=str(TMP / "fmt" / "store"),
            checkpoint_dir=str(TMP / "fmt" / "ckpt"),
            k=3, w=3, threshold=0.3, index_buckets=2, compact_every=1,
        )
        ws_re._process(spark.createDataFrame(DOCS[3:5], schema), 1)
        # width change: rewrite the marker as a foreign format (drop
        # the checksum sidecar — the POSIX rewrite stales it; a real
        # old build writes through the Hadoop FS with a valid crc)
        marker.write_text("winnow-h32-v0")
        (marker.parent / f".{marker.name}.crc").unlink(missing_ok=True)
        ws_bad = WinnowStream(
            spark=spark,
            input_dir=str(TMP / "fmt" / "in"),
            store_dir=str(TMP / "fmt" / "store"),
            checkpoint_dir=str(TMP / "fmt" / "ckpt"),
            k=3, w=3, threshold=0.3, index_buckets=2,
        )
        with pytest.raises(WinnowHashFormatError, match="winnow-h32-v0"):
            ws_bad._process(spark.createDataFrame(DOCS[5:6], schema), 2)
        # pre-marker store: committed index data, no marker at all
        marker.unlink()
        with pytest.raises(WinnowHashFormatError, match="predates"):
            ensure_hash_format(ws_bad.store)
        shutil.rmtree(TMP / "fmt", ignore_errors=True)

    def test_supersede_through_pruned_compacted_side(self, spark):
        """The summary prune must compose with LWW replacement: stale
        compacted rows of a re-ingested doc sit in buckets the bloom
        MARKS AS HITS (their h values are the probe's own), yet the
        tail-ids anti-join must still suppress them — no pair against
        a superseded version."""
        schema = "doc_id bigint, text string"
        ws = self._stream(spark, True, "bloomlww")
        v1 = (1, BASE + " one two three")
        v2 = (1, "rewritten body with completely new vocabulary all over")
        probe = (30, BASE + " one two seven")
        ws._process(spark.createDataFrame([v1], schema), 0)   # compacted
        ws._process(spark.createDataFrame([v2], schema), 1)   # compacted
        # disable the cadence so v2's replacement… is already folded;
        # feed the probe as a TAIL batch against the summarized store
        ws.compact_every = None
        ws._process(spark.createDataFrame([probe], schema), 2)
        got = {
            (r.id1, r.id2) for r in ws.pairs().collect()
            if 30 in (r.id1, r.id2)
        }
        assert got == set()
        shutil.rmtree(TMP / "bloomlww", ignore_errors=True)

    def test_plane_positions_py_matches_spark(self, spark):
        """The driver-side position replica must be bit-for-bit the
        Spark expression (the literal point probe depends on it — a
        drifted position would silently skip buckets holding real
        matches).  Differential over sign, magnitude and zero."""
        from datayours_spark.streaming.winnowstream import (
            _plane_positions,
            _plane_positions_py,
        )

        hs = [
            0, 1, -1, 62, 63, 7919, -7919,
            2**59, -(2**59), (1 << 60) - 1, -(1 << 60),
        ]
        m_p, planes = 63 * 17, 8
        got = {
            r["h"]: list(r["pos"])
            for r in spark.createDataFrame([(h,) for h in hs], "h bigint")
            .select("h", _plane_positions(m_p, planes).alias("pos"))
            .collect()
        }
        for h in hs:
            assert got[h] == _plane_positions_py(h, m_p, planes), h

    def test_summary_words_values_and_single_exchange(self, spark):
        """r12 verdict #2: the bitmap build runs off ONE hb-clustering
        exchange — the dedup and the (hb, word) bit_or fold both run
        partition-locally behind it, so the positions explode is never
        shuffled and every hash map is bounded by one bucket's key
        space.  Values must equal the naive global-distinct recompute
        (bit_or is order-independent)."""
        from datayours_spark.streaming.winnowstream import (
            _plane_positions,
            _with_hb,
            summary_words,
        )

        m_p, planes, buckets = 63 * 9, 8, 4
        # duplicate rows on purpose: summary_words must dedup internally
        fp = spark.createDataFrame(
            [((i * 2654435761) % 1000003 - 500000,)
             for i in range(400)] * 2,
            "h bigint",
        )
        words = summary_words(fp, buckets, m_p, planes)
        naive = (
            _with_hb(fp.select("h").distinct(), buckets)
            .select(
                "hb", F.explode(_plane_positions(m_p, planes)).alias("p")
            )
            .select(
                "hb",
                F.expr("p div 63").alias("word"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 63) AS INT))"
                ).alias("bit"),
            )
            .groupBy("hb", "word")
            .agg(F.expr("bit_or(bit)").alias("bits"))
        )
        assert {tuple(r) for r in words.collect()} == {
            tuple(r) for r in naive.collect()
        }
        # after execution an AQE plan's toString repeats the tree under
        # an "Initial Plan" section — count the final section only
        plan = (
            words._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0]
        )
        shuffles = [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        ]
        assert len(shuffles) == 1, plan
        assert "Exchange rangepartitioning" not in plan, plan

    def test_literal_verdict_semantics(self, spark):
        """summary_verdict_literal: present h ALL survive (no false
        negatives), fully-fresh h are all dropped (deterministic at
        this fixture's fpp), the hit-bucket set matches the survivors'
        hb values, and a stale summary (index watermark moved without
        a rebuild) returns None — never a misapplied verdict."""
        from datayours_spark.streaming.winnowstream import (
            summary_verdict_literal,
        )

        schema = "doc_id bigint, text string"
        ws = self._stream(spark, True, "bloomlit")
        ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
        present_h = [
            r["h"]
            for r in winnow_fingerprints(
                spark.createDataFrame([DOCS[0]], schema), k=3, w=3
            ).select("h").distinct().collect()
        ]
        v = summary_verdict_literal(ws.store, present_h, 2)
        assert v is not None
        surv, hit = v
        assert sorted(surv) == sorted(present_h)
        assert set(hit) == {h % 2 for h in present_h}
        fresh_h = [
            r["h"]
            for r in winnow_fingerprints(
                spark.createDataFrame(
                    [
                        (40, "volcano quartz ribbon lantern meadow "
                             "sparrow velvet"),
                        (41, "granite whisper copper twilight harbor "
                             "ember thistle"),
                    ],
                    schema,
                ),
                k=3, w=3,
            ).select("h").distinct().collect()
        ]
        sv, sh = summary_verdict_literal(ws.store, fresh_h, 2)
        assert sv == [] and sh == []
        assert summary_verdict_literal(ws.store, [], 2) == ([], [])
        # stale summary: watermark moves without a rebuild → None
        ws.summary_prune = False
        ws._process(
            spark.createDataFrame([(42, "totally new island body")],
                                  schema),
            1,
        )
        assert ws.store.watermark("index") == 1
        assert summary_verdict_literal(ws.store, present_h, 2) is None
        shutil.rmtree(TMP / "bloomlit", ignore_errors=True)

    def test_fresh_trickle_drops_compacted_scan_pairs_identical(
        self, spark
    ):
        """The point-probe prune end-to-end (r12 verdict #3): under
        summary_prune a literal-mode trickle batch consults the bloom
        driver-side; an all-fresh trickle's pair plan loses the
        compacted parquet scan ENTIRELY, and across a fresh-then-copy
        batch sequence the pairs table is byte-identical with the
        prune on and off (the verdict is an exact rewrite)."""
        from datayours_spark.streaming.winnowstream import (
            standing_index_view,
            summary_verdict_literal,
        )

        schema = "doc_id bigint, text string"
        fresh = [(60, "volcano quartz ribbon lantern meadow sparrow "
                      "velvet")]
        copy = (61, BASE + " one two eight")
        got = {}
        for prune in (False, True):
            ws = self._stream(spark, prune, f"bloomtrk{prune}")
            ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
            ws._process(spark.createDataFrame(fresh, schema), 1)
            ws._process(spark.createDataFrame([copy], schema), 2)
            got[prune] = {tuple(r) for r in ws.pairs().collect()}
            if prune:
                # plan-level: an all-fresh literal probe empties the
                # compacted side — no parquet scan survives in the
                # standing view (the tail is empty at compact_every=1)
                # probe with NEVER-ingested text (doc 60's own h are
                # in the compacted index by now and must read present)
                fresh_h = [
                    r["h"]
                    for r in winnow_fingerprints(
                        spark.createDataFrame(
                            [(99, "granite whisper copper twilight "
                                  "harbor ember thistle")],
                            schema,
                        ),
                        k=3, w=3,
                    ).select("h").distinct().collect()
                ]
                ch, hb = summary_verdict_literal(ws.store, fresh_h, 2)
                assert ch == []
                view = standing_index_view(
                    ws.store,
                    None,
                    2,
                    bks=sorted({h % 2 for h in fresh_h}),
                    hit_bks=hb,
                    batch_h=fresh_h,
                    comp_h=ch,
                )
                plan = (
                    view._jdf.queryExecution().executedPlan().toString()
                )
                assert "Scan parquet" not in plan, plan
            shutil.rmtree(TMP / f"bloomtrk{prune}", ignore_errors=True)
        assert got[True] == got[False]
        assert any(61 in (a, b) for a, b, *_ in got[True])

    def test_auto_policy_gates_bulk_probe_by_index_size(
        self, spark, monkeypatch
    ):
        """summary_prune="auto" (r13, point gate added r15): the
        summary is maintained, and BOTH probes engage only once the
        summary header's per-plane width says the index is past their
        measured cost-crossovers (the point probe's cost is
        corpus-size-independent but its savings are index-sized, r14
        verdict #6) — and pair output is identical to both fixed modes
        (the policy only toggles exact rewrites)."""
        import datayours_spark.streaming.winnowstream as wsmod

        schema = "doc_id bigint, text string"
        fresh = [(40, "volcano quartz ribbon lantern meadow sparrow "
                      "velvet")]
        copy = (50, BASE + " one two nine")
        got = {}
        for prune in (False, "auto"):
            ws = self._stream(spark, prune, f"bloomauto{prune}")
            ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
            ws._process(
                spark.createDataFrame(fresh + [copy], schema), 1
            )
            got[prune] = {tuple(r) for r in ws.pairs().collect()}
            if prune == "auto":
                # the summary IS maintained under auto (truthy flag)
                assert wsmod._summary_relation(ws.store) is not None
                # tiny store: neither probe wanted under auto, both
                # wanted under True, never under False
                for wanted in (
                    wsmod.bulk_probe_wanted, wsmod.point_probe_wanted
                ):
                    assert wanted(ws.store, "auto") is False
                    assert wanted(ws.store, True) is True
                    assert wanted(ws.store, False) is False
                # past the crossovers the auto gates open
                monkeypatch.setattr(wsmod, "AUTO_BULK_MIN_M_P", 1)
                monkeypatch.setattr(wsmod, "AUTO_POINT_MIN_M_P", 1)
                assert wsmod.bulk_probe_wanted(ws.store, "auto") is True
                assert wsmod.point_probe_wanted(ws.store, "auto") is True
            shutil.rmtree(TMP / f"bloomauto{prune}", ignore_errors=True)
        assert got["auto"] == got[False]
        assert any(50 in (a, b) for a, b, *_ in got["auto"])

    def test_summary_prune_validated_at_construction(self, spark):
        """ADVICE r13: any value outside {True, False, "auto"} raises at
        construction — a truthy typo like "always" would otherwise run a
        surprising literal-probe-only hybrid instead of an error."""
        import pytest

        from datayours_spark.streaming.pipeline import IngestPipeline

        for bad in ("always", "Auto", 1, "true"):
            with pytest.raises(ValueError, match="summary_prune"):
                WinnowStream(
                    spark=spark, input_dir="x", store_dir="y",
                    checkpoint_dir="z", summary_prune=bad,
                )
            with pytest.raises(ValueError, match="summary_prune"):
                IngestPipeline(
                    spark=spark, input_dir="x", store_dir="y",
                    checkpoint_dir="z", summary_prune=bad,
                )
        # the three legal values construct fine
        for ok in (True, False, "auto"):
            WinnowStream(
                spark=spark, input_dir="x", store_dir="y",
                checkpoint_dir="z", summary_prune=ok,
            )

    def test_scalar_cache_capped(self, spark):
        """ADVICE r13: the header memo cache wholesale-clears at 256
        entries (same lifecycle as _df_cache) — a long-lived stream must
        not accrete one heavy DataFrame-holding entry per compaction."""
        import datayours_spark.streaming.winnowstream as wsmod

        schema = "doc_id bigint, text string"
        ws = self._stream(spark, True, "scalarcap")
        ws._process(spark.createDataFrame(DOCS[:3], schema), 0)
        store = ws.store
        assert wsmod._summary_relation(store) is not None
        # simulate 256 accumulated memo entries: the next insert clears
        store._scalar_cache.update(
            {("pad", i): None for i in range(256)}
        )
        store._scalar_cache.pop(
            next(k for k in store._scalar_cache if k[0] == "summary_head"),
            None,
        )
        assert len(store._scalar_cache) >= 256
        assert wsmod._summary_relation(store) is not None
        assert len(store._scalar_cache) == 1  # cleared, then one memo
        shutil.rmtree(TMP / "scalarcap", ignore_errors=True)
