"""Similarity/ANN operator tests: determinism and golden behavior."""

import pytest
from pyspark.sql import functions as F

from datayours_spark.functions.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
    lsh_buckets,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    from datayours_spark.io import load_table

    return load_table(spark, SF_DIR, "embeddings")


class TestKmeansDeterminism:
    def test_partition_layout_invariant(self, spark):
        """The rounded-arithmetic contract: identical centroids no matter
        how the input is partitioned — float summation-order differences
        stay below the 6-dp mean rounding, so a cluster-size change can
        never alter the result (the property the DuckDB oracle relies on)."""
        emb = _emb(spark)
        c1 = {
            r["centroid_id"]: r["cv"]
            for r in kmeans_centroids(emb, k=4, iters=2).collect()
        }
        c2 = {
            r["centroid_id"]: r["cv"]
            for r in kmeans_centroids(emb.repartition(7), k=4, iters=2).collect()
        }
        assert c1 == c2
        assert len(c1) == 4

    def test_seed_changes_init(self, spark):
        emb = _emb(spark)
        a = kmeans_centroids(emb, k=4, iters=1, seed=42).collect()
        b = kmeans_centroids(emb, k=4, iters=1, seed=43).collect()
        assert {tuple(r["cv"]) for r in a} != {tuple(r["cv"]) for r in b}

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # two far groups, k=3: one centroid inevitably ends up unassigned
        # after the first step and must survive with its init vector
        rows = [(i, [0.0, 0.0, 1.0]) for i in range(5)]
        rows += [(i, [1.0, 1.0, 0.0]) for i in range(5, 10)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        cent = kmeans_centroids(emb, k=3, iters=2).collect()
        assert len(cent) == 3  # nobody vanished
        assert all(r["cnorm"] > 0 for r in cent)


class TestTopK:
    def test_cosine_topk_excludes_self_and_ranks(self, spark):
        emb = _emb(spark)
        out = cosine_topk(emb, query_ids=[0, 1], k=3).collect()
        by_q = {}
        for r in out:
            assert r["vec_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["sim"]))
        for q, rows in by_q.items():
            rows.sort()
            assert [rk for rk, _ in rows] == [1, 2, 3]
            sims = [s for _, s in rows]
            assert sims == sorted(sims, reverse=True)

    def test_ivf_probe_subset_of_brute_force_candidates(self, spark):
        """IVF with a learned quantizer returns ranks over ONE cluster's
        candidates — every returned neighbour must appear in the brute-force
        ordering with sim equal to the exact cosine."""
        emb = _emb(spark)
        cent = kmeans_centroids(emb, k=4, iters=2)
        ivf = ivf_topk(emb, [0], 5, centroids=cent).collect()
        brute = {
            r["vec_id"]: r["sim"]
            for r in cosine_topk(emb, [0], 500).collect()
        }
        assert ivf
        for r in ivf:
            assert brute[r["vec_id"]] == r["sim"]

    def test_nprobe_all_clusters_is_exact_brute_force(self, spark):
        """nprobe = n_clusters probes every inverted list, so the result
        must be IDENTICAL to the exact cosine top-k — the graceful
        degradation end of the recall/cost dial."""
        emb = _emb(spark)
        cent = kmeans_centroids(emb, k=4, iters=1)
        ivf = {
            (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
            for r in ivf_topk(
                emb, [0, 1], 5, centroids=cent, nprobe=4
            ).collect()
        }
        brute = {
            (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
            for r in cosine_topk(emb, [0, 1], 5).collect()
        }
        assert ivf == brute

    def test_nprobe_recall_is_monotone(self, spark):
        """Probing more lists can only improve (or tie) the neighbours at
        every rank: sims at nprobe=2 dominate nprobe=1, and both are lower
        bounds on exact."""
        emb = _emb(spark)
        cent = kmeans_centroids(emb, k=4, iters=1)

        def sims(nprobe):
            rows = ivf_topk(
                emb, [0], 5, centroids=cent, nprobe=nprobe
            ).collect()
            return [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]

        s1, s2 = sims(1), sims(2)
        exact = [
            r["sim"]
            for r in sorted(
                cosine_topk(emb, [0], 5).collect(), key=lambda r: r["rank"]
            )
        ]
        for a, b in zip(s1, s2):
            assert b >= a
        for b, e in zip(s2, exact):
            assert e >= b

    def test_ivf_assign_broadcast_no_shuffle_on_vectors(self, spark):
        import contextlib
        import io

        emb = _emb(spark)
        cent = kmeans_centroids(emb, k=4, iters=1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ivf_assign(emb, cent).explain("formatted")
        assert "BroadcastNestedLoopJoin" in buf.getvalue()


class TestLshBuckets:
    def test_metadata_dim_matches_explicit(self, spark):
        from datayours_spark.functions.similarity import with_embedding_dim

        emb = _emb(spark)
        a = {
            r["vec_id"]: r["bucket"]
            for r in lsh_buckets(with_embedding_dim(emb, 64), 6).collect()
        }
        b = {
            r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, 6, dim=64).collect()
        }
        assert a == b

    def test_unknown_dim_raises_not_probes(self, spark):
        import pytest

        with pytest.raises(ValueError, match="embedding width unknown"):
            lsh_buckets(_emb(spark), 6)

    def test_plan_build_runs_no_spark_job(self, spark):
        # The old implicit .first() probe ran a job at plan-build time; now
        # building the bucket plan (dim explicit or via metadata) must not
        # touch the cluster before the caller's first action.
        from datayours_spark.functions.similarity import with_embedding_dim

        emb = _emb(spark)  # reading parquet may run listing jobs; not under test
        sc = spark.sparkContext
        sc.setJobGroup("lsh-plan-build", "plan construction must be lazy")
        try:
            lsh_buckets(emb, 6, dim=64)
            lsh_buckets(with_embedding_dim(emb, 64), 6)
            jobs = sc.statusTracker().getJobIdsForGroup("lsh-plan-build")
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        assert list(jobs) == []

    def test_buckets_partition_invariant(self, spark):
        emb = _emb(spark)
        a = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, 8, dim=64).collect()}
        b = {
            r["vec_id"]: r["bucket"]
            for r in lsh_buckets(emb.repartition(5), 8, dim=64).collect()
        }
        assert a == b


class TestIvfPq:
    def _emb(self, spark, n=60, dim=8, seed=7):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def test_codebook_shape_and_determinism(self, spark):
        from datayours_spark.functions.similarity import pq_codebooks

        emb = self._emb(spark)
        b1 = pq_codebooks(emb, m=2, ks=4, iters=2, dim=8)
        b2 = pq_codebooks(emb, m=2, ks=4, iters=2, dim=8)
        assert b1 == b2  # bit-identical across runs (the oracle contract)
        assert len(b1) == 2 and all(len(book) == 4 for book in b1)
        assert all(len(cv) == 4 for book in b1 for _, cv in book)
        # code ids are 0..ks-1 per subspace
        assert [cid for cid, _ in b1[0]] == [0, 1, 2, 3]

    def test_dim_must_divide(self, spark):
        import pytest as _pytest

        from datayours_spark.functions.similarity import pq_codebooks

        with _pytest.raises(ValueError, match="not divisible"):
            pq_codebooks(self._emb(spark), m=3, ks=4, iters=1, dim=8)

    def test_encode_codes_in_range_one_row_per_vector(self, spark):
        from datayours_spark.functions.similarity import pq_codebooks, pq_encode

        emb = self._emb(spark)
        books = pq_codebooks(emb, m=2, ks=4, iters=2, dim=8)
        rows = pq_encode(emb, books, 8).collect()
        assert len(rows) == 60
        for r in rows:
            assert len(r["codes"]) == 2
            assert all(0 <= c < 4 for c in r["codes"])
            assert r["nrm"] > 0

    def test_adc_approximates_exact_cosine_ranking(self, spark):
        """With ks as large as the corpus is diverse, ADC top-k should
        substantially overlap the exact cosine top-k — the recall sanity
        check (exactness is the oracle's job; this guards against a
        broken lookup/sum wiring that would still be self-consistent)."""
        from datayours_spark.functions.similarity import (
            cosine_topk,
            ivfpq_topk,
            kmeans_centroids,
            pq_codebooks,
        )

        emb = self._emb(spark, n=80)
        cent = kmeans_centroids(emb, k=1, iters=1)  # one cluster: no IVF loss
        books = pq_codebooks(emb, m=2, ks=16, iters=2, dim=8)
        approx = ivfpq_topk(emb, [0, 1], 10, cent, books, 8)
        exact = cosine_topk(emb, [0, 1], 10)
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        assert len(a & e) >= 10  # >=50% overlap across the 2x10 pairs


class TestResidualIvfPq:
    def _emb(self, spark, n=80, dim=8, seed=11):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def test_residuals_subtract_assigned_centroid(self, spark):
        from datayours_spark.functions.similarity import (
            ivf_assign,
            kmeans_centroids,
            residual_vectors,
        )

        emb = self._emb(spark)
        cent = kmeans_centroids(emb, k=4, iters=2)
        cents = {r["centroid_id"]: r["cv"] for r in cent.collect()}
        assign = {r["vec_id"]: r["cluster"] for r in ivf_assign(emb, cent).collect()}
        orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
        res = {
            r["vec_id"]: r["embedding"]
            for r in residual_vectors(emb, cent).collect()
        }
        assert set(res) == set(orig)
        for vid, rv in res.items():
            cv = cents[assign[vid]]
            for a, b, c in zip(rv, orig[vid], cv):
                assert a == b - c  # exact IEEE subtraction, no rounding

    def test_residual_adc_ranks_against_exact(self, spark):
        """With one coarse cluster and a rich codebook, residual ADC top-k
        must substantially overlap exact cosine top-k (wiring sanity; the
        oracle owns exactness)."""
        from datayours_spark.functions.similarity import (
            cosine_topk,
            ivfpq_residual_topk,
            kmeans_centroids,
        )

        emb = self._emb(spark)
        cent = kmeans_centroids(emb, k=1, iters=1)
        approx = ivfpq_residual_topk(
            emb, [0, 1], 10, cent, m=2, ks=16, iters=2, seed=42, dim=8
        )
        exact = cosine_topk(emb, [0, 1], 10)
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        assert len(a & e) >= 10


class TestSemdedup:
    def _docs(self, spark):
        # cluster A around e1: three near-copies + one distinct; cluster B
        # around e2: two orthogonal-ish members (no dups)
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-copy of 0
            (2, [0.998, -0.02, 0.0, 0.0]),  # near-copy of 0/1
            (3, [0.6, 0.6, 0.0, 0.0]),      # same cluster, not a dup at 0.99
            (4, [0.0, 0.0, 1.0, 0.0]),
            (5, [0.0, 0.0, 0.0, 1.0]),
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def test_keep_lowest_marks_later_copies(self, spark):
        from datayours_spark.functions.similarity import kmeans_centroids, semdedup

        emb = self._docs(spark)
        cent = kmeans_centroids(emb, k=2, iters=2)
        out = {r["vec_id"]: r["is_dup"] for r in semdedup(emb, cent, tau=0.99).collect()}
        assert len(out) == 6                       # one row per input vector
        assert out[0] is False                     # lowest id of the dup group survives
        assert out[1] is True and out[2] is True   # later near-copies flagged
        assert out[3] is False                     # same cluster but below tau

    def test_max_cluster_guard(self, spark):
        import pytest

        from datayours_spark.functions.similarity import (
            SemdedupClusterTooLarge,
            kmeans_centroids,
            semdedup,
        )

        emb = self._docs(spark)
        cent = kmeans_centroids(emb, k=1, iters=1)  # everything in one cluster
        with pytest.raises(SemdedupClusterTooLarge):
            semdedup(emb, cent, tau=0.99, max_cluster=3).collect()

    def test_assignment_injection_matches(self, spark):
        from datayours_spark.functions.similarity import (
            ivf_assign,
            kmeans_centroids,
            semdedup,
        )

        emb = self._docs(spark)
        cent = kmeans_centroids(emb, k=2, iters=2)
        a = semdedup(emb, cent, tau=0.99).collect()
        b = semdedup(
            emb, cent, tau=0.99, assignments=ivf_assign(emb, cent)
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestIvfpqRerank:
    def test_rerank_sims_are_exact_cosine(self, spark):
        """Stage-2 sims must equal brute-force cosine for the same pairs
        (re-rank reads full vectors, not codes) and with one coarse
        cluster + a generous shortlist the top-k matches exact search."""
        from datayours_spark.functions.similarity import (
            cosine_topk,
            ivfpq_rerank_topk,
            kmeans_centroids,
            pq_codebooks,
        )
        from datayours_spark.io import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        dim = len(emb.select("embedding").first()[0])
        cent = kmeans_centroids(emb, k=1, iters=1)
        books = pq_codebooks(emb, m=2, ks=16, iters=2, seed=42, dim=dim)
        rer = ivfpq_rerank_topk(
            emb, [0, 1], 5, cent, books, dim,
            shortlist=emb.count(),  # full shortlist -> must equal exact
        )
        exact = cosine_topk(emb, [0, 1], 5)
        assert sorted(map(tuple, rer.collect())) == sorted(
            map(tuple, exact.collect())
        )


class TestCosineNeardupGuard:
    """Hot-bucket guard for cosine_neardup (round-5 verdict item #2):
    identical vectors collapse to one representative before the bucket
    self-join, with fail-fasts mirroring dedup.py's ExpandedPairsTooLarge."""

    def _dup_heavy(self, spark):
        # 3 identical-vector groups (widths 6/4/2) + singletons, incl. a
        # near-dup cross-group pair and an orthogonal outlier
        rows = []
        for i in range(6):
            rows.append((i, [1.0, 2.0, 3.0, 4.0]))          # group A
        for i in range(6, 10):
            rows.append((i, [1.0, 2.0, 3.0, 4.1]))          # group B (~A)
        for i in range(10, 12):
            rows.append((i, [-1.0, -2.0, -3.0, -4.0]))      # group C (anti-A)
        rows.append((12, [4.0, -3.0, 2.0, -1.0]))           # lone, orthogonal-ish
        rows.append((13, [0.9, 2.1, 3.0, 4.0]))             # lone near A
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )

    def test_guarded_equals_naive_pair_set(self, spark):
        """The exactness proof, checked: guarded output == naive output
        on a duplicate-heavy corpus (same ids, same rounded sims)."""
        from datayours_spark.functions.similarity import cosine_neardup

        emb = self._dup_heavy(spark)
        kw = dict(n_planes=4, threshold=0.25, dim=4)
        naive = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(
                emb, collapse_identical=False, **kw
            ).collect()
        }
        guarded = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(emb, **kw).collect()
        }
        assert guarded == naive
        # sanity: intra-group pairs actually present (6 choose 2 from A)
        assert sum(1 for (a, b) in guarded if a < 6 and b < 6) == 15

    def test_zero_vector_pairs_drop(self, spark):
        """Pin the zero-vector edge: cosine uses try_divide, so a zero
        norm yields NULL sim (NOT NaN, and NOT an ANSI DIVIDE_BY_ZERO
        job-kill — under Spark 4's default ANSI mode a plain division
        here crashed the whole job for one bad row) and identical
        zero-vector pairs are dropped by the sim >= threshold filter —
        identically on the guarded and naive paths (ADVICE r6: the
        docstring previously claimed NaN)."""
        from datayours_spark.functions.similarity import (
            cosine_collapse_index, cosine_neardup,
        )

        rows = [(0, [0.0] * 4), (1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0]),
                (3, [1.0, 0.0, 0.0, 0.0])]
        emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        kw = dict(n_planes=2, threshold=0.5, dim=4)
        for collapse in (True, False):
            pairs = {
                (r["id1"], r["id2"])
                for r in cosine_neardup(
                    emb, collapse_identical=collapse, **kw
                ).collect()
            }
            # the identical non-zero pair survives; zero-vector pair drops
            assert (2, 3) in pairs, collapse
            assert (0, 1) not in pairs, collapse
        # and the collapsed index records NULL (not NaN) self_sim for the
        # zero group, 1.0 for the non-zero group
        members, _ = cosine_collapse_index(emb, n_planes=2, dim=4)
        sims = {r["vec_id"]: r["self_sim"] for r in members.collect()}
        assert sims[0] is None and sims[1] is None
        assert sims[2] == 1.0 and sims[3] == 1.0

    def test_guarded_equals_naive_on_real_embeddings(self, spark):
        """Same differential on the fixture embeddings table (no planted
        structure — exercises the no-duplicates-at-all path)."""
        from datayours_spark.functions.similarity import cosine_neardup

        emb = _emb(spark).limit(120)
        dim = len(emb.select("embedding").first()[0])
        kw = dict(n_planes=5, threshold=0.3, dim=dim)
        naive = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(
                emb, collapse_identical=False, **kw
            ).collect()
        }
        guarded = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(emb, **kw).collect()
        }
        assert guarded == naive

    def test_expansion_fail_fast_on_wide_group(self, spark):
        """A 30%-boilerplate corpus (one wide identical group) must refuse
        the quadratic expansion BEFORE doing it."""
        import pytest

        from datayours_spark.functions.dedup import ExpandedPairsTooLarge
        from datayours_spark.functions.similarity import cosine_neardup

        rows = [(i, [1.0, 0.0, 0.0, 2.0]) for i in range(30)]
        rows += [(100 + i, [float(i), 1.0, -1.0, 0.5]) for i in range(70)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(ExpandedPairsTooLarge, match="identical-vector"):
            cosine_neardup(emb, n_planes=4, dim=4, max_group=10).collect()

    def test_hot_bucket_fail_fast(self, spark):
        import pytest

        from datayours_spark.functions.similarity import (
            HotBucketPairsTooLarge,
            cosine_neardup,
        )

        # 40 DISTINCT near-parallel vectors land in one bucket
        rows = [(i, [1.0, 1.0, 1.0, 1.0 + i * 1e-4]) for i in range(40)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(HotBucketPairsTooLarge, match="candidate pairs"):
            cosine_neardup(emb, n_planes=4, dim=4, max_bucket_pairs=100).collect()

    def test_collapsed_form_is_linear_plus_pairs(self, spark):
        """members has one row per vector with rep = least id of its
        identical-vector group; rep_pairs only relates representatives."""
        from datayours_spark.functions.similarity import (
            cosine_neardup_collapsed,
        )

        emb = self._dup_heavy(spark)
        members, rep_pairs = cosine_neardup_collapsed(
            emb, n_planes=4, threshold=0.25, dim=4
        )
        m = {r["vec_id"]: r["rep"] for r in members.collect()}
        assert len(m) == 14
        assert all(m[i] == 0 for i in range(6))
        assert all(m[i] == 6 for i in range(6, 10))
        assert all(m[i] == 10 for i in range(10, 12))
        reps = set(m.values())
        for r in rep_pairs.collect():
            assert r["id1"] in reps and r["id2"] in reps


class TestTrainingExecConfScoping:
    """r5 verdict task #6: interleaved training scopes must restore the
    original confs no matter the exit order."""

    def test_interleaved_scopes_restore_original(self, spark):
        from datayours_spark.functions.similarity import _training_exec_conf

        orig_ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
        a = _training_exec_conf(spark, 10)
        b = _training_exec_conf(spark, 10)
        a.__enter__()
        assert spark.conf.get("spark.sql.codegen.wholeStage") == "false"
        b.__enter__()
        a.__exit__(None, None, None)  # inner-first exit order is NOT required
        # b is still training: confs must stay disabled, not restored
        assert spark.conf.get("spark.sql.codegen.wholeStage") == "false"
        b.__exit__(None, None, None)
        assert spark.conf.get("spark.sql.codegen.wholeStage") == orig_ws
        assert spark.conf.get("spark.sql.codegen.factoryMode") == "FALLBACK"

    def test_concurrent_threads_restore_original(self, spark):
        import threading as th

        from datayours_spark.functions.similarity import _training_exec_conf

        orig_ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
        enter_b = th.Event()
        exit_a = th.Event()
        done_b = th.Event()

        def worker():
            with _training_exec_conf(spark, 10):
                enter_b.set()
                exit_a.wait(10)
            done_b.set()

        t = th.Thread(target=worker)
        with _training_exec_conf(spark, 10):
            t.start()
            assert enter_b.wait(10)
        exit_a.set()  # outer exited first; worker still inside
        assert done_b.wait(10)
        t.join(10)
        assert spark.conf.get("spark.sql.codegen.wholeStage") == orig_ws


class TestCosineNeardupIncremental:
    """Incremental == full recompute restricted to pairs touching the
    batch (the same differential contract minhash_incremental and
    repeated_spans_incremental carry)."""

    def _corpus(self, spark):
        rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(4)]          # group
        rows += [(i, [1.0, 2.0, 3.0, 4.1]) for i in range(4, 6)]      # near
        rows += [(i, [-4.0, 3.0, -2.0, 1.0]) for i in range(6, 8)]    # far
        rows.append((8, [0.5, 0.5, 0.5, 0.5]))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def _batch(self, spark):
        rows = [
            (100, [1.0, 2.0, 3.0, 4.0]),   # identical to the standing group
            (101, [1.0, 2.0, 3.0, 4.0]),   # identical within the batch too
            (102, [1.0, 2.1, 3.0, 4.0]),   # near the group
            (103, [9.0, -9.0, 9.0, -9.0]), # unrelated
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def test_incremental_equals_full_restricted(self, spark):
        from datayours_spark.functions.similarity import (
            cosine_collapse_index,
            cosine_neardup,
            cosine_neardup_incremental,
        )

        corpus, batch = self._corpus(spark), self._batch(spark)
        kw = dict(n_planes=4, threshold=0.25, dim=4)
        full = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(corpus.unionByName(batch), **kw).collect()
        }
        want = {k: v for k, v in full.items() if k[0] >= 100 or k[1] >= 100}
        members, reps = cosine_collapse_index(corpus, 4, dim=4)
        got = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup_incremental(
                batch, members, reps, **kw
            ).collect()
        }
        assert got == want
        assert want, "fixture must actually produce new-batch pairs"
        # the identical-to-standing-group path really fired
        assert (0, 100) in got and got[(0, 100)] == 1.0

    def test_batch_guard_trips_on_wide_standing_group(self, spark):
        import pytest

        from datayours_spark.functions.dedup import ExpandedPairsTooLarge
        from datayours_spark.functions.similarity import (
            cosine_collapse_index,
            cosine_neardup_incremental,
        )

        wide = spark.createDataFrame(
            [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(30)],
            "vec_id bigint, embedding array<double>",
        )
        members, reps = cosine_collapse_index(wide, 4, dim=4)
        with pytest.raises(ExpandedPairsTooLarge, match="standing"):
            cosine_neardup_incremental(
                self._batch(spark), members, reps, n_planes=4, dim=4,
                max_group=10,
            ).collect()


class TestCosineNeardupBanded:
    """OR-amplified banded LSH: any-band candidacy, exact-cosine verify,
    identical-vector collapse, recall >= the single-signature path."""

    def _naive_banded(self, spark, emb, n_planes, n_bands, threshold, dim):
        """Reference computation: per-band buckets via lsh-bucket math on
        the offset plane slices, any-band candidate union, exact cosine."""
        from datayours_spark.functions.similarity import (
            hyperplane_weight_py,
        )

        rows = emb.collect()
        import math

        def bucket(v, band):
            b = 0
            for j in range(n_planes):
                p = band * n_planes + j
                d = round(
                    sum(x * hyperplane_weight_py(p, k) for k, x in enumerate(v)),
                    9,
                )
                if d > 0:
                    b |= 1 << j
            return b

        out = {}
        for i, ri in enumerate(rows):
            for rj in rows[i + 1:]:
                a, b = (ri, rj) if ri["vec_id"] < rj["vec_id"] else (rj, ri)
                va, vb = a["embedding"], b["embedding"]
                if not any(
                    bucket(va, band) == bucket(vb, band)
                    for band in range(n_bands)
                ):
                    continue
                dp = sum(x * y for x, y in zip(va, vb))
                na = math.sqrt(sum(x * x for x in va))
                nb = math.sqrt(sum(x * x for x in vb))
                sim = round(dp / (na * nb), 4)
                if sim >= threshold:
                    out[(a["vec_id"], b["vec_id"])] = sim
        return out

    def test_banded_equals_naive_banded(self, spark):
        from datayours_spark.functions.similarity import cosine_neardup_banded

        emb = TestCosineNeardupGuard()._dup_heavy(spark)
        got = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup_banded(
                emb, n_planes=3, n_bands=3, threshold=0.25, dim=4
            ).collect()
        }
        want = self._naive_banded(spark, emb, 3, 3, 0.25, 4)
        assert got == want
        assert want, "fixture must produce banded pairs"

    def test_banded_recall_beats_single_signature(self, spark):
        """On the fixture embeddings, banding must recover at least as
        many true near-dup pairs (vs the brute-force ground truth) as
        ONE signature with the same total plane budget."""
        from datayours_spark.functions.similarity import (
            cosine_neardup,
            cosine_neardup_banded,
        )

        emb = _emb(spark).limit(150)
        dim = len(emb.select("embedding").first()[0])
        thr = 0.3
        # ground truth: all pairs >= thr (no blocking)
        import math

        rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
        truth = set()
        for i, (ia, va) in enumerate(rows):
            for ib, vb in rows[i + 1:]:
                dp = sum(x * y for x, y in zip(va, vb))
                s = dp / (
                    math.sqrt(sum(x * x for x in va))
                    * math.sqrt(sum(x * x for x in vb))
                )
                if round(s, 4) >= thr:
                    truth.add((min(ia, ib), max(ia, ib)))
        single = {
            (r["id1"], r["id2"])
            for r in cosine_neardup(
                emb, n_planes=12, threshold=thr, dim=dim
            ).collect()
        }
        banded = {
            (r["id1"], r["id2"])
            for r in cosine_neardup_banded(
                emb, n_planes=4, n_bands=3, threshold=thr, dim=dim
            ).collect()
        }
        assert truth, "fixture must have true near-dup pairs"
        assert banded <= truth and single <= truth  # no false positives
        assert len(banded & truth) >= len(single & truth)
        # with a 12-plane single signature recall should strictly improve
        assert len(banded & truth) > len(single & truth)

    def test_banded_guard_trips(self, spark):
        import pytest

        from datayours_spark.functions.dedup import ExpandedPairsTooLarge
        from datayours_spark.functions.similarity import (
            HotBucketPairsTooLarge,
            cosine_neardup_banded,
        )

        # 40 DISTINCT near-parallel vectors: one hot bucket PER BAND
        rows = [(i, [1.0, 1.0, 1.0, 1.0 + i * 1e-4]) for i in range(40)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(HotBucketPairsTooLarge, match="candidate pairs"):
            cosine_neardup_banded(
                emb, n_planes=3, n_bands=3, dim=4, max_bucket_pairs=100
            ).collect()
        wide = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]
            + [(100, [9.0, -9.0, 9.0, -9.0])],
            "vec_id bigint, embedding array<double>",
        )
        with pytest.raises(ExpandedPairsTooLarge, match="identical-vector"):
            cosine_neardup_banded(
                wide, n_planes=3, n_bands=3, dim=4, max_group=10
            ).collect()

    def test_banded_collapse_is_exact(self, spark):
        """Dup-heavy corpus: the collapsed banded path must equal the
        naive banded computation (collapse exactness under banding)."""
        from datayours_spark.functions.similarity import cosine_neardup_banded

        emb = TestCosineNeardupGuard()._dup_heavy(spark)
        got = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup_banded(
                emb, n_planes=2, n_bands=4, threshold=0.25, dim=4
            ).collect()
        }
        want = self._naive_banded(spark, emb, 2, 4, 0.25, 4)
        assert got == want


class TestSemdedupIncremental:
    """Incremental == full semdedup over (corpus ∪ batch) restricted to
    batch rows (the family differential contract), under a FROZEN
    corpus-trained quantizer."""

    def _corpus(self, spark, n=40, dim=6, seed=3):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )

    def test_incremental_equals_full_restricted(self, spark):
        from datayours_spark.functions.similarity import (
            ivf_assign,
            kmeans_centroids,
            semdedup,
            semdedup_incremental,
            semdedup_index,
        )

        corpus = self._corpus(spark)
        # batch: two exact copies of corpus vectors (must flag as dups),
        # one batch-internal dup pair, one unrelated vector
        src = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
        rows = [
            (100, src[3]), (101, src[7]),
            (102, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5]),
            (103, [0.5, 0.5, 0.5, 0.5, 0.5, 0.5]),
        ]
        batch = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        cent = kmeans_centroids(corpus, k=3, iters=2)
        tau = 0.9
        full = {
            r["vec_id"]: (r["cluster"], r["is_dup"])
            for r in semdedup(
                corpus.unionByName(batch), cent, tau=tau
            ).collect()
        }
        want = {k: v for k, v in full.items() if k >= 100}
        idx = semdedup_index(corpus, cent)
        got = {
            r["vec_id"]: (r["cluster"], r["is_dup"])
            for r in semdedup_incremental(batch, cent, idx, tau=tau).collect()
        }
        assert got == want
        # the copies really flagged; the batch-internal dup pair flagged
        # its higher id (103 has same-cluster lower-id 102 at sim 1.0)
        assert got[100][1] and got[101][1]
        assert got[103][1]
        # standing flags are untouched by construction: full over the
        # union agrees with corpus-only on every standing row
        standalone = {
            r["vec_id"]: r["is_dup"]
            for r in semdedup(corpus, cent, tau=tau).collect()
        }
        assert {k: v[1] for k, v in full.items() if k < 100} == standalone

    def test_guard_trips_on_touched_cluster(self, spark):
        import pytest

        from datayours_spark.functions.similarity import (
            SemdedupClusterTooLarge,
            kmeans_centroids,
            semdedup_incremental,
            semdedup_index,
        )

        corpus = self._corpus(spark, n=60)
        cent = kmeans_centroids(corpus, k=1, iters=1)  # ONE wide cluster
        idx = semdedup_index(corpus, cent)
        batch = spark.createDataFrame(
            [(200, [0.1] * 6)], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(SemdedupClusterTooLarge, match="touched standing"):
            semdedup_incremental(
                batch, cent, idx, tau=0.9, max_cluster=10
            ).collect()


class TestEmbeddingIncrementalDifferential:
    """Seeded randomized equivalence for the embedding incremental family:
    random corpora with planted identical groups and near-dup partners;
    the incremental operators must reproduce the full recompute's answer
    restricted to the batch, and the banded guarded path its naive
    computation, at every seed tried."""

    SEEDS = [5, 19, 31]

    def _emb_rows(self, rng, ids, dim=6, dup_pool=None):
        rows = []
        for i in ids:
            r = rng.random()
            if dup_pool and r < 0.3:
                v = list(rng.choice(dup_pool))          # exact duplicate
            elif dup_pool and r < 0.5:
                base = rng.choice(dup_pool)             # near-dup partner
                v = [round(x + rng.uniform(-0.02, 0.02), 3) for x in base]
            else:
                v = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
            rows.append((i, v))
        return rows

    @pytest.mark.parametrize("seed", SEEDS)
    def test_cosine_incremental_matches_full(self, spark, seed):
        import random

        from datayours_spark.functions.similarity import (
            cosine_collapse_index,
            cosine_neardup,
            cosine_neardup_incremental,
        )

        rng = random.Random(seed)
        pool = [
            tuple(round(rng.uniform(-1, 1), 3) for _ in range(6))
            for _ in range(4)
        ]
        corpus_rows = self._emb_rows(rng, range(30), dup_pool=pool)
        batch_rows = self._emb_rows(rng, range(100, 115), dup_pool=pool)
        schema = "vec_id bigint, embedding array<double>"
        corpus = spark.createDataFrame(corpus_rows, schema)
        batch = spark.createDataFrame(batch_rows, schema)
        kw = dict(n_planes=3, threshold=0.6, dim=6)
        full = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup(corpus.unionByName(batch), **kw).collect()
        }
        want = {k: v for k, v in full.items() if k[0] >= 100 or k[1] >= 100}
        members, reps = cosine_collapse_index(corpus, 3, dim=6)
        got = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup_incremental(
                batch, members, reps, **kw
            ).collect()
        }
        assert got == want

    @pytest.mark.parametrize("seed", SEEDS)
    def test_semdedup_incremental_matches_full(self, spark, seed):
        import random

        from datayours_spark.functions.similarity import (
            kmeans_centroids,
            semdedup,
            semdedup_incremental,
            semdedup_index,
        )

        rng = random.Random(seed)
        pool = [
            tuple(round(rng.uniform(-1, 1), 3) for _ in range(6))
            for _ in range(4)
        ]
        schema = "vec_id bigint, embedding array<double>"
        corpus = spark.createDataFrame(
            self._emb_rows(rng, range(30), dup_pool=pool), schema
        )
        batch = spark.createDataFrame(
            self._emb_rows(rng, range(100, 115), dup_pool=pool), schema
        )
        cent = kmeans_centroids(corpus, k=3, iters=2)
        tau = 0.95
        full = {
            r["vec_id"]: (r["cluster"], r["is_dup"])
            for r in semdedup(
                corpus.unionByName(batch), cent, tau=tau
            ).collect()
        }
        want = {k: v for k, v in full.items() if k >= 100}
        got = {
            r["vec_id"]: (r["cluster"], r["is_dup"])
            for r in semdedup_incremental(
                batch, cent, semdedup_index(corpus, cent), tau=tau
            ).collect()
        }
        assert got == want

    @pytest.mark.parametrize("seed", SEEDS)
    def test_banded_matches_naive(self, spark, seed):
        import random

        from datayours_spark.functions.similarity import cosine_neardup_banded

        rng = random.Random(seed)
        pool = [
            tuple(round(rng.uniform(-1, 1), 3) for _ in range(6))
            for _ in range(4)
        ]
        schema = "vec_id bigint, embedding array<double>"
        emb = spark.createDataFrame(
            self._emb_rows(rng, range(35), dup_pool=pool), schema
        )
        got = {
            (r["id1"], r["id2"]): r["sim"]
            for r in cosine_neardup_banded(
                emb, n_planes=2, n_bands=3, threshold=0.5, dim=6
            ).collect()
        }
        want = TestCosineNeardupBanded()._naive_banded(spark, emb, 2, 3, 0.5, 6)
        assert got == want


class TestSq8:
    """SQ8 scalar quantization: codec determinism, reconstruction error
    bound, constant-dimension handling, and search fidelity."""

    def _emb4(self, spark):
        rows = [
            (0, [0.0, -1.0, 5.0, 2.0]),
            (1, [1.0, 1.0, 5.0, 0.0]),
            (2, [0.5, 0.0, 5.0, 1.0]),      # dim 2 constant across corpus
            (3, [0.25, -0.5, 5.0, 1.5]),
        ]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def test_codes_in_range_and_constant_dim(self, spark):
        from datayours_spark.functions.similarity import sq_encode, sq_train

        emb = self._emb4(spark)
        bounds = sq_train(emb)
        assert bounds[2] == (5.0, 5.0)           # constant dim
        codes = {r.vec_id: r.codes for r in sq_encode(emb, bounds).collect()}
        for cs in codes.values():
            assert all(0 <= c <= 255 for c in cs)
            assert cs[2] == 0                    # constant dim codes to 0
        # extremes hit the rails exactly
        assert codes[0][1] == 0 and codes[1][1] == 255

    def test_reconstruction_error_bounded(self, spark):
        from datayours_spark.functions.similarity import sq_encode, sq_train

        import pyspark.sql.functions as F

        emb = self._emb4(spark)
        bounds = sq_train(emb)
        codes = sq_encode(emb, bounds)
        # decode in the test and compare: |x - xhat| <= span/255/2 per dim
        got = {r.vec_id: r.codes for r in codes.collect()}
        orig = {r.vec_id: r.embedding for r in emb.collect()}
        for vid, cs in got.items():
            for d, c in enumerate(cs):
                vmin, vmax = bounds[d]
                span = vmax - vmin
                xhat = vmin + c / 255.0 * span if span > 0 else vmin
                assert abs(orig[vid][d] - xhat) <= span / 255.0 / 2 + 1e-12

    def test_topk_matches_exact_on_fixture(self, spark):
        from datayours_spark.functions.similarity import cosine_topk, sq_topk

        emb = _emb(spark).limit(200)
        sq_rows = sq_topk(emb, [0, 1], 5).collect()
        ex_rows = cosine_topk(emb, [0, 1], 5).collect()
        sq_sets = {}
        ex_sets = {}
        for r in sq_rows:
            sq_sets.setdefault(r.query_id, set()).add(r.vec_id)
        for r in ex_rows:
            ex_sets.setdefault(r.query_id, set()).add(r.vec_id)
        sq_top1 = {r.query_id: r.vec_id for r in sq_rows if r.rank == 1}
        ex_top1 = {r.query_id: r.vec_id for r in ex_rows if r.rank == 1}
        # 8-bit reconstruction is near-exact: the top-1 must coincide and
        # the top-5 SETS must overlap >= 4/5 (near-ties at 4-dp rounding
        # may legitimately swap adjacent ranks — quantization is lossy)
        assert sq_top1 == ex_top1
        for q in ex_sets:
            assert len(sq_sets[q] & ex_sets[q]) >= 4, (q, sq_sets[q], ex_sets[q])

    def test_ivfsq_probe_all_matches_sq_bruteforce(self, spark):
        """nprobe = n_clusters degrades IVF-SQ to exactly sq_topk (same
        reconstruction, every inverted list probed) — the graceful-
        degradation invariant every IVF family member must keep."""
        from datayours_spark.functions.similarity import (
            ivfsq_topk, kmeans_centroids, sq_topk,
        )

        emb = _emb(spark).limit(150)
        cent = kmeans_centroids(emb, k=4, iters=1)
        ivfsq = {
            (r.query_id, r.rank): (r.vec_id, r.sim)
            for r in ivfsq_topk(
                emb, [0, 1], 5, centroids=cent, nprobe=4
            ).collect()
        }
        flat = {
            (r.query_id, r.rank): (r.vec_id, r.sim)
            for r in sq_topk(emb, [0, 1], 5).collect()
        }
        assert ivfsq == flat


class TestIvfAssignPruned:
    """The r8 hierarchical coarse-assignment build path (two-level
    super-centroid shortlist) for large-k regimes like semdedup_index."""

    def _fixture(self, spark):
        from datayours_spark.functions.similarity import kmeans_centroids

        emb = _emb(spark).limit(400)
        cent = kmeans_centroids(emb, k=16, iters=2)
        return emb, cent

    def test_full_probe_equals_exact(self, spark):
        """probe_supers >= s degrades gracefully to EXACT ivf_assign
        output — the invariant that pins the pruned path to the flat
        assignment contract."""
        from datayours_spark.functions.similarity import (
            ivf_assign, ivf_assign_pruned,
        )

        emb, cent = self._fixture(spark)
        exact = {(r.vec_id, r.cluster) for r in ivf_assign(emb, cent).collect()}
        # s = ceil(sqrt(16)) = 4; probe all 4 supers
        pruned = {
            (r.vec_id, r.cluster)
            for r in ivf_assign_pruned(emb, cent, probe_supers=4).collect()
        }
        assert pruned == exact

    def test_narrow_probe_covers_all_and_mostly_agrees(self, spark):
        """probe_supers=2: every vector is assigned exactly once, the
        cluster ids are real centroids, and the bounded deviation stays
        small on the fixture."""
        from datayours_spark.functions.similarity import (
            ivf_assign, ivf_assign_pruned,
        )

        emb, cent = self._fixture(spark)
        n = emb.count()
        rows = ivf_assign_pruned(emb, cent, probe_supers=2).collect()
        assert len(rows) == n
        assert len({r.vec_id for r in rows}) == n
        valid = {r.centroid_id for r in cent.collect()}
        assert {r.cluster for r in rows} <= valid
        exact = dict(
            (r.vec_id, r.cluster) for r in ivf_assign(emb, cent).collect()
        )
        agree = sum(1 for r in rows if exact[r.vec_id] == r.cluster) / n
        assert agree >= 0.9, f"agreement {agree}"

    def test_zero_vector_assigned(self, spark):
        """A zero-norm vector still lands deterministically (null sims
        sort below real scores at both levels)."""
        from pyspark.sql import functions as F

        from datayours_spark.functions.similarity import ivf_assign_pruned

        emb, cent = self._fixture(spark)
        dim = len(emb.select("embedding").first()[0])
        z = emb.sparkSession.createDataFrame(
            [(999_999, [0.0] * dim)], "vec_id bigint, embedding array<double>"
        )
        rows = ivf_assign_pruned(
            emb.select("vec_id", "embedding").unionByName(z),
            cent,
            probe_supers=2,
        ).where(F.col("vec_id") == 999_999).collect()
        assert len(rows) == 1 and rows[0].cluster is not None


class TestKnnPredict:
    def _emb(self, spark):
        # two well-separated clusters on axes 0 and 1; labels follow the
        # cluster; queries 0 and 1 are one member of each
        rows = []
        for i in range(20):
            v = [0.0, 0.0, 0.0]
            if i % 2 == 0:
                v[0] = 1.0 + 0.01 * i
                lab = 7
            else:
                v[1] = 1.0 + 0.01 * i
                lab = 9
            rows.append((i, v, lab))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_majority_label_of_true_cluster(self, spark):
        from datayours_spark.functions.similarity import knn_predict

        out = {
            r["query_id"]: r
            for r in knn_predict(self._emb(spark), [0, 1], k=5).collect()
        }
        assert out[0]["pred_label"] == 7
        assert out[1]["pred_label"] == 9
        # the clusters are orthogonal, so all 5 votes are unanimous
        assert out[0]["votes"] == 5 and out[1]["votes"] == 5
        assert out[0]["top_sim"] == 1.0

    def test_queries_excluded_from_corpus(self, spark):
        """A query vector must never vote for itself or other queries:
        with ALL even ids as queries, only odd (label 9) corpus remains."""
        from datayours_spark.functions.similarity import knn_predict

        evens = [i for i in range(20) if i % 2 == 0]
        out = knn_predict(self._emb(spark), evens, k=3).collect()
        assert len(out) == len(evens)
        assert all(r["pred_label"] == 9 for r in out)

    def test_vote_tiebreak_is_lowest_label(self, spark):
        from datayours_spark.functions.similarity import knn_predict

        # query 0 at the origin-ish direction equidistant from one doc
        # of label 5 and one of label 3 -> 1 vote each, winner = 3
        rows = [
            (0, [1.0, 1.0], 0),
            (1, [1.0, 0.0], 5),
            (2, [0.0, 1.0], 3),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = knn_predict(emb, [0], k=2).collect()
        assert len(out) == 1
        assert out[0]["votes"] == 1
        assert out[0]["pred_label"] == 3

    def test_routed_equals_exact_with_exhaustive_dials(self, spark):
        """ANN-routed kNN ≡ exact kNN when the index dials are
        exhaustive (nprobe = all clusters, shortlist ≥ corpus): the
        routing must change WHERE neighbours come from, never the vote
        semantics (exclusion, tie-breaks, top_sim)."""
        from datayours_spark.functions.similarity import (
            ivf_assign,
            kmeans_centroids,
            knn_predict,
            knn_predict_routed,
            pq_codebooks,
            pq_encode,
        )

        emb = self._emb(spark)
        cent = kmeans_centroids(emb, k=2, iters=2)
        books = pq_codebooks(emb, m=1, ks=16, dim=3)
        codes = pq_encode(emb, books, 3)
        assign = ivf_assign(emb, cent)
        exact = {tuple(r) for r in knn_predict(emb, [0, 1], k=5).collect()}
        routed = {
            tuple(r)
            for r in knn_predict_routed(
                emb, [0, 1], 5, cent, books, 3,
                shortlist=20, nprobe=2, codes=codes, assignments=assign,
            ).collect()
        }
        assert routed == exact

    def test_routed_runs_from_persisted_index(self, spark, tmp_path):
        """The routed path must accept the persisted IVF-PQ lifecycle
        verbatim (save → load → predict), partition-pruned codes and
        all."""
        from datayours_spark.functions.annindex import (
            load_ann_index,
            save_ann_index,
        )
        from datayours_spark.functions.similarity import (
            ivf_assign,
            kmeans_centroids,
            knn_predict,
            knn_predict_routed,
            pq_codebooks,
            pq_encode,
        )

        emb = self._emb(spark)
        cent = kmeans_centroids(emb, k=2, iters=2)
        books = pq_codebooks(emb, m=1, ks=16, dim=3)
        save_ann_index(
            str(tmp_path / "idx"), cent, books,
            pq_encode(emb, books, 3), ivf_assign(emb, cent),
            {"dim": 3, "k": 2, "seed": 42},
        )
        idx = load_ann_index(spark, str(tmp_path / "idx"))
        routed = {
            tuple(r)
            for r in knn_predict_routed(
                emb, [0, 1], 5, idx["centroids"], idx["codebooks"],
                idx["meta"]["dim"], shortlist=20, nprobe=2,
                codes=idx["codes"], assignments=idx["assignments"],
            ).collect()
        }
        exact = {tuple(r) for r in knn_predict(emb, [0, 1], k=5).collect()}
        assert routed == exact


class TestProjectEmbeddings:
    def test_matrix_is_deterministic_and_signed(self):
        from datayours_spark.functions.similarity import (
            random_projection_matrix,
        )

        m1 = random_projection_matrix(8, 4)
        m2 = random_projection_matrix(8, 4)
        assert m1 == m2
        assert all(x in (-1, 1) for row in m1 for x in row)
        assert random_projection_matrix(8, 4, seed="other") != m1
        # signs are ~balanced (md5 parity): not all-equal per column
        cols = list(zip(*random_projection_matrix(64, 4)))
        assert all(len(set(c)) == 2 for c in cols)

    def test_projection_matches_numpy_and_preserves_distance(self, spark):
        import numpy as np

        from datayours_spark.functions.similarity import (
            project_embeddings,
            random_projection_matrix,
        )

        rng = np.random.RandomState(7)
        vecs = rng.randn(40, 64)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        out = project_embeddings(emb, 64, 16).collect()
        mat = np.array(random_projection_matrix(64, 16), dtype=float)
        expect = vecs @ mat / np.sqrt(16)
        got = np.array(
            [[r[f"p{j:02d}"] for j in range(1, 17)]
             for r in sorted(out, key=lambda r: r.vec_id)]
        )
        assert np.allclose(got, expect, atol=1e-5)
        # JL property on this sample: squared pairwise distances are
        # preserved in expectation — check the mean distortion is near 1
        # and individual distortions are in a loose band
        d_full = ((vecs[None, :, :] - vecs[:, None, :]) ** 2).sum(-1)
        d_proj = ((got[None, :, :] - got[:, None, :]) ** 2).sum(-1)
        iu = np.triu_indices(40, 1)
        ratio = d_proj[iu] / d_full[iu]
        assert 0.8 <= ratio.mean() <= 1.2
        assert ratio.min() > 0.2 and ratio.max() < 3.0

    def test_zero_shuffle_plan(self, spark):
        from datayours_spark.functions.similarity import project_embeddings

        emb = spark.createDataFrame(
            [(0, [1.0] * 64)], "vec_id long, embedding array<double>"
        )
        plan = (
            project_embeddings(emb, 64, 16)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_arrow_variant_equals_fold_at_round_dp(self, spark):
        """The BLAS-matmul form must reproduce the literal fold exactly
        at round_dp — same matrix, same scaling, same column names (the
        production-dims swap must be invisible downstream)."""
        import numpy as np

        from datayours_spark.functions.similarity import (
            project_embeddings,
            project_embeddings_arrow,
        )

        rng = np.random.RandomState(11)
        vecs = rng.randn(60, 48)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        a = project_embeddings(emb, 48, 12)
        b = project_embeddings_arrow(emb, 48, 12)
        assert a.columns == b.columns
        ra = {r.vec_id: tuple(r)[1:] for r in a.collect()}
        rb = {r.vec_id: tuple(r)[1:] for r in b.collect()}
        assert ra == rb
        # the arrow form keeps the zero-shuffle shape too
        plan = b._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_auto_dispatch_on_matrix_size(self, spark):
        """project_embeddings dispatches by in_dim × out_dim: under the
        cap it folds literals in-plan (no Python), over the cap it
        delegates to the Arrow matmul (MapInPandas) so no caller hits
        the 65k-literal plan-build cliff; force= pins either form."""
        import pytest as _pytest

        from datayours_spark.functions.similarity import project_embeddings

        emb = spark.createDataFrame(
            [(0, [1.0] * 128)], "vec_id long, embedding array<double>"
        )
        small = project_embeddings(emb, 128, 16, max_fold_entries=4096)
        assert "MapInPandas" not in small._jdf.queryExecution().executedPlan().toString()
        big = project_embeddings(emb, 128, 64, max_fold_entries=4096)
        assert "MapInPandas" in big._jdf.queryExecution().executedPlan().toString()
        forced = project_embeddings(emb, 128, 16, force="arrow")
        assert "MapInPandas" in forced._jdf.queryExecution().executedPlan().toString()
        assert small.columns == forced.columns
        with _pytest.raises(ValueError):
            project_embeddings(emb, 128, 16, force="blas")

    def test_arrow_rounding_matches_spark_half_up(self, spark):
        """_round_half_up must agree with Spark F.round (BigDecimal
        HALF_UP over the shortest decimal repr) INCLUDING on .5
        boundaries where np.round (half-to-even on the binary value)
        diverges — e.g. 2.675 whose double is 2.67499…"""
        import numpy as np

        from datayours_spark.functions.similarity import _round_half_up

        vals = [
            2.675, -2.675, 2.665, -2.665, 0.1234565, -0.1234565,
            0.0000005, -0.0000005, 1.0000015, 123456.1234555,
        ] + [float(x) for x in np.random.RandomState(3).randn(200)]
        for dp in (2, 6):
            got = _round_half_up(np.array(vals, dtype=np.float64), dp)
            df = spark.createDataFrame([(v,) for v in vals], "x double")
            exp = [
                r.y for r in df.select(F.round("x", dp).alias("y")).collect()
            ]
            assert list(got) == exp, f"dp={dp}"


class TestPrototypePrune:
    def test_drops_most_prototypical_fraction(self, spark):
        from datayours_spark.functions.similarity import prototype_prune

        # one cluster on axis 0: members at increasing angular distance
        # from the centroid direction; a second pure-axis-1 cluster
        rows = []
        for i in range(10):
            rows.append((i, [1.0, 0.05 * i, 0.0]))
        for i in range(10, 15):
            rows.append((i, [0.0, 0.0, 1.0 + 0.1 * i]))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cent = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0], 1.0), (1, [0.0, 0.0, 1.0], 1.0)],
            "centroid_id int, cv array<double>, cnorm double",
        )
        assign = spark.createDataFrame(
            [(i, 0 if i < 10 else 1) for i in range(15)],
            "vec_id long, cluster long",
        )
        out = {r.vec_id: r for r in prototype_prune(
            emb, cent, assign, drop_frac=0.2
        ).collect()}
        assert len(out) == 15
        # cluster 0: vec 0 is the most prototypical (exactly on the
        # centroid direction) -> dropped; the farthest member survives
        assert out[0].keep is False
        assert out[9].keep is True
        dropped0 = [i for i in range(10) if not out[i].keep]
        assert dropped0 == [0, 1]          # top-20% most prototypical
        # cluster 1: all colinear with the centroid (sim 1.0) -> the
        # 0.8-quantile equals every sim, ties kept -> nothing dropped
        assert all(out[i].keep for i in range(10, 15))

    def test_threshold_is_per_cluster_broadcast_not_window(self, spark):
        from datayours_spark.functions.similarity import prototype_prune

        emb = spark.createDataFrame(
            [(i, [1.0, float(i)]) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        cent = spark.createDataFrame(
            [(0, [1.0, 0.0], 1.0)], "centroid_id int, cv array<double>, cnorm double"
        )
        assign = spark.createDataFrame(
            [(i, 0) for i in range(6)], "vec_id long, cluster long"
        )
        plan = (
            prototype_prune(emb, cent, assign)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
