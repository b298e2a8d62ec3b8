"""ANN index persistence: save/load round-trip and inverted-list layout."""

import shutil

from pyspark.sql import functions as F

from datayours_spark.functions.annindex import load_ann_index, save_ann_index
from datayours_spark.functions.similarity import (
    ivf_assign,
    ivfpq_topk,
    kmeans_centroids,
    pq_codebooks,
    pq_encode,
)
from datayours_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestAnnIndexPersistence:
    def _build(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        cent = kmeans_centroids(emb, k=4, iters=2)
        books = pq_codebooks(emb, m=2, ks=8, iters=1, dim=dim)
        codes = pq_encode(emb, books, dim)
        assign = ivf_assign(emb, cent)
        return emb, dim, cent, books, codes, assign

    def test_roundtrip_search_identical(self, spark, tmp_path):
        emb, dim, cent, books, codes, assign = self._build(spark)
        out = str(tmp_path / "index")
        save_ann_index(out, cent, books, codes, assign,
                       {"dim": dim, "m": 2, "ks": 8, "k": 4, "seed": 42})
        idx = load_ann_index(spark, out)
        assert idx["meta"]["dim"] == dim
        assert idx["codebooks"] == books
        live = ivfpq_topk(emb, [0, 1], 5, cent, books, dim,
                          codes=codes, assignments=assign)
        loaded = ivfpq_topk(emb, [0, 1], 5, idx["centroids"],
                            idx["codebooks"], idx["meta"]["dim"],
                            codes=idx["codes"],
                            assignments=idx["assignments"])
        assert sorted(map(tuple, live.collect())) == sorted(
            map(tuple, loaded.collect())
        )
        shutil.rmtree(out, ignore_errors=True)

    def test_codes_partitioned_by_cluster(self, spark, tmp_path):
        """The stored codes ARE the inverted lists: filtering one cluster
        must prune to that partition (PartitionFilters on cluster)."""
        import contextlib
        import io

        emb, dim, cent, books, codes, assign = self._build(spark)
        out = str(tmp_path / "index")
        save_ann_index(out, cent, books, codes, assign,
                       {"dim": dim, "m": 2, "ks": 8, "k": 4, "seed": 42})
        stored = spark.read.parquet(f"{out}/codes").where(F.col("cluster") == 1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            stored.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan and "cluster" in plan
        shutil.rmtree(out, ignore_errors=True)

    def test_incremental_append_equals_full_build(self, spark, tmp_path):
        """Index 80% of the corpus, append the remaining 20% as a batch:
        searches over the appended index must equal the full build (model
        state is shared, so codes/assignments are identical)."""
        from datayours_spark.functions.annindex import append_to_ann_index

        emb, dim, cent, books, codes, assign = self._build(spark)
        base = emb.where(F.col("vec_id") % 5 != 0)
        batch = emb.where(F.col("vec_id") % 5 == 0)
        from datayours_spark.functions.similarity import ivf_assign, pq_encode

        out = str(tmp_path / "index")
        save_ann_index(
            out, cent, books,
            pq_encode(base, books, dim), ivf_assign(base, cent),
            {"dim": dim, "m": 2, "ks": 8, "k": 4, "seed": 42},
        )
        append_to_ann_index(out, batch)
        idx = load_ann_index(spark, out)
        full = ivfpq_topk(emb, [0, 1], 5, cent, books, dim,
                          codes=codes, assignments=assign)
        incr = ivfpq_topk(emb, [0, 1], 5, idx["centroids"],
                          idx["codebooks"], dim,
                          codes=idx["codes"], assignments=idx["assignments"])
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, incr.collect())
        )
        shutil.rmtree(out, ignore_errors=True)

    def test_residual_append_encodes_residuals(self, spark, tmp_path):
        """ADVICE r4: appending to a residual index must encode
        v - centroid(v) against the residual-trained codebooks and keep
        the FULL vector's norm — raw-vector encoding silently corrupts
        ADC scores.  Equivalence check on the stored payload itself:
        base+append == full rebuild, row for row."""
        from datayours_spark.functions.annindex import append_to_ann_index
        from datayours_spark.functions.similarity import (
            as_double_array,
            dot,
            pq_codebooks,
            residual_vectors,
        )

        emb = load_table(spark, SF_DIR, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        cent = kmeans_centroids(emb, k=4, iters=2)
        res = residual_vectors(emb, cent)
        books = pq_codebooks(res, m=2, ks=8, iters=1, dim=dim)

        def res_codes(vectors):
            c = pq_encode(residual_vectors(vectors, cent), books, dim)
            nrms = vectors.select(
                F.col("vec_id"), as_double_array("embedding").alias("v")
            ).select(
                "vec_id", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
            )
            return c.select("vec_id", "codes").join(nrms, "vec_id")

        base = emb.where(F.col("vec_id") % 5 != 0)
        batch = emb.where(F.col("vec_id") % 5 == 0)
        out = str(tmp_path / "index")
        save_ann_index(
            out, cent, books, res_codes(base), ivf_assign(base, cent),
            {"dim": dim, "m": 2, "ks": 8, "k": 4, "seed": 42,
             "residual": True},
        )
        append_to_ann_index(out, batch)

        def rows(codes_df, assign_df):
            return sorted(
                (r["cluster"], r["vec_id"], tuple(r["codes"]),
                 round(r["nrm"], 9))
                for r in codes_df.join(assign_df, "vec_id")
                .select("cluster", "vec_id", "codes", "nrm").collect()
            )

        idx = load_ann_index(spark, out)
        got = rows(idx["codes"], idx["assignments"])
        want = rows(res_codes(emb), ivf_assign(emb, cent))
        assert got == want
        shutil.rmtree(out, ignore_errors=True)


class TestSqIndexPersistence:
    """The SQ8 rung of the index lifecycle (r8): save/load/append with
    cluster-partitioned codes and the literal-probe pruned search."""

    def _build(self, spark):
        from datayours_spark.functions.similarity import sq_encode, sq_train

        emb = load_table(spark, SF_DIR, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        cent = kmeans_centroids(emb, k=4, iters=2)
        bounds = sq_train(emb)
        codes = sq_encode(emb, bounds)
        assign = ivf_assign(emb, cent)
        return emb, dim, cent, bounds, codes, assign

    def test_roundtrip_pruned_search_equals_in_memory(self, spark, tmp_path):
        from datayours_spark.functions.annindex import (
            load_sq_index, save_sq_index,
        )
        from datayours_spark.functions.similarity import (
            ivfsq_topk, ivfsq_topk_pruned,
        )

        emb, dim, cent, bounds, codes, assign = self._build(spark)
        out = str(tmp_path / "sqindex")
        save_sq_index(out, cent, bounds, codes, assign,
                      {"dim": dim, "k": 4, "seed": 42})
        idx = load_sq_index(spark, out)
        assert idx["meta"]["kind"] == "ivf-sq8"
        assert idx["bounds"] == bounds
        live = ivfsq_topk(emb, [0, 1], 5, bounds=bounds, codes=codes,
                          centroids=cent, assignments=assign)
        loaded = ivfsq_topk_pruned(
            emb, idx["codes"], idx["bounds"], idx["centroids"], [0, 1], 5
        )
        assert sorted(map(tuple, live.collect())) == sorted(
            map(tuple, loaded.collect())
        )
        shutil.rmtree(out, ignore_errors=True)

    def test_pruned_search_partition_filters(self, spark, tmp_path):
        """The literal probe list must surface as a STATIC
        PartitionFilters [cluster IN (...)] on the stored codes scan —
        partition pruning is the inverted-list seek."""
        import contextlib
        import io
        import re

        from datayours_spark.functions.annindex import (
            load_sq_index, save_sq_index,
        )
        from datayours_spark.functions.similarity import ivfsq_topk_pruned

        emb, dim, cent, bounds, codes, assign = self._build(spark)
        out = str(tmp_path / "sqindex")
        save_sq_index(out, cent, bounds, codes, assign,
                      {"dim": dim, "k": 4, "seed": 42})
        idx = load_sq_index(spark, out)
        df = ivfsq_topk_pruned(
            emb, idx["codes"], idx["bounds"], idx["centroids"], [0, 1], 5
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert re.search(r"PartitionFilters: \[cluster#\d+ IN \(", plan)
        shutil.rmtree(out, ignore_errors=True)

    def test_incremental_append_equals_full_build(self, spark, tmp_path):
        """Index 80%, append 20%: pruned searches over the appended
        index equal the full build (bounds + centroids shared, so codes
        and assignments are identical)."""
        from datayours_spark.functions.annindex import (
            append_to_sq_index, load_sq_index, save_sq_index,
        )
        from datayours_spark.functions.similarity import (
            ivfsq_topk_pruned, sq_encode,
        )

        emb, dim, cent, bounds, codes, assign = self._build(spark)
        n = emb.count()
        cut = int(n * 0.8)
        first = emb.where(F.col("vec_id") < cut)
        rest = emb.where(F.col("vec_id") >= cut)
        out = str(tmp_path / "sqindex")
        save_sq_index(
            out, cent, bounds, sq_encode(first, bounds),
            ivf_assign(first, cent), {"dim": dim, "k": 4, "seed": 42},
        )
        append_to_sq_index(out, rest)
        idx = load_sq_index(spark, out)
        assert idx["codes"].count() == n
        full_out = str(tmp_path / "sqfull")
        save_sq_index(full_out, cent, bounds, codes, assign,
                      {"dim": dim, "k": 4, "seed": 42})
        fidx = load_sq_index(spark, full_out)
        a = ivfsq_topk_pruned(
            emb, idx["codes"], idx["bounds"], idx["centroids"], [0, 1], 5
        )
        b = ivfsq_topk_pruned(
            emb, fidx["codes"], fidx["bounds"], fidx["centroids"], [0, 1], 5
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(full_out, ignore_errors=True)
