"""Dedup operator goldens: duplicate-cluster resolution (connected
components via hash-min label propagation) over near-dup pair graphs."""

from pyspark.sql import functions as F

from datayours_spark.functions.dedup import dup_clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id1 bigint, id2 bigint")


class TestDupClusters:
    def test_transitive_chain_collapses(self, spark):
        # 1-2, 2-3 must collapse to one cluster even though 1-3 was never
        # emitted; 10-11 is an independent pair.
        out = dup_clusters(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_long_chain_needs_multiple_rounds(self, spark):
        # path graph 1-2-...-8: diameter 7 forces several propagation rounds
        out = dup_clusters(_pairs(spark, [(i, i + 1) for i in range(1, 8)]))
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        assert got == {i: 1 for i in range(1, 9)}

    def test_min_id_wins_regardless_of_pair_order(self, spark):
        # min id sits at the END of the discovery order
        out = dup_clusters(_pairs(spark, [(5, 9), (2, 5), (1, 9)]))
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 5: 1, 9: 1}

    def test_deep_chain_converges_within_log_rounds(self, spark):
        # path graph of 120 edges: diameter 120 >> max_iter — plain hash-min
        # would silently return unconverged labels; pointer jumping halves
        # the remaining path every round so ~log2(120) rounds suffice
        out = dup_clusters(_pairs(spark, [(i, i + 1) for i in range(1, 121)]), max_iter=15)
        assert {r["cluster_id"] for r in out.collect()} == {1}
        assert out.count() == 121

    def test_empty_pairs(self, spark):
        out = dup_clusters(_pairs(spark, []))
        assert out.count() == 0
        assert out.columns == ["doc_id", "cluster_id"]
