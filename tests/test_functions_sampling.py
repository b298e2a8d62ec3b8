"""Tests for functions.sampling — deterministic stratified sampling and
per-group quota top-k (the data-mixing primitives)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datayours_spark.functions.sampling import (
    hash_bucket,
    quota_topk,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en")
        .when(F.col("id") % 4 == 1, "de")
        .when(F.col("id") % 4 == 2, "fr")
        .otherwise("xx")
        .alias("lang"),
        (F.col("id") % 3).cast("string").alias("source"),
        (F.col("id") * 7 % 101).alias("n_chars"),
    )


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    docs = _docs(spark)
    rates = {"en": 100, "de": 50, "fr": 0}
    out = stratified_sample(docs, "lang", "doc_id", rates)

    rows = {r.doc_id: r for r in out.collect()}
    again = {r.doc_id: r for r in stratified_sample(docs, "lang", "doc_id", rates).collect()}
    assert rows.keys() == again.keys()  # reproducible selection

    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == 100  # rate 100 keeps every en doc
    assert "fr" not in by_lang  # rate 0 drops all
    assert "xx" not in by_lang  # unlisted stratum dropped
    assert 20 <= by_lang.get("de", 0) <= 80  # ~50% of 100

    # every kept row's bucket is under its stratum rate
    assert out.where(F.col("bucket") >= 100).count() == 0
    assert out.where((F.col("lang") == "de") & (F.col("bucket") >= 50)).count() == 0


def _skewed_docs(spark):
    """900 'en' docs, 90 'de', 10 'xx' — the low-resource shape α-sampling
    is for."""
    return spark.range(1_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "en")
        .when(F.col("id") < 990, "de")
        .otherwise("xx")
        .alias("lang"),
    )


def test_temperature_sample_upweights_low_resource(spark):
    from datayours_spark.functions.sampling import temperature_sample

    docs = _skewed_docs(spark)
    out = temperature_sample(
        docs, "lang", "doc_id", alpha=0.5, target_rows=200
    )
    kept = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # keep RATES must be ordered inversely to corpus share (α < 1 flattens)
    rate = {lang: kept.get(lang, 0) / total[lang] for lang in total}
    assert rate["xx"] > rate["de"] > rate["en"]
    # expected sample size ≈ target (hash noise only, no stratum saturated
    # here except possibly xx — bound generously)
    assert 140 <= sum(kept.values()) <= 260


def test_temperature_sample_alpha1_is_proportional_and_saturates(spark):
    from datayours_spark.functions.sampling import temperature_sample

    docs = _skewed_docs(spark)
    # α=1: p_l = c_l / N → r_l = target/N for EVERY stratum (flat rate)
    out = temperature_sample(
        docs, "lang", "doc_id", alpha=1.0, target_rows=500
    )
    thr = {r["lang"]: r["thr"] for r in out.select("lang", "thr").distinct().collect()}
    assert len(set(thr.values())) == 1  # one shared keep rate
    # target beyond the corpus: every rate caps at 1 → everything kept
    assert (
        temperature_sample(
            docs, "lang", "doc_id", alpha=0.5, target_rows=10_000
        ).count()
        == 1_000
    )


def test_temperature_sample_partition_invariant(spark):
    from datayours_spark.functions.sampling import temperature_sample

    docs = _skewed_docs(spark)
    a = {
        r["doc_id"]
        for r in temperature_sample(
            docs, "lang", "doc_id", alpha=0.5, target_rows=200
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in temperature_sample(
            docs.repartition(7), "lang", "doc_id", alpha=0.5, target_rows=200
        ).collect()
    }
    assert a == b and a


def test_hash_bucket_matches_duckdb_md5(spark):
    import duckdb

    df = spark.range(50).select(
        F.col("id"), hash_bucket(F.col("id"), "strat").alias("b")
    )
    got = {r.id: r.b for r in df.collect()}
    want = dict(
        duckdb.sql(
            "SELECT i, ('0x' || substr(md5('strat' || i::VARCHAR), 1, 8))::BIGINT % 100 "
            "FROM generate_series(0, 49) t(i)"
        ).fetchall()
    )
    assert got == want


def test_quota_topk_bounded_and_tiebroken(spark):
    docs = _docs(spark)
    out = quota_topk(docs, ["lang", "source"], "n_chars", "doc_id", 3)

    sizes = out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in sizes)
    assert len(sizes) == 12  # 4 langs x 3 sources all represented

    # per group: ordered by n_chars desc then doc_id asc, rk contiguous
    for (lang, source), grp in _group(out.collect()):
        grp.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in grp] == list(range(1, len(grp) + 1))
        keys = [(-r["n_chars"], r["doc_id"]) for r in grp]
        assert keys == sorted(keys)


def _group(rows):
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["lang"], r["source"]), []).append(r)
    return groups.items()


def test_pack_sequences_manifest_invariants(spark):
    import __spark_entry__ as entry

    rows = entry.q_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    streams: dict = {}
    for r in rows:
        streams.setdefault((r["lang"], r["shard"]), []).append(r)
    for grp in streams.values():
        grp.sort(key=lambda r: r["doc_id"])
        # offsets are the exclusive running sum: stream is gapless
        expect = 0
        for r in grp:
            assert r["offset"] == expect
            expect += r["n_tokens"]
            assert r["n_chunks"] >= 1
            # a doc spans exactly the chunks its byte range covers
            assert r["n_chunks"] == (r["offset"] + r["n_tokens"] - 1) // entry.PACK_CAPACITY - r["offset"] // entry.PACK_CAPACITY + 1


def test_uniform_sample_k_exact_count_and_determinism(spark):
    from datayours_spark.functions.sampling import uniform_sample_k

    docs = _docs(spark)
    out = uniform_sample_k(docs, ["lang"], "doc_id", 5)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"en": 5, "de": 5, "fr": 5, "xx": 5}
    ids = sorted(r["doc_id"] for r in out.collect())
    again = sorted(r["doc_id"] for r in uniform_sample_k(docs, ["lang"], "doc_id", 5).collect())
    assert ids == again  # re-derivable permutation


def test_token_budget_sample_fills_without_gaps(spark):
    from datayours_spark.functions.sampling import token_budget_sample

    docs = _docs(spark).withColumn("n_tokens", (F.col("n_chars") % 7 + 1).cast("bigint"))
    budget = 30
    out = token_budget_sample(docs, ["lang"], "doc_id", "n_tokens", budget)
    rows: dict = {}
    for r in out.collect():
        rows.setdefault(r["lang"], []).append(r)
    assert set(rows) == {"en", "de", "fr", "xx"}
    for grp in rows.values():
        grp.sort(key=lambda r: r["offset"])
        # offsets tile the budget with no gaps: each row starts where the
        # previous ended, and every kept row starts under the budget
        expect = 0
        for r in grp:
            assert r["offset"] == expect
            assert r["offset"] < budget
            expect += r["n_tokens"]
        assert expect >= budget  # the budget is actually filled


class TestLeakageFreeSplit:
    def test_clusters_never_straddle_the_split(self, spark):
        from datayours_spark.functions.sampling import leakage_free_split

        docs = spark.createDataFrame(
            [(i,) for i in range(1, 51)], "doc_id bigint"
        )
        # clusters: {1,2,3}, {10,11}, rest singletons
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
            "doc_id bigint, cluster_id bigint",
        )
        out = leakage_free_split(docs, clusters, train_pct=50).collect()
        side = {r["doc_id"]: r["split"] for r in out}
        assert len(side) == 50
        # the leakage invariant: all members of a cluster share a side
        assert side[1] == side[2] == side[3]
        assert side[10] == side[11]
        # both sides are populated at 50%
        assert {"train", "val"} == set(side.values())

    def test_deterministic_and_rederivable(self, spark):
        from datayours_spark.functions.sampling import leakage_free_split

        docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
        empty = spark.createDataFrame([], "doc_id bigint, cluster_id bigint")
        a = {r["doc_id"]: r["split"]
             for r in leakage_free_split(docs, empty).collect()}
        b = {r["doc_id"]: r["split"]
             for r in leakage_free_split(docs.repartition(7), empty).collect()}
        assert a == b  # md5 decision: partition-layout invariant


class TestShardBalance:
    def test_every_doc_assigned_once_and_balance(self, spark):
        from datayours_spark.functions.sampling import shard_balance
        from datayours_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        n = docs.count()
        out = shard_balance(docs, n_shards=4, stratum_width=16)
        rows = out.collect()
        assert len(rows) == n                       # one row per doc
        assert {r["shard"] for r in rows} <= set(range(4))
        # token balance: max shard within 25% of min (stratified snake
        # bounds imbalance by #strata x stratum_width tokens)
        totals = {}
        for r in rows:
            totals[r["shard"]] = totals.get(r["shard"], 0) + r["n_tokens"]
        assert len(totals) == 4
        assert max(totals.values()) <= 1.25 * min(totals.values())

    def test_deterministic_under_repartition(self, spark):
        from datayours_spark.functions.sampling import shard_balance
        from datayours_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(map(tuple, shard_balance(docs, 4).collect()))
        b = sorted(map(tuple, shard_balance(docs.repartition(7), 4).collect()))
        assert a == b


class TestMixingWeights:
    def test_alpha_one_reproduces_natural_shares(self, spark):
        from datayours_spark.functions.sampling import mixing_weights

        docs = _docs(spark).withColumn(
            "text", F.concat(F.lit("a b c "), F.col("doc_id").cast("string"))
        )
        out = {
            r["stratum"]: r
            for r in mixing_weights(
                docs, stratum_col="source", alpha=1.0, budget=1000
            ).collect()
        }
        for r in out.values():
            assert abs(r["weight"] - r["share"]) <= 2e-6

    def test_alpha_zero_is_uniform_and_budget_partitions(self, spark):
        from datayours_spark.functions.sampling import mixing_weights

        docs = _docs(spark).withColumn(
            "text", F.concat(F.lit("a b c "), F.col("doc_id").cast("string"))
        )
        rows = mixing_weights(
            docs, stratum_col="source", alpha=0.0, budget=999_999
        ).collect()
        # share^0 = 1 for every stratum -> uniform weights
        ws = [r["weight"] for r in rows]
        assert max(ws) - min(ws) <= 2e-6
        # the allocation never exceeds the budget and floor() loses < 1
        # token per stratum
        assert sum(r["alloc_tokens"] for r in rows) <= 999_999
        assert sum(r["alloc_tokens"] for r in rows) >= 999_999 - len(rows)

    def test_smoothing_lifts_the_tail(self, spark):
        """0 < alpha < 1 must up-weight the smallest stratum relative to
        its natural share and down-weight the largest."""
        from datayours_spark.functions.sampling import mixing_weights

        docs = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 90, "big").otherwise("small").alias("source"),
            F.lit("w1 w2 w3 w4").alias("text"),
        )
        out = {
            r["stratum"]: r
            for r in mixing_weights(
                docs, stratum_col="source", alpha=0.5, budget=1000
            ).collect()
        }
        assert out["small"]["weight"] > out["small"]["share"]
        assert out["big"]["weight"] < out["big"]["share"]
        # epochs on the up-weighted tail exceed the head's
        assert out["small"]["epochs"] > out["big"]["epochs"]

    def test_null_and_empty_text_count_zero_tokens(self, spark):
        """NULL text (split size -1) and '' (split size 1) must not skew
        a stratum's n_tokens (ADVICE r8)."""
        from datayours_spark.functions.sampling import mixing_weights

        docs = spark.createDataFrame(
            [
                (1, "a", "w1 w2 w3"),
                (2, "a", None),
                (3, "a", ""),
                (4, "b", "w1 w2 w3"),
            ],
            "doc_id bigint, source string, text string",
        )
        out = {
            r["stratum"]: r
            for r in mixing_weights(
                docs, stratum_col="source", alpha=1.0, budget=100
            ).collect()
        }
        # both strata hold exactly 3 real tokens -> identical n_tokens
        assert out["a"]["n_tokens"] == 3 and out["b"]["n_tokens"] == 3
        assert out["a"]["weight"] == out["b"]["weight"]


class TestShuffleChunks:
    def test_permutation_deterministic_and_complete(self, spark):
        from datayours_spark.functions.sampling import shuffle_chunks

        chunks = spark.createDataFrame(
            [(s, c) for s in range(4) for c in range(50)],
            "shard long, chunk long",
        )
        a = shuffle_chunks(chunks, ["shard", "chunk"], 8, seed="e0")
        rows = a.collect()
        # complete permutation: every input chunk exactly once
        assert len(rows) == 200
        assert {(r.shard, r.chunk) for r in rows} == {
            (s, c) for s in range(4) for c in range(50)
        }
        # positions are 0..n-1 dense per output shard
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.out_shard, []).append(r.pos)
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))
        # deterministic: a rerun (different partitioning) is identical
        b = shuffle_chunks(
            chunks.repartition(7), ["shard", "chunk"], 8, seed="e0"
        )
        assert {tuple(r) for r in b.collect()} == {tuple(r) for r in rows}
        # a different seed is a different permutation
        c = shuffle_chunks(chunks, ["shard", "chunk"], 8, seed="e1")
        assert {tuple(r) for r in c.collect()} != {tuple(r) for r in rows}
        # the shuffle actually breaks adjacency: consecutive source
        # chunks of one shard do not stay consecutive in one out_shard
        pos_of = {(r.shard, r.chunk): (r.out_shard, r.pos) for r in rows}
        adjacent_kept = sum(
            1
            for s in range(4)
            for c in range(49)
            if pos_of[(s, c)][0] == pos_of[(s, c + 1)][0]
            and abs(pos_of[(s, c)][1] - pos_of[(s, c + 1)][1]) == 1
        )
        assert adjacent_kept < 20  # ~196/8/len expected by chance
