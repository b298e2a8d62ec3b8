

class TestBigramLogprob:
    def test_salad_scores_below_repetitive_text(self, spark):
        """A doc of high-frequency transitions scores higher (closer to 0)
        than one whose transitions are all unique — the signal unigram
        frequency cannot see (same token multiset)."""
        from datayours_spark.functions.text import bigram_logprob

        docs = spark.createDataFrame(
            [
                (1, "a b a b a b a b a b a b"),   # one dominant transition
                (2, "b b a a b a b b a a a b"),   # scrambled: varied transitions
                (3, "x"),                          # single token: no bigram
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
        assert 3 not in out                       # nothing to score
        assert out[1]["n_bigrams"] == 11
        assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


class TestPiiScrub:
    def _scrub(self, spark, texts):
        from datayours_spark.functions.text import pii_scrub

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        return {r["doc_id"]: r for r in pii_scrub(df).collect()}

    def test_counts_and_redaction(self, spark):
        got = self._scrub(spark, [
            "mail a@b.com or c.d-e@f.org now",
            "call 555-123-4567",
            "host 10.0.0.1 and 192.168.1.255",
            "clean document with no pii at all",
        ])
        assert (got[0]["n_email"], got[0]["clean_text"]) == (
            2, "mail <PII> or <PII> now"
        )
        assert (got[1]["n_phone"], got[1]["clean_text"]) == (1, "call <PII>")
        assert got[2]["n_ip"] == 2
        assert got[3]["clean_text"] == "clean document with no pii at all"
        assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ip"]) == (0, 0, 0)

    def test_overlap_counts_sequentially(self, spark):
        # an address at a numeric host is NOT an email (the pattern wants
        # an alphabetic TLD) — the IP inside is still found and redacted;
        # with a real TLD the email wins the whole token, and SEQUENTIAL
        # counting (each kind counts after the prior kinds' redaction)
        # attributes the region to the email only — no double count
        got = self._scrub(spark, [
            "ping user@10.0.0.1 twice",
            "ping user@10.0.0.1.example.com twice",
            "reach 555-123-4567@example.org now",
        ])
        assert (got[0]["n_email"], got[0]["n_ip"]) == (0, 1)
        assert got[0]["clean_text"] == "ping user@<PII> twice"
        assert (got[1]["n_email"], got[1]["n_ip"]) == (1, 0)
        assert got[1]["clean_text"] == "ping <PII> twice"
        assert (got[2]["n_email"], got[2]["n_phone"]) == (1, 0)
        assert got[2]["clean_text"] == "reach <PII> now"

    def test_phone_needs_word_boundary(self, spark):
        got = self._scrub(spark, ["id 9555-123-45678 is not a phone"])
        assert got[0]["n_phone"] == 0


class TestUrlDomains:
    def test_extraction_and_domains(self, spark):
        from datayours_spark.functions.text import url_domains

        df = spark.createDataFrame(
            [
                (1, "go to https://a.example.com/x?q=1 or http://b.org now"),
                (2, "bare host https://c.net trailing"),
                (3, "no urls here"),
            ],
            "doc_id bigint, text string",
        )
        got = {(r["doc_id"], r["domain"]) for r in url_domains(df).collect()}
        assert got == {(1, "a.example.com"), (1, "b.org"), (2, "c.net")}

    def test_path_stops_at_whitespace(self, spark):
        from datayours_spark.functions.text import url_domains

        df = spark.createDataFrame(
            [(1, "x https://h.io/a/b tail")], "doc_id bigint, text string"
        )
        assert url_domains(df).collect()[0]["url"] == "https://h.io/a/b"


class TestOovRate:
    def test_induced_vocab_and_ratios(self, spark):
        from datayours_spark.functions.text import oov_rate, vocab_topv

        docs = spark.createDataFrame(
            [
                (1, "a a a b b c"),       # a:3 b:2 c:1
                (2, "a b zz qq"),          # 2 oov of 4 under V=3
                (3, "zz zz zz"),           # all oov under V=3 (zz:3 ties a:4? no)
            ],
            "doc_id bigint, text string",
        )
        # corpus counts: a:4 b:3 zz:4 c:1 qq:1 — top-3 by (n DESC, tok ASC)
        # is a(4), zz(4), b(3); deterministic tiebreak a < zz
        vocab = vocab_topv(docs, 3)
        assert {r.tok for r in vocab.collect()} == {"a", "zz", "b"}
        out = {r.doc_id: r for r in oov_rate(docs, vocab).collect()}
        assert out[1].n_oov == 1 and out[1].n_tokens == 6   # only c
        assert out[2].n_oov == 1                             # only qq
        assert out[3].n_oov == 0
        assert out[2].oov_ratio == 0.25


class TestChunkDocuments:
    def test_overlap_and_tail(self, spark):
        from datayours_spark.functions.text import chunk_documents

        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10))), (2, "only three toks")],
            "doc_id bigint, text string",
        )
        rows = sorted(
            chunk_documents(docs, window=4, stride=2).collect(),
            key=lambda r: (r.doc_id, r.chunk_no),
        )
        d1 = [r for r in rows if r.doc_id == 1]
        # starts 0,2,4,6,8 — full windows until the tail
        assert [r.chunk_start for r in d1] == [0, 2, 4, 6, 8]
        assert d1[0].chunk_text == "t0 t1 t2 t3"
        assert d1[1].chunk_text == "t2 t3 t4 t5"       # 50% overlap
        assert d1[-1].chunk_text == "t8 t9"            # short tail, never empty
        assert d1[-1].n_chunk_tokens == 2
        d2 = [r for r in rows if r.doc_id == 2]
        assert [(r.chunk_start, r.n_chunk_tokens) for r in d2] == [(0, 3), (2, 1)]

    def test_null_text_yields_no_chunks_not_a_crash(self, spark):
        # split(NULL) -> NULL, size -> -1; an unguarded sequence(0, -2, k)
        # throws IllegalArgumentException and kills the whole job for one
        # bad row.  The guard must map null text to zero chunk rows while
        # leaving other docs (including the empty string, which tokenizes
        # to one "" token) untouched.
        from datayours_spark.functions.text import chunk_documents

        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, None), (3, "")],
            "doc_id bigint, text string",
        )
        rows = chunk_documents(docs, window=3, stride=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert 2 not in by_doc                      # null text: zero rows
        assert [r.chunk_text for r in sorted(by_doc[1], key=lambda r: r.chunk_no)] == [
            "a b c", "c d"
        ]
        assert [r.chunk_text for r in by_doc[3]] == [""]   # unchanged

    def test_chunk_identity_is_reconstructible(self, spark):
        from datayours_spark.functions.text import chunk_documents

        docs = spark.createDataFrame(
            [(7, " ".join(f"w{i}" for i in range(37)))], "doc_id bigint, text string"
        )
        rows = chunk_documents(docs, window=8, stride=4).collect()
        toks = [f"w{i}" for i in range(37)]
        for r in rows:
            assert r.chunk_no == r.chunk_start // 4
            assert r.chunk_text == " ".join(toks[r.chunk_start : r.chunk_start + 8])


class TestDupNgramStats:
    def test_bigram_fraction(self, spark):
        from datayours_spark.functions.text import dup_ngram_stats

        docs = spark.createDataFrame(
            [
                (1, "a b a b a"),          # bigrams: ab ba ab ba — all dup
                (2, "u v w x y"),          # all unique
                (3, "one"),                # no bigrams -> no row
                (4, "p q r p q"),          # pq qr rp pq: pq dup (2 of 4)
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in dup_ngram_stats(docs, n=2).collect()}
        assert 3 not in out
        assert out[1].n_ngrams == 4 and out[1].dup_fraction == 1.0
        assert out[2].dup_ngrams == 0 and out[2].dup_fraction == 0.0
        assert out[4].dup_ngrams == 2 and out[4].dup_fraction == 0.5

    def test_trigram_variant(self, spark):
        from datayours_spark.functions.text import dup_ngram_stats

        docs = spark.createDataFrame(
            [(1, "a b c a b c a b c")], "doc_id bigint, text string"
        )
        row = dup_ngram_stats(docs, n=3).collect()[0]
        # trigrams: abc bca cab abc bca cab abc — all 7 are repeats
        assert row.n_ngrams == 7 and row.dup_fraction == 1.0


class TestGopherRules:
    def test_rules_and_null_safety(self, spark):
        from datayours_spark.functions.text import gopher_rules

        docs = spark.createDataFrame(
            [
                (1, "the cat sat " + " ".join(f"word{i}" for i in range(60))
                    + " with that be of and have"),  # passes everything
                (2, "short doc"),                    # word count
                (3, None),                           # null: all False, no crash
                (4, "# " * 80),                      # symbol + alpha + mean len
                (5, " ".join("12345" for _ in range(80))),  # alpha + stopwords
                (6, "the be to of " + " ".join(f"word{i}" for i in range(60))
                    + "\n- bullet" * 10),  # 10/11 lines bulleted > 0.9
                (7, "the be to of " + " ".join(f"word{i}" for i in range(60))
                    + " with have that\n- one\n- two\n- three"),  # 3/4 = 0.75
                (8, "the be to of " + "# " * 5 + "... " * 5
                    + " ".join(f"word{i}" for i in range(60))
                    + " with have that"),  # each ~0.07 <= 0.1, sum > 0.1
            ],
            "doc_id bigint, text string",
        )
        out = {r.doc_id: r for r in gopher_rules(docs).collect()}
        assert out[1].pass_all
        assert not out[2].ok_word_count and not out[2].pass_all
        assert out[3].n_words == 0 and not any(
            getattr(out[3], c) for c in out[3].asDict() if c.startswith("ok_")
        )
        assert not out[4].ok_symbol_ratio and not out[4].ok_mean_word_len
        assert not out[5].ok_alpha_words and not out[5].ok_stopwords
        assert not out[6].ok_bullet_lines    # 10 of 11 lines > 0.9 gate
        assert out[7].ok_bullet_lines        # 0.75 passes the paper's 0.9
        assert out[8].ok_symbol_ratio        # each symbol gated separately


class TestBm25:
    def test_ranking_and_idf_shape(self, spark):
        from datayours_spark.functions.text import bm25_topk

        docs = spark.createDataFrame(
            [
                (1, "cat dog cat dog cat"),     # tf(cat)=3 in a short doc
                (2, "cat and some other words here today friend"),
                (3, "dog only here with more words to pad it out"),
                (4, "nothing relevant at all in this document body"),
            ],
            "doc_id bigint, text string",
        )
        out = bm25_topk(docs, [(0, "cat")], k=3).collect()
        ranks = {r.rank: r.doc_id for r in out}
        assert ranks[1] == 1                  # highest tf, shortest doc
        assert ranks[2] == 2
        assert 4 not in {r.doc_id for r in out}   # non-matching never ranks
        # multi-term query: doc with both terms outranks single-term docs
        out2 = bm25_topk(docs, [(0, "cat dog")], k=3).collect()
        assert {r.rank: r.doc_id for r in out2}[1] == 1

    def test_duplicate_query_terms_count_once(self, spark):
        from datayours_spark.functions.text import bm25_topk

        docs = spark.createDataFrame(
            [(1, "cat sat here"), (2, "dog ran far")],
            "doc_id bigint, text string",
        )
        a = {(r.query_id, r.doc_id): r.score
             for r in bm25_topk(docs, [(0, "cat")], k=2).collect()}
        b = {(r.query_id, r.doc_id): r.score
             for r in bm25_topk(docs, [(0, "cat cat cat")], k=2).collect()}
        assert a == b


class TestPplBuckets:
    def test_terciles_and_threshold_semantics(self, spark):
        from datayours_spark.functions.text import ppl_buckets, unigram_logprob

        # 9 docs in one lang with clearly separated unigram scores:
        # common-word docs score high (head), rare-word docs low (tail)
        rows = []
        for i in range(9):
            # doc i repeats token "common" (9-i) times and a unique
            # token i times -> monotone score spread
            toks = ["common"] * (9 - i) + [f"rare{i}_{j}" for j in range(i)]
            rows.append((i, " ".join(toks), "en"))
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {r["doc_id"]: r for r in ppl_buckets(docs).collect()}
        assert len(out) == 9
        buckets = [out[i]["bucket"] for i in range(9)]
        # scores are monotone decreasing in i, so buckets must be
        # head..head, middle..middle, tail..tail in order
        assert buckets == sorted(buckets, key=["head", "middle", "tail"].index)
        assert buckets.count("head") >= 1 and buckets.count("tail") >= 1
        # bucket matches the exposed thresholds row-by-row
        for r in out.values():
            if r["avg_logprob"] >= r["p_high"]:
                assert r["bucket"] == "head"
            elif r["avg_logprob"] >= r["p_low"]:
                assert r["bucket"] == "middle"
            else:
                assert r["bucket"] == "tail"

    def test_thresholds_are_per_group(self, spark):
        from datayours_spark.functions.text import ppl_buckets

        rows = [(i, "a b c d", "en") for i in range(3)]
        rows += [(10 + i, f"z{i} y{i} x{i}", "de") for i in range(3)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = ppl_buckets(docs).collect()
        thr = {(r["lang"], r["p_low"], r["p_high"]) for r in out}
        assert len({t[0] for t in thr}) == 2  # both langs present
        assert len(thr) == 2  # one threshold pair per lang

    def test_no_window_in_plan(self, spark):
        """The scale contract: bucketing is a broadcast-threshold join,
        not a per-language ntile window (a window would sort the head
        language in one task at 100 TB)."""
        from datayours_spark.functions.text import ppl_buckets

        docs = spark.createDataFrame(
            [(i, "a b", "en") for i in range(4)],
            "doc_id long, text string, lang string",
        )
        plan = ppl_buckets(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan


class TestTokenizeIds:
    def test_rank_ids_and_unk(self, spark):
        from datayours_spark.functions.text import tokenize_ids, vocab_topv

        docs = spark.createDataFrame(
            [
                (1, "a a a b b c"),
                (2, "a b zz"),
            ],
            "doc_id long, text string",
        )
        vocab = vocab_topv(docs, 2)  # a (rk 1), b (rk 2); c/zz OOV
        out = {
            (r.doc_id, r.pos): r.tid
            for r in tokenize_ids(docs, vocab).collect()
        }
        assert out[(1, 0)] == 1 and out[(1, 3)] == 2  # a->1, b->2
        assert out[(1, 5)] == 0                       # c is OOV
        assert out[(2, 2)] == 0                       # zz is OOV
        assert len(out) == 9                          # every (doc, pos) kept

    def test_zero_corpus_shuffle(self, spark):
        from datayours_spark.functions.text import tokenize_ids

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        vocab = spark.createDataFrame(
            [("a", 1)], "tok string, rk long"
        )
        plan = (
            tokenize_ids(docs, vocab)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the only allowed exchange is the broadcast of the vocab
        assert "Exchange hashpartitioning" not in plan
        assert "BroadcastHashJoin" in plan


class TestQualityClassifier:
    def test_scores_and_keep_flag(self, spark):
        import math

        from datayours_spark.functions.text import (
            hashed_weight_table,
            quality_classifier,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "delta gamma beta alpha"),   # same unigrams, new bigrams
                (3, ""),                          # single empty-string token
            ],
            "doc_id long, text string",
        )
        buckets = 512
        w = hashed_weight_table(spark, buckets, scale=1000)
        out = {
            r.doc_id: r
            for r in quality_classifier(
                docs, w, buckets, w_scale=1000.0, threshold=0.5
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        # 4 unigrams + 3 bigrams
        assert out[1].n_feats == 7 and out[2].n_feats == 7
        assert out[3].n_feats == 1
        # bigram features are load-bearing: reordering the same token
        # set must change the score (unigram sums alone would tie)
        assert out[1].score != out[2].score
        # keep is decided on the rounded score
        for r in out.values():
            assert r.keep == (r.score >= 0.5)
            assert 0.0 <= r.score <= 1.0
        # cross-check doc 1 against a driver-side recompute
        rows = w.collect()
        wt = {r.bucket: r.w for r in rows}
        import hashlib

        def b(feat):
            return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % buckets

        feats = ["alpha", "beta", "gamma", "delta",
                 "alpha beta", "beta gamma", "gamma delta"]
        s = sum(wt.get(b(f), 0.0) for f in feats)
        z = s / (1000.0 * len(feats))
        score = round(1.0 / (1.0 + math.exp(-z)), 6)
        assert abs(out[1].score - score) < 1e-9

    def test_featureless_doc_gets_audit_row(self, spark):
        """A null-text doc explodes to zero features; it must still get
        a scores row (n_feats=0, score null, keep FALSE) instead of
        silently bypassing the keep-filter and the audit record
        (ADVICE r10)."""
        from datayours_spark.functions.text import (
            hashed_weight_table,
            quality_classifier,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, None)],
            "doc_id long, text string",
        )
        w = hashed_weight_table(spark, 64)
        out = {
            r.doc_id: r for r in quality_classifier(docs, w, 64).collect()
        }
        assert set(out) == {1, 2}
        assert out[2].n_feats == 0
        assert out[2].score is None
        assert out[2].keep is False
        assert out[1].n_feats == 5 and out[1].score is not None

    def test_missing_buckets_weigh_zero(self, spark):
        from datayours_spark.functions.text import quality_classifier

        docs = spark.createDataFrame(
            [(1, "x y z")], "doc_id long, text string"
        )
        empty_w = spark.createDataFrame([], "bucket long, w double")
        out = quality_classifier(docs, empty_w, 64).collect()[0]
        assert out.score == 0.5 and out.keep  # sigmoid(0) at threshold

    def test_single_doc_keyed_exchange(self, spark):
        from datayours_spark.functions.text import (
            hashed_weight_table,
            quality_classifier,
        )

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        w = hashed_weight_table(spark, 64)
        plan = (
            quality_classifier(docs, w, 64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # weights broadcast; the only hash exchange is the per-doc agg
        assert "BroadcastHashJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 1
