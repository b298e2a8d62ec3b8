

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
