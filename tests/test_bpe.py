"""BPE merge induction: differential vs a reference implementation of
the published algorithm (Sennrich et al. 2016), including the greedy
left-to-right overlap semantics."""

from collections import Counter

from pyspark.sql import functions as F

from datayours_spark.functions.text import bpe_merges, bpe_segment


def _ref_merge(syms, best):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(word_freqs, k):
    vocab = Counter()
    for w, f in word_freqs.items():
        vocab[tuple(list(w) + ["</w>"])] += f
    merges = []
    for _ in range(k):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pairs[best]))
        nxt = Counter()
        for syms, f in vocab.items():
            nxt[_ref_merge(syms, best)] += f
        vocab = nxt
    return merges, vocab


CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


class TestBpeMerges:
    def _docs(self, spark, words):
        return spark.createDataFrame(
            [(0, " ".join(words))], "doc_id bigint, text string"
        )

    def test_matches_reference_implementation(self, spark):
        got = bpe_merges(self._docs(spark, CORPUS), n_merges=10)
        want, _ = _ref_bpe(Counter(CORPUS), 10)
        assert got == want

    def test_overlapping_pairs_merge_left_to_right(self, spark):
        """'aaaa' merges to (aa, aa) in one round — the published
        greedy non-overlapping scan, not (aa, a, a)."""
        got = bpe_merges(self._docs(spark, ["aaaa", "aaa"]), n_merges=2)
        want, vocab = _ref_bpe(Counter({"aaaa": 1, "aaa": 1}), 2)
        assert got == want
        # pair count BEFORE the merge: 3 overlapping (a,a) in 'aaaa' +
        # 2 in 'aaa' = 5; after it, 'aaaa' holds TWO 'aa' symbols (the
        # non-overlapping scan fired twice) — a (aa, a, a) outcome
        # would have left the round-2 (a, a) count nonzero instead
        assert got[0] == ("a", "a", 5)
        round2_pairs = {m[:2] for m in got[1:]}
        assert ("a", "a") not in round2_pairs

    def test_segment_applies_merge_table(self, spark):
        merges = bpe_merges(self._docs(spark, CORPUS), n_merges=8)
        seg = bpe_segment(self._docs(spark, CORPUS), merges)
        got = {}
        for r in seg.collect():
            got.setdefault((r.pos, r.word), []).append((r.sym_pos, r.sym))
        _, ref_vocab = _ref_bpe(Counter(CORPUS), 8)
        ref_by_word = {
            "".join(s for s in syms).replace("</w>", ""): list(syms)
            for syms in ref_vocab
        }
        for (_pos, word), sym_rows in got.items():
            syms = [s for _i, s in sorted(sym_rows)]
            assert syms == ref_by_word[word], (word, syms)

    def test_empty_and_exhausted_corpus(self, spark):
        # single-char words exhaust after merging with </w>
        got = bpe_merges(self._docs(spark, ["a", "a", "b"]), n_merges=10)
        want, _ = _ref_bpe(Counter({"a": 2, "b": 1}), 10)
        assert got == want
        assert len(got) < 10  # ran out of pairs before the budget


class TestBpeDifferentialFuzz:
    def test_random_corpora_match_reference(self, spark):
        """Differential fuzz in the repo's house style: random small
        corpora over a tiny alphabet (maximal merge collisions and
        ties) must reproduce the reference implementation exactly,
        merges AND final segmentation."""
        import random

        rng = random.Random(0xB9E)
        for trial in range(4):
            words = [
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 25))
            ]
            freqs = Counter(words)
            docs = spark.createDataFrame(
                [(0, " ".join(words))], "doc_id bigint, text string"
            )
            k = rng.randint(1, 6)
            got = bpe_merges(docs, n_merges=k)
            want, ref_vocab = _ref_bpe(freqs, k)
            assert got == want, (trial, words, k)
            seg = {}
            for r in bpe_segment(docs, got).collect():
                seg.setdefault(r.word, {})[r.sym_pos] = r.sym
            ref_by_word = {
                "".join(syms).replace("</w>", ""): list(syms)
                for syms in ref_vocab
            }
            for word, by_pos in seg.items():
                syms = [by_pos[i] for i in sorted(by_pos)]
                assert syms == ref_by_word[word], (trial, word, syms)
