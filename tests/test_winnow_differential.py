"""Differential test: winnowing fingerprints vs a brute-force Python
oracle on seeded random corpora (hypothesis).

The DuckDB gate oracle checks one fixture; this sweeps the input space —
tiny vocabularies force hash ties inside windows (the rightmost-min
tiebreak), and short docs exercise the tail rule.  Also pins the
winnowing GUARANTEE on the oracle's own output: two docs sharing a run
of >= w + k - 1 tokens share at least one fingerprint.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


def _md5_int60(s: str) -> int:
    # the engine's winnow k-gram hash width (r11: 32 -> 60 bits; the
    # 32-bit space was the collision noise floor at 100 TB)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def brute_winnow(toks: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """(pos, h) fingerprints: rightmost-min per w-window over k-gram
    md5-prefix ints, one tail window when 1 <= grams < w."""
    m = len(toks) - (k - 1)
    if m < 1:
        return set()
    hs = [
        _md5_int60(" ".join(toks[i : i + k])) for i in range(m)
    ]
    out = set()
    for j in range(max(m - w + 1, 1)):
        sub = hs[j : min(j + w, m)]
        mi, mv = 0, sub[0]
        for idx, v in enumerate(sub):
            if v <= mv:
                mi, mv = idx, v
        out.add((j + mi + 1, mv))
    return out


corpus = st.lists(
    st.lists(st.sampled_from("a b c d e aa bb".split()), min_size=0, max_size=14),
    min_size=1,
    max_size=8,
)


class TestWinnowDifferential:
    @settings(max_examples=12, deadline=None)
    @given(docs=corpus, k=st.integers(2, 4), w=st.integers(2, 4))
    def test_matches_brute_oracle(self, spark, docs, k, w):
        from datayours_spark.functions.dedup import winnow_fingerprints

        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id bigint, text string",
        )
        got: dict[int, set] = {}
        for r in winnow_fingerprints(df, k=k, w=w).collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.h))
        want = {
            i: brute_winnow(toks, k, w)
            for i, toks in enumerate(docs)
            if brute_winnow(toks, k, w)
        }
        assert got == want

    @settings(max_examples=12, deadline=None)
    @given(
        shared=st.lists(st.sampled_from("p q r s t u v w".split()),
                        min_size=6, max_size=10),
        pre=st.lists(st.sampled_from("x y z".split()), min_size=0, max_size=5),
        post=st.lists(st.sampled_from("m n o".split()), min_size=0, max_size=5),
    )
    def test_guarantee_on_oracle(self, shared, pre, post):
        # the winnowing theorem, checked on the brute oracle: a shared
        # run of >= w + k - 1 tokens forces >= 1 shared fingerprint
        k, w = 3, 3
        assert len(shared) >= w + k - 1
        d1 = pre + shared + post
        d2 = shared
        f1 = {h for _, h in brute_winnow(d1, k, w)}
        f2 = {h for _, h in brute_winnow(d2, k, w)}
        assert f1 & f2
