"""Differential tests: span-level dedup vs a brute-force Python oracle on
seeded random corpora, and driver-side glob find vs an independent
wildcard matcher (hypothesis).

The DuckDB gate oracle checks one fixture; these sweep the input space —
small vocabularies force heavy cross-doc shingle collisions, exercising
merge/threshold edge cases the fixture can't.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def brute_repeated_spans(
    docs: dict[int, list[str]], k: int, min_span: int, min_docs: int
) -> set[tuple[int, int, int, int]]:
    """The obvious O(everything) reimplementation of repeated_spans:
    (doc_id, start_tok, end_tok, span_tokens) tuples."""
    occurrences: dict[str, set[int]] = {}
    for d, toks in docs.items():
        for off in range(len(toks) - k + 1):
            occurrences.setdefault(" ".join(toks[off : off + k]), set()).add(d)
    out = set()
    for d, toks in docs.items():
        covered = [
            off
            for off in range(len(toks) - k + 1)
            if len(occurrences[" ".join(toks[off : off + k])]) >= min_docs
        ]
        if not covered:
            continue
        # merge offsets whose covered token intervals [off, off+k-1] overlap
        # or touch (gap in offsets <= k)
        runs: list[list[int]] = [[covered[0], covered[0]]]
        for off in covered[1:]:
            if off - runs[-1][1] <= k:
                runs[-1][1] = off
            else:
                runs.append([off, off])
        for start, last in runs:
            end = last + k - 1
            if end - start + 1 >= min_span:
                out.add((d, start, end, end - start + 1))
    return out


class TestSpanDifferential:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_brute_force_on_random_corpora(self, spark, seed):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(rng.randint(4, 8))]
        docs = {
            d: [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
            for d in range(rng.randint(2, 12))
        }
        k = rng.randint(2, 4)
        min_span = rng.randint(k, 2 * k + 2)
        df = spark.createDataFrame(
            [(d, " ".join(toks)) for d, toks in docs.items()],
            "doc_id bigint, text string",
        )
        from datayours_spark.functions.dedup import remove_spans, repeated_spans

        got = {
            (r["doc_id"], r["start_tok"], r["end_tok"], r["span_tokens"])
            for r in repeated_spans(df, k=k, min_span=min_span).collect()
        }
        want = brute_repeated_spans(docs, k, min_span, min_docs=2)
        assert got == want, f"seed={seed} k={k} min_span={min_span}"

        # removal consistency on the same corpus: clean_text is exactly the
        # tokens outside the brute-force spans, in order
        cleaned = {
            r["doc_id"]: r["clean_text"]
            for r in remove_spans(df, k=k, min_span=min_span).collect()
        }
        for d, toks in docs.items():
            cut = set()
            for dd, s, e, _n in want:
                if dd == d:
                    cut.update(range(s, e + 1))
            expect = " ".join(t for i, t in enumerate(toks) if i not in cut)
            assert cleaned[d] == expect, f"seed={seed} doc={d}"


def brute_glob_match(path: str, pattern: str) -> bool:
    """Independent wildcard matcher: per-level, * = any run of non-dots,
    ? = one non-dot char, braces = alternation (recursive descent — no
    regexes, so it cannot share a bug with glob_path_to_regex)."""
    from datayours_spark.kernel.globs import expand_braces

    def seg_match(seg: str, s: str) -> bool:
        if not seg:
            return not s
        c = seg[0]
        if c == "*":
            return any(seg_match(seg[1:], s[i:]) for i in range(len(s) + 1))
        if c == "?":
            return bool(s) and seg_match(seg[1:], s[1:])
        return bool(s) and s[0] == c and seg_match(seg[1:], s[1:])

    for alt in expand_braces(pattern):
        want = alt.split(".")
        have = path.split(".")
        if len(want) == len(have) and all(
            seg_match(w, h) for w, h in zip(want, have)
        ):
            return True
    return False


_SEG = st.text(alphabet="abc1", min_size=0, max_size=3)
_PATHS = st.lists(
    st.builds(lambda parts: ".".join(parts), st.lists(_SEG.filter(bool), min_size=1, max_size=3)),
    min_size=0,
    max_size=8,
)
_PAT_SEG = st.text(alphabet="abc1*?", min_size=1, max_size=3)
_PATTERN = st.builds(
    lambda parts: ".".join(parts), st.lists(_PAT_SEG, min_size=1, max_size=3)
)


class TestFindLeafPathsProperty:
    @given(paths=_PATHS, pattern=_PATTERN)
    @settings(max_examples=300, deadline=None)
    def test_matches_independent_matcher(self, paths, pattern):
        from datayours_spark.operators.catalog import find_leaf_paths

        got = find_leaf_paths(paths, pattern)
        want = sorted({p for p in paths if brute_glob_match(p, pattern)})
        assert got == want


class TestSpanIncremental:
    def test_batch_creates_repetition_in_old_doc(self, spark):
        from datayours_spark.functions.dedup import (
            repeated_spans_incremental,
            shingle_postings,
        )

        B = " ".join(f"b{i}" for i in range(15))
        old = spark.createDataFrame(
            [(1, f"{B} " + " ".join(f"x{i}" for i in range(10))),
             (2, " ".join(f"y{i}" for i in range(20)))],
            "doc_id bigint, text string",
        )
        new = spark.createDataFrame(
            [(10, f"{B} fresh tail tokens")], "doc_id bigint, text string"
        )
        out = repeated_spans_incremental(
            new, shingle_postings(old, 8), k=8, min_span=10
        ).collect()
        by_doc = {r["doc_id"]: (r["start_tok"], r["end_tok"]) for r in out}
        # the batch doc AND the previously-clean old doc 1 both report the
        # boilerplate span; untouched doc 2 is absent
        assert by_doc[1] == (0, 14)
        assert by_doc[10] == (0, 14)
        assert 2 not in by_doc

    @pytest.mark.parametrize("seed", range(4))
    def test_incremental_equals_full_on_affected_docs(self, spark, seed):
        """Differential: incremental output == the full recompute
        restricted to the affected-doc set, on random small-vocab corpora
        (heavy shingle collisions)."""
        from datayours_spark.functions.dedup import (
            repeated_spans,
            repeated_spans_incremental,
            shingle_postings,
        )

        rng = random.Random(1000 + seed)
        vocab = [f"w{i}" for i in range(rng.randint(4, 7))]
        docs = {
            d: [rng.choice(vocab) for _ in range(rng.randint(1, 25))]
            for d in range(rng.randint(4, 14))
        }
        k = rng.randint(2, 4)
        min_span = rng.randint(k, 2 * k + 1)
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()],
            "doc_id bigint, text string",
        )
        new = df.where("doc_id % 3 = 0")
        old = df.where("doc_id % 3 != 0")
        got = {
            tuple(r)
            for r in repeated_spans_incremental(
                new, shingle_postings(old, k), k=k, min_span=min_span
            ).collect()
        }
        # expected: full spans over the whole corpus, restricted to docs
        # sharing a now-repeated shingle with the batch
        full = repeated_spans(df, k=k, min_span=min_span)
        sh = {}
        for d, toks in docs.items():
            sh[d] = {
                " ".join(toks[o : o + k]) for o in range(len(toks) - k + 1)
            }
        counts = {}
        for d, ss in sh.items():
            for x in ss:
                counts[x] = counts.get(x, 0) + 1
        batch_sh = set().union(*(sh[d] for d in docs if d % 3 == 0)) if any(
            d % 3 == 0 for d in docs
        ) else set()
        affected = {
            d
            for d, ss in sh.items()
            if any(x in batch_sh and counts[x] >= 2 for x in ss)
        }
        want = {
            tuple(r) for r in full.collect() if r["doc_id"] in affected
        }
        assert got == want, f"seed={seed} k={k} min_span={min_span}"
