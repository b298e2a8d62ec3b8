"""Property-based tests of the pure-Python semantics kernel (hypothesis)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from datayours_spark.kernel.archives import (
    Archive,
    format_archives,
    parse_retention_str,
    select_read_archive,
    validate_archives,
)
from datayours_spark.kernel.globs import expand_braces, glob_path_to_regex
from datayours_spark.kernel.timeparse import parse_relative_time, parse_time

UNITS = [("s", 1), ("m", 60), ("h", 3600), ("d", 86400), ("y", 86400 * 365)]


@st.composite
def archive_chains(draw):
    """Valid archive chains: precisions divide evenly, retention strictly
    grows, and each archive has enough points to consolidate one point of
    the next (the reference's 5 validation rules)."""
    n = draw(st.integers(1, 4))
    factors = [draw(st.integers(2, 10)) for _ in range(n - 1)]
    spps = [1]
    for f in factors:
        spps.append(spps[-1] * f)
    points = []
    for i in range(n):
        min_pts = factors[i] if i < n - 1 else 2
        points.append(draw(st.integers(min_pts, min_pts + 100)))
    for i in range(1, n):
        # growing points never breaks the consolidation minimum above
        while spps[i] * points[i] <= spps[i - 1] * points[i - 1]:
            points[i] += max(1, points[i - 1])
    return [Archive(s, p) for s, p in zip(spps, points)]


@given(archive_chains())
@settings(max_examples=200, deadline=None)
def test_format_parse_roundtrip(chain):
    validate_archives(chain)
    spec = format_archives(chain)
    assert parse_retention_str(spec) == chain


@given(archive_chains(), st.integers(0, 10**7))
@settings(max_examples=200, deadline=None)
def test_read_selection_is_finest_covering(chain, age):
    """Selection = the finest archive whose oldest() covers from_time
    (`L_DataWhisper.lua:544-549`), else the coarsest fallback."""
    now = 10**7
    from_time = now - age
    chosen = select_read_archive(chain, from_time, now)
    covering = [a for a in chain if a.oldest(now) <= from_time]
    if covering:
        assert chosen == min(covering, key=lambda a: a.seconds_per_point)
    else:
        assert chosen == max(chain, key=lambda a: a.seconds_per_point)


SEG = st.text(alphabet="abcz123", min_size=1, max_size=4)


@given(st.lists(st.lists(SEG, min_size=1, max_size=3), min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_brace_expansion_counts_and_matches(level_alts):
    pattern = ".".join(
        "{" + ",".join(alts) + "}" if len(alts) > 1 else alts[0]
        for alts in level_alts
    )
    expanded = expand_braces(pattern)
    n_expected = 1
    for alts in level_alts:
        n_expected *= len(alts)
    assert len(expanded) == n_expected
    # every cross-product path matches exactly the anchored regex set
    regexes = [re.compile(r) for r in glob_path_to_regex(pattern)]
    for alts_choice in expanded:
        assert any(r.match(alts_choice) for r in regexes)


@given(st.integers(1, 500), st.sampled_from(["s", "min", "h", "d", "w", "mon", "y"]))
@settings(max_examples=200, deadline=None)
def test_relative_parse_applies_shrink(n, unit):
    now = 2_000_000_000
    secs = {"s": 1, "min": 60, "h": 3600, "d": 86400, "w": 604800,
            "mon": 2592000, "y": 31536000}[unit]
    got = parse_relative_time(f"-{n}{unit}", now=now)
    assert got == int(now - n * secs * 0.998)
    assert parse_time(f"-{n}{unit}", now=now) == got
    # plain epoch integers pass through untouched
    assert parse_time(str(now)) == now
