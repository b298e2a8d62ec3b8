"""Contract tests for the driver-facing `__spark_entry__` surface.

The driver oracle-checks only the first 50 dict entries of `queries()`
per round, so the ORDER of the dict is part of the correctness contract:
a slot spent on an entry without an `oracle_sql()` can never earn a green
row.  These tests pin the invariants the round-5 reorder established
without pinning the exact rotation (future rounds may rotate again).
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entrymod

DRIVER_WINDOW = entrymod.DRIVER_WINDOW
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# SURVEY §2 operator families → the oracle-backed queries that exercise
# them.  Since round 13 the mapping lives in `__spark_entry__.FAMILIES`
# because the window rotation itself is computed family-first
# (`_window_order`): every family places its oldest-green member in the
# driver window every round, so the staleness bound below holds by
# construction rather than by hand-rotation discipline (the r12 regress:
# alphabetical rotation silently starved the per_record family).
MAX_STALENESS = 2

FAMILIES = entrymod.FAMILIES


def _green_rounds():
    """name -> most recent round with a hash-green driver CORRECTNESS row."""
    greens: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        latest = max(latest, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                greens[name] = max(greens.get(name, 0), rnd)
    return greens, latest


def test_queries_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    orphans = [n for n in o if n not in q]
    assert orphans == [], f"oracle_sql entries without a query: {orphans}"


def test_driver_window_fully_oracled():
    """Every entry inside the driver's first-50 check window must have an
    oracle — otherwise the slot is structurally un-greenable."""
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    missing = [n for n in q[:DRIVER_WINDOW] if n not in o]
    assert missing == [], f"in-window queries without oracle: {missing}"


def test_no_oracle_queries_sit_past_window():
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    for n in q:
        if n not in o:
            assert q.index(n) >= DRIVER_WINDOW, (
                f"{n} has no oracle but occupies window slot {q.index(n)}"
            )


def test_family_queries_exist():
    q = entrymod.queries()
    ghosts = [n for qs in FAMILIES.values() for n in qs if n not in q]
    assert ghosts == [], f"FAMILIES references unknown queries: {ghosts}"


def test_family_driver_coverage_staleness_bound():
    """Every operator family must keep a driver-green row at most
    MAX_STALENESS rounds old, counting current-window membership as
    fresh (the driver checks the first-50 window this round)."""
    greens, latest = _green_rounds()
    if latest == 0:  # no driver rounds recorded yet (fresh clone)
        return
    current = latest + 1
    window = set(list(entrymod.queries())[:DRIVER_WINDOW])
    stale = {}
    for fam, names in FAMILIES.items():
        if any(n in window for n in names):
            continue  # prospectively fresh this round
        age = min(
            (current - greens[n] for n in names if n in greens),
            default=None,
        )
        if age is None or age > MAX_STALENESS:
            stale[fam] = age
    assert not stale, (
        f"families past the {MAX_STALENESS}-round staleness bound "
        f"(rotate one of their queries into the first-{DRIVER_WINDOW} "
        f"window): {stale}"
    )


def test_no_duplicate_query_names():
    # a dict can't literally hold dupes, but a copy-paste slip would
    # silently shrink the surface — pin the expected count floor instead
    q = entrymod.queries()
    assert len(q) >= 106, f"queries() shrank to {len(q)} entries"


def test_window_covers_every_family():
    """Construction check on the computed rotation: every SURVEY §2
    family must hold at least one slot in the current driver window, so
    each family re-earns a driver-green row EVERY round (stronger than
    the staleness bound, which this makes unbreakable going forward)."""
    window = set(list(entrymod.queries())[:DRIVER_WINDOW])
    missing = [
        fam for fam, names in FAMILIES.items()
        if not any(n in window for n in names)
    ]
    assert missing == [], f"families with no window slot: {missing}"


def test_window_rotation_is_deterministic():
    """`queries()` order is a pure function of the committed CORRECTNESS
    files — two calls must agree exactly (the driver snapshots the order
    once per round; a nondeterministic order would desync the window)."""
    assert list(entrymod.queries()) == list(entrymod.queries())


def test_window_prefers_oldest_greens():
    """Fill slots (window minus the per-family oldest-green picks) go to
    the globally oldest-green candidates: no fill slot may hold a query
    greened more recently than an oracled query sitting outside the
    window (pure-rotation hygiene; family picks are exempt because a
    family whose oldest green is recent still earns its slot)."""
    greens, latest = _green_rounds()
    if latest == 0:
        return
    order = list(entrymod.queries())
    window, tail = order[:DRIVER_WINDOW], order[DRIVER_WINDOW:]

    def vintage(n):
        return (greens.get(n, 0), n)

    picks = set()
    for names in FAMILIES.values():
        members = [
            n for n in names
            if n not in entrymod.NO_ORACLE_QUERIES and n not in picks
        ]
        if members:
            picks.add(min(members, key=vintage))
    newest_fill = max(greens.get(n, 0) for n in window if n not in picks)
    oldest_tail = min(
        greens.get(n, 0) for n in tail if n not in entrymod.NO_ORACLE_QUERIES
    )
    assert newest_fill <= oldest_tail, (
        "a fill slot holds a newer-green row than the oldest tail row: "
        f"{newest_fill} > {oldest_tail}"
    )

