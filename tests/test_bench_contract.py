"""Contract tests for bench.py's driver-facing stdout line.

The driver records only the LAST 2000 characters of bench.py's stdout
and parses the JSON line out of that window.  BENCH_r05/BENCH_r06 were
both lost (``parsed: null``) because the pretty-printed per-query map
outgrew the window and the line head — with the metric and the headline
total — was clipped off.  These tests pin the line format so that can't
silently recur.
"""

import json

import bench


def _worst_case_line() -> str:
    # worst realistic widths: every query at a 3-digit-integer-part
    # two-decimal value (no headline query takes 100+ s at sf0.1; if one
    # ever does, the bench has bigger problems than line length)
    timings = {n: 99.99 for n in bench.BENCH_QUERIES}
    return bench.bench_line(9999.99, timings, 0.1)


def test_line_fits_driver_tail_window():
    line = _worst_case_line()
    # the line plus its trailing newline must sit fully inside the
    # 2000-char tail; keep real margin for a few future query additions
    assert len(line) <= 1900, (
        f"bench line is {len(line)} chars; the driver's 2000-char stdout "
        "tail will clip it — shorten names/precision or trim "
        "BENCH_QUERIES before adding more queries"
    )


def test_line_parses_with_required_keys():
    d = json.loads(_worst_case_line())
    assert set(d) == {"metric", "value", "unit", "queries", "sf"}
    assert d["unit"] == "sec"
    # printed keys are the query names sans the uniform q_ prefix
    assert set(d["queries"]) == {
        n.removeprefix("q_") for n in bench.BENCH_QUERIES
    }
    # the prefix-strip must stay collision-free
    assert len(d["queries"]) == len(bench.BENCH_QUERIES)


def test_bench_queries_exist_in_registry():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    ghosts = [n for n in bench.BENCH_QUERIES if n not in q]
    assert ghosts == [], f"bench names unknown queries: {ghosts}"
