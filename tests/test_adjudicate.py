"""tools/adjudicate.py — the bench-adjudication reproducibility
invariant (r13 verdict #1): every summary stat in an adjudication file
must be recomputable from fields committed in the same file, and
--check must fail loudly when it is not."""

from __future__ import annotations

import json
import math
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

from adjudicate import _queries, adjudicate, check, recompute


class TestRecompute:
    def test_geomean_and_flags(self):
        best = {"a": 1.0, "b": 2.0, "c": 3.9}
        base = {"a": 1.0, "b": 1.0, "c": 3.0, "d": 5.0}
        shared, geo, flags = recompute(best, base)
        assert shared == 3
        assert geo == round(math.exp(
            (math.log(1.0) + math.log(2.0) + math.log(1.3)) / 3
        ), 3)
        # b at 2.0x and c at 1.3x flag; a does not; d is not shared
        assert set(flags) == {"b", "c"}

    def test_query_key_prefix_stripped(self):
        # driver BENCH_r files nest under "parsed" and strip the q_
        # prefix; bench.py full files keep it — both must align
        driver_doc = {"parsed": {"queries": {"tpch_q1": 2.0}}}
        full_doc = {"queries": {"q_tpch_q1": 1.0}}
        assert _queries(driver_doc) == {"tpch_q1": 2.0}
        assert _queries(full_doc) == {"tpch_q1": 1.0}

    def test_adjudicate_output_self_reproducible(self):
        base = {"queries": {"q_x": 1.0, "q_y": 2.0}}
        runs = [
            {"queries": {"q_x": 1.5, "q_y": 2.2}, "probe_before": 1.2,
             "probe_after": 1.3},
            {"queries": {"q_x": 1.2, "q_y": 4.0}, "probe_before": 1.2,
             "probe_after": 1.2},
        ]
        doc = adjudicate(base, runs)
        assert doc["per_query_best"] == {"x": 1.2, "y": 2.2}
        # the committed invariant: recompute from the file's own fields
        shared, geo, flags = recompute(
            doc["per_query_best"], doc["base_queries"]
        )
        assert (shared, geo) == (
            doc["shared_queries"], doc["geomean_best_vs_base"]
        )
        assert set(flags) == set(doc["flags_ge_1p3"])
        # check() accepts its own output and rejects a doctored headline
        check(doc)
        doctored = dict(doc, geomean_best_vs_base=0.866)
        with pytest.raises(SystemExit):
            check(doctored)

    def test_disjoint_base_raises_descriptive_error(self):
        # a base file sharing zero query keys with the runs (wrong base
        # file) must fail with a clear message, not ZeroDivisionError
        # (ADVICE r14)
        with pytest.raises(ValueError, match="no shared queries"):
            recompute({"a": 1.0}, {"b": 1.0})
        with pytest.raises(ValueError, match="no shared queries"):
            recompute({"a": 1.0}, {"a": 0.0})  # all base values <= 0

    def test_committed_r13_file_reproducible(self):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_ADJUDICATION_r13.json",
        )
        with open(path) as fh:
            check(json.load(fh))

    def test_anchor_is_verbatim_r14_run3(self):
        """BENCH_ANCHOR.json (r14 verdict #1) must stay the verbatim
        probe-verified-healthy run it froze: run 3 (index 2) of the r14
        adjudication, probes 1.20/1.12, total 176.6 s — an anchor that
        silently drifted from its provenance would invalidate every
        cross-round trend claim made against it."""
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "BENCH_ANCHOR.json")) as fh:
            anchor = json.load(fh)
        with open(
            os.path.join(repo, "BENCH_ADJUDICATION_r14.json")
        ) as fh:
            run3 = json.load(fh)["runs"][2]
        assert anchor["queries"] == run3["queries"]
        assert anchor["probe_before"] == run3["probe_before_sec"] == 1.2
        assert anchor["probe_after"] == run3["probe_after_sec"] == 1.12
        assert anchor["value"] == run3["total_sec"] == 176.6
        # and it parses as an adjudication base with the full query set
        assert len(_queries(anchor)) == len(run3["queries"])
