"""Bounded-error differentials: approx-at-scale profile variants vs exact.

Since r15 the two approx registry entries EMIT their tolerance-band
verdicts as boolean columns (driver-checkable: the DuckDB oracle
recomputes the exact columns and asserts the flags TRUE — r14 verdict
#5).  These tests pin the contract from the Python side: every band
flag is True on the test data, the exact reference columns agree with
the exact twins exactly, and the flag logic itself is falsifiable (a
deliberately out-of-band estimate must read False, so a green flag
column can never be a tautology).
"""

import os

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


class TestQuantileProfileApprox:
    def test_bands_true_and_exact_columns_match_twin(self, spark):
        exact = {
            r["lang"]: r for r in entry.q_quantile_profile(spark, SF_DIR).collect()
        }
        approx = {
            r["lang"]: r
            for r in entry.q_quantile_profile_approx(spark, SF_DIR).collect()
        }
        assert set(exact) == set(approx)
        for lang, e in exact.items():
            a = approx[lang]
            assert a["n_docs"] == e["n_docs"]
            assert a["n_sources"] == e["n_sources"]
            for flag in ("sources_in_band", "p50_in_band", "p90_in_band"):
                assert a[flag] is True, (lang, flag)


class TestDailyActiveApprox:
    def test_bands_true_and_exact_columns_match_twin(self, spark):
        exact = {
            r["day_sec"]: r for r in entry.q_daily_active(spark, SF_DIR).collect()
        }
        approx = {
            r["day_sec"]: r
            for r in entry.q_daily_active_approx(spark, SF_DIR).collect()
        }
        assert set(exact) == set(approx)
        for day, e in exact.items():
            a = approx[day]
            assert a["n_events"] == e["n_events"]
            assert a["n_users"] == e["n_users"]
            assert a["users_in_band"] is True, day


class TestBandsAreFalsifiable:
    """The flags must be able to read False — otherwise a green driver
    row would prove nothing.  Recompute each band in Python from the
    exact values and a deliberately out-of-band estimate."""

    def test_hll_band_rejects_out_of_band(self, spark):
        rows = entry.q_daily_active(spark, SF_DIR).collect()
        assert rows
        n = rows[0]["n_users"]
        bad = n + max(5.0, 0.15 * n) + 1
        assert not (abs(bad - n) <= max(5.0, 0.15 * n))

    def test_rank_band_rejects_out_of_band(self):
        # 100 distinct values 1..100; an estimate claiming p50 while
        # sitting at rank 75 must fail the rank window q*n ± max(1.5,
        # 0.005*n) — mirror of the rank_band expression in
        # q_quantile_profile_approx
        n, q = 100, 0.5
        lt, le = 74, 75  # value at sorted position 75
        target, slack = n * q, max(1.5, 0.005 * n)
        assert not ((lt + 1 <= target + slack) and (le >= target - slack))
        # while the true median (positions 50..50) passes
        lt, le = 49, 50
        assert (lt + 1 <= target + slack) and (le >= target - slack)
