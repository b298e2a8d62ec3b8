"""Bounded-error differentials: approx-at-scale profile variants vs exact.

percentile_approx and approx_count_distinct are engine-specific sketches —
no DuckDB oracle can hash-match them.  Their correctness artifact is the
error bound the sketch advertises, asserted here against the exact paths
on the same sf0.01 data.
"""

import os

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


class TestQuantileProfileApprox:
    def test_percentiles_and_distincts_within_bounds(self, spark):
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
            assert a["n_docs"] == e["n_docs"]  # plain count stays exact
            # HLL relative standard deviation defaults to 5%; 3σ bound
            # (and never off by less than 1 for tiny cardinalities)
            tol = max(1.0, 0.15 * e["n_sources"])
            assert abs(a["n_sources"] - e["n_sources"]) <= tol
            # percentile_approx(accuracy=10000) rank error <= n/10000 — at
            # this scale that is <1 rank, but n_chars has duplicate values,
            # so allow one rank-neighbour step ~= 5% of the exact value
            for col in ("p50_chars", "p90_chars"):
                assert abs(a[col] - e[col]) <= max(2.0, 0.05 * e[col]), (
                    lang,
                    col,
                    a[col],
                    e[col],
                )


class TestDailyActiveApprox:
    def test_hll_users_within_bounds(self, spark):
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
            tol = max(1.0, 0.15 * e["n_users"])
            assert abs(a["n_users"] - e["n_users"]) <= tol, (
                day,
                a["n_users"],
                e["n_users"],
            )
