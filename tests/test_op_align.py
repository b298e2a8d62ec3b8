"""Alignment / null policy / as-of / staircase goldens
(L_DataGraph.lua:149-254; L_DataMineServer.lua:148-164)."""

from datayours_spark.operators.align import (
    apply_null_policy,
    asof_resample,
    default_modes_for_method,
    pivot_align,
    staircase,
)
from datayours_spark.operators.fetch import lww_slots


class TestPivotAlign:
    def test_union_time_axes(self, spark, make_datapoints):
        dp = make_datapoints([("a", 60, 1.0), ("b", 120, 2.0), ("a", 180, 3.0)])
        out = pivot_align(lww_slots(dp, 60), ["a", "b"])
        rows = [(r["slot"], r["a"], r["b"]) for r in out.collect()]
        assert rows == [(60, 1.0, None), (120, None, 2.0), (180, 3.0, None)]


class TestAsof:
    def test_backward_lookup_carries(self, spark, make_datapoints):
        samples = (
            make_datapoints([("a", 95, 1.0), ("a", 250, 2.0)])
            .select("path", "ts_sec", "value")
        )
        out = asof_resample(spark, samples, 100, 400, 100)
        got = {r["slot"]: r["value"] for r in out.collect()}
        # t=100: latest sample <= 100 is 95→1.0; t=200: still 1.0;
        # t=300/400: 250→2.0
        assert got == {100: 1.0, 200: 1.0, 300: 2.0, 400: 2.0}

    def test_exact_time_sample_visible(self, spark, make_datapoints):
        samples = make_datapoints([("a", 200, 5.0)]).select("path", "ts_sec", "value")
        out = asof_resample(spark, samples, 100, 300, 100)
        got = {r["slot"]: r["value"] for r in out.collect()}
        assert got == {100: None, 200: 5.0, 300: 5.0}


class TestNullPolicies:
    def grid(self, spark):
        return spark.createDataFrame(
            [(60, None), (120, 1.0), (180, None), (240, 2.0), (300, None)],
            "slot bigint, value double",
        )

    def test_zero(self, spark):
        out = apply_null_policy(self.grid(spark), "zero").orderBy("slot")
        assert [r["value"] for r in out.collect()] == [0.0, 1.0, 0.0, 2.0, 0.0]

    def test_hold_leading_null_stays(self, spark):
        out = apply_null_policy(self.grid(spark), "hold").orderBy("slot")
        assert [r["value"] for r in out.collect()] == [None, 1.0, 1.0, 2.0, 2.0]

    def test_null_identity(self, spark):
        out = apply_null_policy(self.grid(spark), "null").orderBy("slot")
        assert [r["value"] for r in out.collect()] == [None, 1.0, None, 2.0, None]

    def test_connected_interpolates_interior_only(self, spark):
        # interior null at 180 lands midway between 1.0 and 2.0; edge nulls
        # have no second endpoint → stay null (F9 connected line mode)
        out = apply_null_policy(self.grid(spark), "connected").orderBy("slot")
        assert [r["value"] for r in out.collect()] == [None, 1.0, 1.5, 2.0, None]

    def test_connected_long_gap_is_linear_in_slot(self, spark):
        grid = spark.createDataFrame(
            [(0, 10.0), (60, None), (120, None), (180, None), (240, 50.0)],
            "slot bigint, value double",
        )
        out = apply_null_policy(grid, "connected").orderBy("slot")
        assert [r["value"] for r in out.collect()] == [10.0, 20.0, 30.0, 40.0, 50.0]

    def test_connected_per_series_partitions(self, spark):
        grid = spark.createDataFrame(
            [("a", 0, 0.0), ("a", 60, None), ("a", 120, 6.0),
             ("b", 0, 100.0), ("b", 60, None), ("b", 120, 200.0)],
            "path string, slot bigint, value double",
        )
        out = apply_null_policy(grid, "connected", partition_cols=["path"])
        got = {(r["path"], r["slot"]): r["value"] for r in out.collect()}
        assert got[("a", 60)] == 3.0
        assert got[("b", 60)] == 150.0  # b never sees a's values

    def test_defaults_by_method(self):
        assert default_modes_for_method("average") == ("connected", "null")
        assert default_modes_for_method("sum") == ("staircase", "zero")
        assert default_modes_for_method("max") == ("staircase", "hold")


class TestStaircase:
    def test_duplicates_previous_row(self, spark):
        rows = spark.createDataFrame(
            [(60, 1.0), (120, 2.0), (180, 3.0)], "slot bigint, value double"
        )
        out = staircase(rows).collect()
        got = [(r["slot"], r["value"]) for r in out]
        # each new t first repeats the previous value (L_DataGraph.lua:244-254)
        assert got == [(60, 1.0), (120, 1.0), (120, 2.0), (180, 2.0), (180, 3.0)]


class TestLocfChunked:
    def test_matches_plain_hold(self, spark):
        from datayours_spark.operators.align import locf_chunked
        import random

        rng = random.Random(7)
        rows = [
            (p, s * 10, float(rng.randint(0, 99)) if rng.random() < 0.4 else None)
            for p in ("a", "b", "c")
            for s in range(200)
        ]
        grid = spark.createDataFrame(rows, "path string, slot bigint, value double")
        plain = apply_null_policy(grid, "hold", partition_cols=["path"])
        chunked = locf_chunked(grid, chunk_span=170)  # not slot-aligned on purpose
        key = lambda r: (r["path"], r["slot"])  # noqa: E731
        assert sorted(chunked.collect(), key=key) == sorted(plain.collect(), key=key)

    def test_all_null_chunk_carries_through(self, spark):
        from datayours_spark.operators.align import locf_chunked

        rows = [("a", 0, 5.0)] + [("a", s, None) for s in range(1, 30)]
        grid = spark.createDataFrame(rows, "path string, slot bigint, value double")
        out = locf_chunked(grid, chunk_span=7).orderBy("slot").collect()
        assert [r["value"] for r in out] == [5.0] * 30
