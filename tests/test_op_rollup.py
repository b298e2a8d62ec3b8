"""Rollup + xFilesFactor goldens (L_DataWhisper.lua:469-523, 194-215)."""

import pytest

from datayours_spark.operators.fetch import lww_slots
from datayours_spark.operators.rollup import rollup, rollup_all_methods


@pytest.fixture()
def fine_slots(make_datapoints):
    # path a: 60s slots at 0,60,120 with values 1,2,3 (3 of 5 slots known)
    # path b: only slot 0 with value 10          (1 of 5 slots known)
    def _make(spark):
        dp = make_datapoints(
            [("a", 0, 1.0), ("a", 60, 2.0), ("a", 120, 3.0), ("b", 0, 10.0)]
        )
        return lww_slots(dp, 60)

    return _make


class TestMethods:
    @pytest.mark.parametrize(
        "method,expected",
        [
            ("average", 2.0),
            ("sum", 6.0),
            ("max", 3.0),
            ("min", 1.0),
            ("last", 3.0),  # latest slot's value (L_DataWhisper.lua:211)
        ],
    )
    def test_aggregate_over_known(self, spark, fine_slots, method, expected):
        out = rollup(fine_slots(spark), 60, 300, method=method, xff=0.0)
        got = {r["path"]: r["value"] for r in out.collect()}
        assert got["a"] == expected


class TestXff:
    def test_gate_blocks_sparse_series(self, spark, fine_slots):
        # a has 3/5 known (0.6), b has 1/5 (0.2)
        out = rollup(fine_slots(spark), 60, 300, method="average", xff=0.5)
        got = {r["path"] for r in out.collect()}
        assert got == {"a"}

    def test_xff_zero_passes_everything(self, spark, fine_slots):
        out = rollup(fine_slots(spark), 60, 300, method="average", xff=0.0)
        assert {r["path"] for r in out.collect()} == {"a", "b"}

    def test_xff_one_requires_full_window(self, spark, make_datapoints):
        dp = make_datapoints([("c", t, 1.0) for t in range(0, 300, 60)])
        full = rollup(lww_slots(dp, 60), 60, 300, method="average", xff=1.0)
        assert full.count() == 1  # all 5 slots known → passes


class TestPerSeriesDispatch:
    def test_method_from_meta(self, spark, fine_slots):
        meta = spark.createDataFrame(
            [("a", "sum", 0.0), ("b", "last", 0.0)],
            "path string, method string, xff double",
        )
        out = rollup_all_methods(fine_slots(spark), 60, 300, meta)
        got = {r["path"]: (r["value"], r["method"]) for r in out.collect()}
        assert got["a"] == (6.0, "sum")
        assert got["b"] == (10.0, "last")

    def test_default_method_and_xff(self, spark, fine_slots):
        meta = spark.createDataFrame([], "path string, method string, xff double")
        out = rollup_all_methods(fine_slots(spark), 60, 300, meta, default_xff=0.5)
        got = {r["path"]: r["value"] for r in out.collect()}
        assert got == {"a": 2.0}  # average; b gated out by xff 0.5

    def test_pruned_methods_match_full(self, spark, fine_slots):
        meta = spark.createDataFrame(
            [("a", "sum", 0.0), ("b", "last", 0.0)],
            "path string, method string, xff double",
        )
        full = rollup_all_methods(fine_slots(spark), 60, 300, meta)
        pruned = rollup_all_methods(
            fine_slots(spark), 60, 300, meta, methods=("sum", "last")
        )
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, full.collect())
        )
        # pruning drops the unneeded buffers from the aggregate
        plan = pruned._jdf.queryExecution().optimizedPlan().toString()
        assert "v_min" not in plan and "v_max" not in plan

    def test_method_outside_declared_set_fails_loudly(self, spark, fine_slots):
        meta = spark.createDataFrame(
            [("a", "min", 0.0)], "path string, method string, xff double"
        )
        out = rollup_all_methods(
            fine_slots(spark), 60, 300, meta, methods=("sum",)
        )
        with pytest.raises(Exception, match="outside the declared set"):
            out.collect()

    def test_unknown_method_rejected_at_build(self, spark, fine_slots):
        meta = spark.createDataFrame(
            [("a", "sum", 0.0)], "path string, method string, xff double"
        )
        with pytest.raises(ValueError, match="Unrecognized aggregation"):
            rollup_all_methods(
                fine_slots(spark), 60, 300, meta, methods=("median",)
            )
