"""Resolution routing (L_DataWhisper.lua:544-549) over a cascaded RollupSet."""

import pytest

from datayours_spark.kernel.archives import parse_retention_str
from datayours_spark.plans.router import RollupSet

ARCHIVES = parse_retention_str("1m:1h,10m:6h,1h:1d")
NOW = 100_000


@pytest.fixture()
def rollups(spark, make_datapoints):
    # one point every 5 minutes across the last day
    rows = [("s", NOW - 86_400 + i * 300, float(i)) for i in range(288)]
    return RollupSet.build(make_datapoints(rows), ARCHIVES, method="average", xff=0.0)


class TestRouting:
    def test_recent_range_uses_finest(self, rollups):
        assert rollups.route(NOW - 1_800, NOW) == 60

    def test_older_range_uses_coarser(self, rollups):
        assert rollups.route(NOW - 4 * 3_600, NOW) == 600
        assert rollups.route(NOW - 20 * 3_600, NOW) == 3_600

    def test_beyond_retention_falls_to_coarsest(self, rollups):
        assert rollups.route(NOW - 10 * 86_400, NOW) == 3_600


class TestPerSeriesMeta:
    def test_build_dispatches_method_and_xff_per_series(
        self, spark, make_datapoints
    ):
        """The cascade applies each series' conf-assigned method/xff
        (`L_DataWhisper.lua:493-523`); unmatched paths use the defaults."""
        archives = parse_retention_str("1m:1h,10m:6h")
        t0 = 96_000  # 600-aligned
        rows = [
            (p, t0 + i * 60, float(i + 1))
            for p in ("a.sum", "b.max", "c.default")
            for i in range(10)
        ]
        # d.sparse: 2 of 10 minute slots known → gated at xff 0.5, not 0.1
        rows += [("d.sparse", t0 + i * 60, 1.0) for i in (0, 1)]
        meta = spark.createDataFrame(
            [("a.sum", "sum", 0.0), ("b.max", "max", 0.0),
             ("d.sparse", "average", 0.1)],
            "path string, method string, xff double",
        )
        rs = RollupSet.build(
            make_datapoints(rows), archives, method="average", xff=0.5,
            series_meta=meta,
        )
        lvl = {
            (r["path"], r["slot"]): r["value"]
            for r in rs.levels[600].collect()
        }
        assert lvl[("a.sum", t0)] == 55.0      # sum(1..10)
        assert lvl[("b.max", t0)] == 10.0      # max
        assert lvl[("c.default", t0)] == 5.5   # default average
        assert lvl[("d.sparse", t0)] == 1.0    # own xff 0.1 admits 2/10
        # ...but the default xff 0.5 would have gated it:
        rs_def = RollupSet.build(
            make_datapoints(rows), archives, method="average", xff=0.5,
        )
        gated = {
            (r["path"], r["slot"])
            for r in rs_def.levels[600].collect()
        }
        assert ("d.sparse", t0) not in gated


class TestRoutedFetch:
    def test_fetch_recent(self, spark, rollups):
        step, grid = rollups.fetch(spark, "s", NOW - 1_200, NOW, NOW)
        assert step == 60
        rows = grid.collect()
        assert len(rows) == 21  # inclusive quantized grid
        assert sum(r["value"] is not None for r in rows) == 4  # 5-min cadence

    def test_fetch_older_aggregates(self, spark, rollups):
        step, grid = rollups.fetch(spark, "s", NOW - 5 * 3_600, NOW - 4 * 3_600, NOW)
        assert step == 600
        rows = [r for r in grid.collect() if r["value"] is not None]
        assert rows, "10m level should have aggregated values"

    def test_future_range_empty(self, spark, rollups):
        _, grid = rollups.fetch(spark, "s", NOW + 100, NOW + 200, NOW)
        assert grid.count() == 0

    def test_fetch_many_matches_per_path_fetch(self, spark, make_datapoints):
        """The single-pass multi-target fetch returns exactly the union of
        per-path fetches (one scan instead of N plan copies)."""
        rows = [("s", NOW - 86_400 + i * 300, float(i)) for i in range(288)]
        rows += [("t", NOW - 86_400 + i * 600, float(i * 2)) for i in range(144)]
        rs = RollupSet.build(
            make_datapoints(rows), ARCHIVES, method="average", xff=0.0
        )
        frm, until = NOW - 5 * 3_600, NOW - 4 * 3_600
        step_m, grid = rs.fetch_many(spark, ["s", "t"], frm, until, NOW)
        many = {(r["path"], r["slot"]): r["value"] for r in grid.collect()}
        singles = {}
        for p in ("s", "t"):
            step, g = rs.fetch(spark, p, frm, until, NOW)
            assert step == step_m
            singles.update({(p, r["slot"]): r["value"] for r in g.collect()})
        assert many == singles and many

    def test_fetch_many_future_range_empty(self, spark, rollups):
        _, grid = rollups.fetch_many(spark, ["s"], NOW + 100, NOW + 200, NOW)
        assert grid.count() == 0

    def test_clamps_to_retention(self, spark, rollups):
        step, grid = rollups.fetch(spark, "s", NOW - 10 * 86_400, NOW, NOW)
        assert step == 3_600
        slots = [r["slot"] for r in grid.collect()]
        # grid starts at the coarsest archive's oldest slot, not 10 days back
        assert min(slots) >= NOW - 86_400 - 3_600
