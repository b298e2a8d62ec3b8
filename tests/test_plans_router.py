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

    def test_clamps_to_retention(self, spark, rollups):
        step, grid = rollups.fetch(spark, "s", NOW - 10 * 86_400, NOW, NOW)
        assert step == 3_600
        slots = [r["slot"] for r in grid.collect()]
        # grid starts at the coarsest archive's oldest slot, not 10 days back
        assert min(slots) >= NOW - 86_400 - 3_600
