"""Fetch semantics vs hand-computed goldens (L_DataWhisper.lua:346-411, 525-552)."""

from datayours_spark.operators.fetch import fetch_grid, lww_slots, time_grid


def rows_as_dict(df, key="slot", val="value"):
    return {r[key]: r[val] for r in df.collect()}


class TestLwwSlots:
    def test_last_write_wins(self, make_datapoints):
        dp = make_datapoints(
            [
                ("a", 100, 1.0),
                ("a", 130, 2.0),  # same 60s slot (60..119? no: 100→slot 60, 130→slot 120)
                ("a", 125, 3.0),  # slot 120, earlier ts than 130 → loses
                ("b", 100, 9.0),
            ]
        )
        out = lww_slots(dp, 60)
        got = {(r["path"], r["slot"]): r["value"] for r in out.collect()}
        assert got == {("a", 60): 1.0, ("a", 120): 2.0, ("b", 60): 9.0}

    def test_same_second_insertion_order(self, make_datapoints):
        # two writes in the same second: the later-arriving one wins
        dp = make_datapoints([("a", 100, 1.0), ("a", 100, 7.0)])
        out = lww_slots(dp, 60)
        assert out.collect()[0]["value"] == 7.0


class TestTimeGrid:
    def test_inclusive_quantized(self, spark):
        grid = time_grid(spark, 95, 250, 60)
        assert [r["slot"] for r in grid.orderBy("slot").collect()] == [60, 120, 180, 240]


class TestFetchGrid:
    def test_dense_with_nulls(self, spark, make_datapoints):
        dp = make_datapoints([("a", 100, 1.0), ("a", 260, 2.0), ("b", 100, 5.0)])
        out = fetch_grid(spark, dp, "a", 60, 300, 60)
        assert rows_as_dict(out) == {60: 1.0, 120: None, 180: None, 240: 2.0, 300: None}

    def test_clamp_to_oldest_and_now(self, spark, make_datapoints):
        dp = make_datapoints([("a", t, float(t)) for t in range(0, 601, 60)])
        # oldest=180 clamps from; now=420 clamps until
        out = fetch_grid(spark, dp, "a", 0, 10_000, 60, now=420, oldest=180)
        got = rows_as_dict(out)
        assert min(got) == 180 and max(got) == 420

    def test_future_range_empty(self, spark, make_datapoints):
        dp = make_datapoints([("a", 100, 1.0)])
        assert fetch_grid(spark, dp, "a", 500, 600, 60, now=400).count() == 0

    def test_beyond_retention_empty(self, spark, make_datapoints):
        dp = make_datapoints([("a", 100, 1.0)])
        assert fetch_grid(spark, dp, "a", 0, 50, 60, oldest=60).count() == 0
