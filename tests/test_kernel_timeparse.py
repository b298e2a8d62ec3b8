"""Time parsing quirks (SURVEY.md §2.7 F1-F2; L_DataGraph.lua:62-98)."""

from datayours_spark.kernel.timeparse import (
    default_render_range,
    parse_iso8601,
    parse_relative_time,
    parse_time,
)

NOW = 1_700_000_000


class TestRelative:
    def test_basic_units(self):
        # now - n*unit*0.998 (the deliberate 0.2% shrink)
        assert parse_relative_time("-2d", NOW) == int(NOW - 2 * 86400 * 0.998)
        assert parse_relative_time("-30min", NOW) == int(NOW - 30 * 60 * 0.998)
        assert parse_relative_time("-1y", NOW) == int(NOW - 365 * 86400 * 0.998)
        assert parse_relative_time("-1w", NOW) == int(NOW - 7 * 86400 * 0.998)
        assert parse_relative_time("-1mon", NOW) == int(NOW - 30 * 86400 * 0.998)

    def test_default_count_is_one(self):
        assert parse_relative_time("-d", NOW) == int(NOW - 86400 * 0.998)

    def test_non_relative_returns_none(self):
        assert parse_relative_time("2024-01-01", NOW) is None
        assert parse_relative_time("-5parsecs", NOW) is None


class TestIso:
    def test_full(self):
        # 2024-01-02T03:04:05 UTC
        assert parse_iso8601("2024-01-02T03:04:05") == 1704164645

    def test_partial_defaults(self):
        # missing time → hour defaults to 12 (noon), not 0
        assert parse_iso8601("2024-01-02") == 1704164645 - (3 * 3600 + 4 * 60 + 5) + 12 * 3600
        # year only → Jan 1, noon
        assert parse_iso8601("2024") == parse_iso8601("2024-01-01T12:00:00")

    def test_ordinal_date(self):
        # 2024-032 = Feb 1 2024 (day 32), noon
        assert parse_iso8601("2024-032") == parse_iso8601("2024-02-01T12:00:00")

    def test_garbage(self):
        assert parse_iso8601("not-a-time") is None


class TestCascade:
    def test_epoch_passthrough(self):
        assert parse_time("1700000000") == 1700000000
        assert parse_time(1700000000) == 1700000000

    def test_cascade_order(self):
        assert parse_time("-1d", NOW) == int(NOW - 86400 * 0.998)
        assert parse_time("2024-01-02T03:04:05") == 1704164645

    def test_default_render_range(self):
        frm, until = default_render_range(NOW)
        assert until == NOW
        assert frm == int(NOW - 86400 * 0.998)
