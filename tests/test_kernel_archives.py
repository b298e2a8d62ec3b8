"""Archive spec semantics (SURVEY.md §2.7 F10, §1.3; L_DataWhisper.lua:183-311)."""

import pytest

from datayours_spark.kernel.archives import (
    Archive,
    ArchiveSpecError,
    format_archives,
    max_retention,
    parse_retention_def,
    parse_retention_str,
    select_read_archive,
    select_write_archive,
    validate_archives,
)


class TestParse:
    def test_plain_point_count(self):
        # "60:1440" = 60 s per point, 1440 raw points (no unit → count)
        assert parse_retention_def("60:1440") == Archive(60, 1440)

    def test_unit_retention_divides(self):
        # "15m:8" → 900 s per point, 8 points (retention has no unit)
        assert parse_retention_def("15m:8") == Archive(900, 8)
        # "1h:7d" → 3600 spp, 7*86400/3600 = 168 points
        assert parse_retention_def("1h:7d") == Archive(3600, 168)
        # "12h:2y" → 43200 spp, floor(2*365*86400/43200) = 1460
        assert parse_retention_def("12h:2y") == Archive(43200, 1460)

    def test_full_spec(self):
        archives = parse_retention_str("1s:1m,1m:1d,5m:7d,1h:90d,6h:1y,1d:5y")
        assert [(a.seconds_per_point, a.points) for a in archives] == [
            (1, 60),
            (60, 1440),
            (300, 2016),
            (3600, 2160),
            (21600, 1460),
            (86400, 1825),
        ]

    def test_invalid(self):
        with pytest.raises(ArchiveSpecError):
            parse_retention_def("1x:7d")
        with pytest.raises(ArchiveSpecError):
            parse_retention_str("")


class TestValidate:
    def test_sorted_by_precision(self):
        archives = validate_archives([Archive(3600, 168), Archive(60, 1440)])
        assert archives[0].seconds_per_point == 60

    def test_duplicate_precision_rejected(self):
        with pytest.raises(ArchiveSpecError, match="same precision"):
            validate_archives([Archive(60, 100), Archive(60, 200)])

    def test_divisibility_rejected(self):
        with pytest.raises(ArchiveSpecError, match="evenly divide"):
            validate_archives([Archive(60, 1000), Archive(90, 1000)])

    def test_retention_ordering_rejected(self):
        # lower precision must cover a strictly larger interval
        with pytest.raises(ArchiveSpecError, match="larger time intervals"):
            validate_archives([Archive(60, 120), Archive(120, 60)])

    def test_consolidation_points_rejected(self):
        # archive 1 has 5 points but needs 60/1=60 to build one point of archive 2
        with pytest.raises(ArchiveSpecError, match="enough points"):
            validate_archives([Archive(1, 5), Archive(60, 1000)])


class TestFormat:
    def test_round_trip(self):
        spec = "1s:1m,1m:1d,5m:7d,1h:90d,6h:1y,1d:5y"
        assert format_archives(parse_retention_str(spec)) == spec

    def test_largest_unit_wins(self):
        # 60 s formats as "1m" (largest unit dividing evenly), 90 s stays "90s"
        assert format_archives([Archive(90, 40)]) == "90s:1h"
        assert format_archives([Archive(60, 60)]) == "1m:1h"


class TestArchiveMath:
    def test_quantize(self):
        a = Archive(300, 12)
        assert a.quantize(1000) == 900
        assert a.quantize(900) == 900

    def test_oldest(self):
        # oldest = quantize(now) - retention + spp  (L_DataWhisper.lua:332)
        a = Archive(60, 10)  # 600 s retention
        assert a.oldest(1234) == 1200 - 600 + 60

    def test_select_write_archive(self):
        archives = parse_retention_str("1m:1h,5m:1d,1h:7d")
        # fresh point → finest archive
        assert select_write_archive(archives, 10)[0] == 0
        # older than 1h → second archive
        assert select_write_archive(archives, 3601)[0] == 1
        # older than 1d → third
        assert select_write_archive(archives, 90000)[0] == 2
        # older than everything → falls through to coarsest (update() would
        # have rejected it before this point via maxRetention)
        assert select_write_archive(archives, 10**9)[0] == 2

    def test_select_read_archive(self):
        archives = parse_retention_str("1m:1h,5m:1d,1h:7d")
        now = 1_000_000
        # from within the last hour → finest
        assert select_read_archive(archives, now - 100, now).seconds_per_point == 60
        # from 2 hours back → 5m archive
        assert select_read_archive(archives, now - 7200, now).seconds_per_point == 300
        # from 2 days back → 1h archive
        assert select_read_archive(archives, now - 2 * 86400, now).seconds_per_point == 3600

    def test_max_retention(self):
        assert max_retention(parse_retention_str("1m:1h,1h:7d")) == 7 * 86400
