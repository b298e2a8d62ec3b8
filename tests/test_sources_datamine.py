"""dataMine weekly-CSV source (L_DataBaseDM.lua; L_DataMineServer.lua)."""

import json
import shutil
from pathlib import Path

import pytest

from datayours_spark.sources.datamine import (
    apply_channel_filters,
    asof_query,
    range_scan,
    read_channels,
    read_config,
)

TMP = Path(__file__).resolve().parent / "_tmp" / "datamine"

WEEK = 7 * 86_400


@pytest.fixture(scope="module")
def db_dir(request):
    shutil.rmtree(TMP, ignore_errors=True)
    # channel 1: step signal, irregular gaps; channel 2: offset/filter target
    ch1 = {2821: [(2821 * WEEK + 10, 1.0), (2821 * WEEK + 5_000, 2.0)],
           2822: [(2822 * WEEK + 60, 3.0)]}
    ch2 = {2821: [(2821 * WEEK + 100, 50.0), (2821 * WEEK + 200, 500.0)]}
    for channel, weeks in ((1, ch1), (2, ch2)):
        for week, rows in weeks.items():
            f = TMP / "database" / str(channel) / "raw" / f"{week}.txt"
            f.parent.mkdir(parents=True, exist_ok=True)
            f.write_text("\n".join(f"{t},{v}" for t, v in rows) + "\n")
    config = {
        "Variables": [
            {"Id": 1, "Name": "temp", "DataOffset": 0.0, "FilterEnable": 0},
            {"Id": 2, "Name": "watts", "DataOffset": 10.0, "FilterEnable": 1,
             "Filterminimum": 0.0, "FilterMaximum": 400.0},
        ]
    }
    (TMP / "dataMineConfig.json").write_text(json.dumps(config))
    request.addfinalizer(lambda: shutil.rmtree(TMP, ignore_errors=True))
    return str(TMP)


class TestRead:
    def test_channels_and_weeks_from_path(self, spark, db_dir):
        df = read_channels(spark, db_dir)
        got = {(r["channel_id"], r["week"]) for r in df.collect()}
        assert got == {(1, 2821), (1, 2822), (2, 2821)}

    def test_week_pruning_in_plan(self, spark, db_dir):
        df = read_channels(spark, db_dir).where("week = 2821 AND channel_id = 1")
        assert df.count() == 2

    def test_config(self, spark, db_dir):
        cfg = {r["channel_id"]: r for r in read_config(spark, db_dir).collect()}
        assert cfg[2]["data_offset"] == 10.0 and cfg[2]["filter_enable"] == 1


class TestSemantics:
    def test_offset_and_clamp(self, spark, db_dir):
        out = apply_channel_filters(
            read_channels(spark, db_dir), read_config(spark, db_dir)
        )
        vals = sorted(
            r["value"] for r in out.where("channel_id = 2").collect()
        )
        # 50+10=60 (in range), 500+10 → clamped to 400
        assert vals == [60.0, 400.0]

    def test_range_scan_maxpoints(self, spark, db_dir):
        df = read_channels(spark, db_dir)
        t1, t2 = 2821 * WEEK, 2823 * WEEK
        assert range_scan(df, t1, t2, maxpoints=1).where("channel_id = 1").count() == 1

    def test_asof_resample(self, spark, db_dir):
        df = read_channels(spark, db_dir).where("channel_id = 1")
        t0 = 2821 * WEEK
        out = asof_query(spark, df, t0, t0 + 7_200, 3_600)
        got = {r["slot"]: r["value"] for r in out.collect()}
        # grid at t0 (no sample yet at exactly t0? sample at t0+10 → after) —
        # t0 has no earlier sample → null; t0+3600 → 1.0; t0+7200 → 2.0
        assert got == {t0: None, t0 + 3_600: 1.0, t0 + 7_200: 2.0}


class TestSearch:
    def test_string_substring_other_exact(self, spark, db_dir):
        from datayours_spark.sources.datamine import search_channels

        config = read_config(spark, db_dir)
        # substring match on name
        got = search_channels(config, name="att")  # matches 'watts'
        assert [r["channel_id"] for r in got.collect()] == [2]
        # exact match on non-string
        got = search_channels(config, channel_id=1).collect()
        assert [r["name"] for r in got] == ["temp"]
        # combined criteria, empty result
        assert search_channels(config, name="temp", channel_id=2).count() == 0


class TestCLI:
    """dmDB CLI dispatch (`L_DataMineServer.lua:502-567`)."""

    def test_csv_default_format(self, spark, db_dir):
        from datayours_spark.sources.datamine import dmdb_query

        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"channel": 1}, now=2823 * WEEK,
        )
        t0 = 2821 * WEEK
        # "%d,%g" lines, reference's trailing lone-"\n" element quirk
        assert out == f"{t0 + 10},1\n{t0 + 5000},2\n{2822 * WEEK + 60},3\n\n"

    def test_iso_format_and_time_range(self, spark, db_dir):
        from datayours_spark.sources.datamine import dmdb_query

        t0 = 2821 * WEEK
        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"channel": 1, "format": "iso", "start": t0, "until": t0 + 5000},
            now=2823 * WEEK,
        )
        lines = [ln for ln in out.split("\n") if ln]
        assert len(lines) == 2 and lines[0].endswith(",1")
        assert "T" in lines[0]  # ISO 8601 datetime

    def test_search_key_picks_first_index_match(self, spark, db_dir):
        from datayours_spark.sources.datamine import dmdb_query

        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"name": "watts", "dt": "week", "t2": 2822 * WEEK},
            now=2823 * WEEK,
        )
        # channel 2's two samples fall in [t2-week, t2]
        assert out.count(",") == 2
        assert dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"name": "nosuch"}, now=2823 * WEEK,
        ) == "cursor key not found"

    def test_chart_format(self, spark, db_dir):
        from datayours_spark.sources.datamine import dmdb_query

        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"channel": 2, "format": "LineChart"}, now=2823 * WEEK,
        )
        assert "google.visualization.ChartWrapper(" in out
        assert "chartType:'LineChart'" in out
        assert "{v: new Date (" in out
        assert "title:'Id=2, Name=watts'" in out

    def test_maxpoints_cap(self, spark, db_dir):
        from datayours_spark.sources.datamine import dmdb_query

        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"channel": 1}, now=2823 * WEEK, maxpoints=1,
        )
        assert out == f"{2821 * WEEK + 10},1\n\n"
