"""Render format byte-parity (graphite_cgi.lua:318-371)."""

from datayours_spark.render.formats import (
    fetched_to_series,
    render_csv,
    render_csv_df,
    render_json,
)


class TestCsv:
    def test_lines_with_nil(self):
        rows = [("a.b", 1704067200, 1.5), ("a.b", 1704070800, None)]
        assert render_csv(rows) == (
            "a.b,2024-01-01 00:00:00,1.5\na.b,2024-01-01 01:00:00,nil"
        )

    def test_number_formatting_14g(self):
        # Lua tostring uses %.14g
        assert render_csv([("x", 0, 0.1)]).endswith(",0.1")
        assert render_csv([("x", 0, 185.22)]).endswith(",185.22")
        assert render_csv([("x", 0, 2.0)]).endswith(",2")


class TestJson:
    def test_document_shape(self):
        doc = render_json([("a.b", [(100, 1.0), (160, None), (220, 3.5)])])
        assert doc == "\n".join(
            [
                "[",
                "",
                "{",
                '  "target": "a.b",',
                '  "datapoints": [',
                "  [1, 100],",
                "  [null, 160],",
                "  [3.5, 220]",
                "  ]",
                "}",
                "]",
            ]
        )

    def test_multi_series_comma(self):
        doc = render_json([("a", [(1, 1.0)]), ("b", [(2, 2.0)])])
        # series separated by a bare comma line, final comma overwritten by ]
        assert doc.count('"target"') == 2
        assert doc.splitlines()[-1] == "]"
        assert "," in doc.splitlines()[8]

    def test_valid_json_parse(self):
        import json

        doc = render_json([("a.b", [(100, 1.0), (160, None)])])
        parsed = json.loads(doc)
        assert parsed[0]["target"] == "a.b"
        assert parsed[0]["datapoints"] == [[1, 100], [None, 160]]


class TestDistributed:
    def test_csv_df_matches_driver_side(self, spark):
        grid = spark.createDataFrame(
            [("a.b", 1704067200, 1.5), ("a.b", 1704070800, None)],
            "path string, slot bigint, value double",
        )
        lines = [r["line"] for r in render_csv_df(grid).orderBy("line").collect()]
        assert lines == [
            "a.b,2024-01-01 00:00:00,1.5",
            "a.b,2024-01-01 01:00:00,nil",
        ]

    def test_fetched_to_series(self, spark):
        grid = spark.createDataFrame(
            [("b", 2, 2.0), ("a", 1, 1.0), ("a", 2, None)],
            "path string, slot bigint, value double",
        )
        assert fetched_to_series(grid) == [
            ("a", [(1, 1.0), (2, None)]),
            ("b", [(2, 2.0)]),
        ]


class TestJsonNumberQuirks:
    def test_nan_inf_representation(self):
        import math

        from datayours_spark.render.formats import json_number

        assert json_number(float("nan")) == "null"
        assert json_number(math.inf) == "8.88e888"
        assert json_number(-math.inf) == "-8.88e888"
        assert json_number(2.0) == "2"
        assert json_number(0.125) == "0.125"


class TestSyslogLine:
    def test_format(self):
        from datayours_spark.render.formats import syslog_line

        # 2024-01-08 00:00:05 UTC
        got = syslog_line("metrics.a 1 99", host="vera1", when=1_704_672_005)
        assert got == "<14>Jan 08 00:00:05 vera1 DataDaemon: metrics.a 1 99\n"
