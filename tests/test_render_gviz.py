"""gviz DataTable emitter + dmDB CLI formats (L_DataLibrary.lua:165-330,
L_DataMineServer.lua:502-591)."""

import pytest

from datayours_spark.render.gviz import (
    chart_html,
    gviz_chart,
    gviz_datatable,
    js_number,
    to_jscr,
)
from datayours_spark.sources.datamine import DT_SECONDS, resolve_times


class TestToJScr:
    def test_scalars(self):
        assert to_jscr(None) == "null"
        assert to_jscr(True) == "true"
        assert to_jscr(42) == "42"
        assert to_jscr(42.5) == "42.5"
        assert to_jscr("a'b") == r"'a\'b'"

    def test_containers_bare_keys_single_quotes(self):
        # toJScr emits bare object keys and single-quoted strings
        # (`L_DataLibrary.lua:163,178-180`)
        assert to_jscr({"chartType": "LineChart", "n": 1}) == "{chartType:'LineChart',n:1}"
        assert to_jscr([1, "x", None]) == "[1,'x',null]"

    def test_number_is_lua_tostring(self):
        # Lua tostring = %.14g; integer-valued floats print without '.0'
        assert js_number(1704067200000.0) == "1704067200000"
        assert js_number(0.1) == "0.1"


class TestDataTable:
    def test_shape_and_cell_formats(self):
        # datetime → new Date(ms), null cell → null
        # (`L_DataLibrary.lua:190,227-255`)
        out = gviz_datatable(
            [("datetime", "Time"), ("number", "Value")],
            [(1_704_067_200, 1.5), (1_704_067_260, None)],
        )
        assert out == (
            "\n{cols: [{type:'datetime',label:'Time'},{type:'number',label:'Value'}]"
            ",\nrows: [\n"
            "{c:[{v: new Date (1704067200000)},{v: 1.5}]},\n"
            "{c:[{v: new Date (1704067260000)},{v: null}]}]\n}"
        )

    def test_formatted_cell_and_timeofday(self):
        out = gviz_datatable(
            [("timeofday", "t"), ("string", "s")],
            [(3_661, (None, "n/a"))],  # 01:01:01 UTC
        )
        assert "{v: [1,1,1]}" in out
        assert "{v: null, f: 'n/a'}" in out

    def test_unsupported_type_raises(self):
        # addColumn errors on unknown types (`L_DataLibrary.lua:206-208`)
        with pytest.raises(ValueError, match="unsupported column type"):
            gviz_datatable([("blob", "x")], [])


class TestChart:
    def test_wrapper_page(self):
        html = gviz_chart([(100, 1.0)], "LineChart", title="Id=1")
        assert html.startswith("<!DOCTYPE html>")
        assert "google.visualization.ChartWrapper(" in html
        # defaults: height 500, legend none (`L_DataMineServer.lua:432`)
        assert "{title:'Id=1',height:500,legend:'none'}" in to_jscr_line(html)
        assert "new Date (100000)" in html

    def test_container_id(self):
        html = chart_html("\n{cols: [],\nrows: [\n]\n}", "Table")
        assert "containerId:'gVizDiv'" in html
        assert "<div id='gVizDiv'>" in html


def to_jscr_line(html: str) -> str:
    # the ChartWrapper options literal is on its own line
    return next(line for line in html.splitlines() if line.startswith("{options:"))


class TestResolveTimes:
    NOW = 1_704_067_200

    def test_dt_extends_missing_endpoint(self):
        # `L_DataMineServer.lua:518-526`
        assert resolve_times(t1=100, dt="day", now=self.NOW) == (100, 100 + 86_400)
        assert resolve_times(t2=100 + 86_400, dt="day", now=self.NOW) == (100, 100 + 86_400)

    def test_dt_alone_anchors_to_now(self):
        t1, t2 = resolve_times(dt="week", now=self.NOW)
        assert (t1, t2) == (self.NOW - 7 * 86_400, self.NOW)

    def test_dt_ignored_when_both_given(self):
        assert resolve_times(t1=1, t2=2, dt="year", now=self.NOW) == (1, 2)

    def test_month_is_31_days(self):
        # dmDB's month=31d differs from the Graphite parse's mon=30d
        assert DT_SECONDS["month"] == 31 * 86_400

    def test_unparseable_defaults(self):
        # getTime failure → t1 falls back to now-24h, t2 to now
        # (`L_DataMineServer.lua:512-513`)
        t1, t2 = resolve_times(t1="garbage", t2="junk", now=self.NOW)
        assert (t1, t2) == (self.NOW - 86_400, self.NOW)

    def test_no_times_is_open_range(self):
        assert resolve_times(now=self.NOW) == (None, None)

    def test_bad_dt_raises(self):
        with pytest.raises(ValueError, match="bad dt"):
            resolve_times(dt="fortnight", now=self.NOW)
