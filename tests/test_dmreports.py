"""dataMine report/plot actions (`L_DataMineServer.lua:258-493,528-537`):
Graphs config subset, gviz report tables, treemaps, multi-channel plot."""

import json
import shutil
from pathlib import Path

import pytest

from datayours_spark.render.dmreports import (
    GRAPH_ICONS,
    channel_name,
    graph_plot,
    plot_range,
    read_graphs,
    report_channels,
    report_datamine_map,
    report_graphmap,
    report_graphs,
    report_timeline,
    show_tooltip,
    tree_table,
)
from datayours_spark.sources.datamine import (
    dmdb_query,
    read_channels,
    read_config,
)

TMP = Path(__file__).resolve().parent / "_tmp" / "dmreports"

WEEK = 7 * 86_400
T0 = 2821 * WEEK

SRV_T = "urn:upnp-org:serviceId:TemperatureSensor1"
SRV_E = "urn:micasaverde-com:serviceId:EnergyMetering1"


@pytest.fixture(scope="module")
def db_dir(request):
    shutil.rmtree(TMP, ignore_errors=True)
    data = {
        1: [(T0 + 10, 1.0), (T0 + 5_000, 2.0)],
        2: [(T0 + 100, 50.0), (T0 + 200, 500.0)],
    }
    for channel, rows in data.items():
        f = TMP / "database" / str(channel) / "raw" / f"{2821}.txt"
        f.parent.mkdir(parents=True, exist_ok=True)
        f.write_text("\n".join(f"{t},{v}" for t, v in rows) + "\n")
    config = {
        "Variables": [
            {"Id": 1, "Name": "temp", "Device": 12, "Service": SRV_T,
             "Variable": "CurrentTemperature"},
            {"Id": 2, "Name": "watts", "Device": 7, "Service": SRV_E,
             "Variable": "Watts", "DataOffset": 10.0, "FilterEnable": 1,
             "Filterminimum": 0.0, "FilterMaximum": 400.0},
        ],
        "Graphs": [
            {"Name": "Climate", "Icon": 1, "Period": 7 * 86_400,
             "Channels": [
                 {"Device": 12, "Service": SRV_T,
                  "Variable": "CurrentTemperature"},
                 {"Device": 7, "Service": SRV_E, "Variable": "Watts"},
             ]},
        ],
    }
    (TMP / "dataMineConfig.json").write_text(json.dumps(config))
    request.addfinalizer(lambda: shutil.rmtree(TMP, ignore_errors=True))
    return str(TMP)


class TestGraphsConfig:
    def test_read_graphs_subset(self, spark, db_dir):
        g = read_graphs(spark, db_dir).collect()
        assert len(g) == 1
        row = g[0]
        assert (row["graph_id"], row["name"], row["icon"], row["period"]) == (
            1, "Climate", 1, 7 * 86_400
        )
        assert [c["variable"] for c in row["channels"]] == [
            "CurrentTemperature", "Watts"
        ]

    def test_missing_graphs_section_is_empty(self, spark, tmp_path):
        (tmp_path / "dataMineConfig.json").write_text(
            json.dumps({"Variables": [{"Id": 1, "Name": "x"}]})
        )
        assert read_graphs(spark, str(tmp_path)).count() == 0


class TestHelpers:
    def test_channel_name_unique_match(self):
        rows = [{"channel_id": 1, "name": "temp", "device": 12,
                 "service": SRV_T, "variable": "CurrentTemperature"}]
        assert channel_name(rows, 12, SRV_T, "CurrentTemperature") == "temp"

    def test_channel_name_fallback_format(self):
        # no match → "dev = %03d, srv = %s, var = %s" with the service's
        # trailing word (`L_DataMineServer.lua:190`)
        assert channel_name([], 7, SRV_E, "Watts") == (
            "dev = 007, srv = EnergyMetering1, var = Watts"
        )

    def test_plot_range_is_rounded_inclusive(self):
        rng = plot_range(0, 10, 5)
        assert rng == [0, 3, 5, 8, 10]  # floor(t+0.5) at dt=2.5

    def test_tree_table_structure(self):
        data = [
            {"_label": "a", "type": "T", "id": 1},
            {"_label": "b", "type": "T", "id": 2},
            {"_label": "c", "type": "U", "id": 3},
        ]
        js = tree_table(data, root="R", branches=["type"], leaves=["id"])
        # root + 2 branch nodes + 3 leaves = 6 rows; id column is numeric
        assert js.count("{c:[") == 6
        assert "{type:'number',label:'id'}" in js
        # branch node T is the parent of two leaves
        assert "{v: 'T'}" not in js  # branch label goes through (v, f) form

    def test_show_tooltip_name_vs_definition(self):
        assert show_tooltip() == "showTooltip"
        assert show_tooltip("var toolTip = 'x';").startswith(
            "function showTooltip"
        )


class TestReports:
    def test_channels_directory(self, spark, db_dir):
        html = report_channels(read_config(spark, db_dir))
        assert "label:'Channel Name'" in html and "chartType:'Table'" in html
        # service column is the part after the last colon
        assert "{v: 'TemperatureSensor1'}" in html
        assert "{v: 'watts'}" in html and "{v: 7}" in html

    def test_timeline(self, spark, db_dir):
        html = report_timeline(
            read_channels(spark, db_dir), read_config(spark, db_dir)
        )
        assert "chartType:'Timeline'" in html
        assert f"'temp : 12.{SRV_T}.CurrentTemperature'" in html
        # epoch seconds render as JS Date in ms
        assert f"new Date ({(T0 + 10) * 1000})" in html

    def test_graphs_listing(self, spark, db_dir):
        html = report_graphs(
            read_graphs(spark, db_dir), read_config(spark, db_dir)
        )
        assert "graph=1" in html and "Climate" in html
        assert "{v: 'Temperature'}" in html  # icon 1 → name
        assert "{v: '7'}" in html  # Period / 86400 days, string column
        assert "temp<br>watts" in html

    def test_graphmap_treemap(self, spark, db_dir):
        html = report_graphmap(
            read_graphs(spark, db_dir), read_config(spark, db_dir)
        )
        assert "chartType:'TreeMap'" in html
        assert "function showTooltip" in html
        assert "generateTooltip:'showTooltip'" in html
        assert f"maxColorValue:{len(GRAPH_ICONS)}" in html

    def test_datamine_map_treemap(self, spark, db_dir):
        html = report_datamine_map(read_config(spark, db_dir))
        assert "chartType:'TreeMap'" in html
        # service type strips the trailing digits and 'Sensor'
        assert "{v: 'Temperature - CurrentTemperature'}" in html
        assert "{v: 'dataMine #2'}" in html


class TestGraphPlot:
    def test_multi_channel_asof_with_filters(self, spark, db_dir):
        html = graph_plot(
            spark,
            read_channels(spark, db_dir),
            read_config(spark, db_dir),
            read_graphs(spark, db_dir),
            graph_id=1,
            t1=T0,
            now=T0 + 400,
            options={},
            points=5,
        )
        assert "title:'Climate'" in html and "legend:'bottom'" in html
        assert "{type:'number',label:'temp'}" in html
        assert "{type:'number',label:'watts'}" in html
        # grid [T0, +100, +200, +300, +400]: temp holds 1.0 from T0+10 on;
        # watts 50+10=60 at +100, 500+10 clamped to 400 from +200 on
        assert "{v: 60}" in html and "{v: 400}" in html

    def test_unknown_graph(self, spark, db_dir):
        out = graph_plot(
            spark, read_channels(spark, db_dir),
            read_config(spark, db_dir), read_graphs(spark, db_dir),
            graph_id=9,
        )
        assert out == "no such graph"


class TestCliDispatch:
    def test_report_action_from_params(self, spark, db_dir):
        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"report": "channels"},
        )
        assert "chartType:'Table'" in out

    def test_graph_action_from_params(self, spark, db_dir):
        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"graph": "1", "t1": str(T0)}, now=T0 + 400,
            graphs=read_graphs(spark, db_dir),
        )
        assert "title:'Climate'" in out

    def test_plot_action_is_linechart_cursor_path(self, spark, db_dir):
        out = dmdb_query(
            read_channels(spark, db_dir), read_config(spark, db_dir),
            {"plot": "1", "t1": str(T0 - 100), "t2": str(T0 + 6_000)},
            now=T0 + 6_000,
        )
        assert "chartType:'LineChart'" in out
        assert "Id=1" in out and "Name=temp" in out

    def test_graph_with_unresolvable_channels(self, spark, db_dir):
        # a graph whose channels match no config entry renders an
        # all-null chart (fallback names), not an error
        from datayours_spark.render.dmreports import empty_graphs

        g = spark.createDataFrame(
            [(0, 1, "Ghost", 1, 86_400,
              [(99, "urn:x:serviceId:Nope1", "Missing")])],
            empty_graphs(spark).schema,
        )
        html = graph_plot(
            spark, read_channels(spark, db_dir), read_config(spark, db_dir),
            g, graph_id=1, t1=T0, now=T0 + 400, points=3,
        )
        assert "title:'Ghost'" in html
        assert "label:'dev = 099, srv = Nope1, var = Missing'" in html


class TestDataRequestHttp:
    """The Vera data_request front door: id=lr_dmDB over WSGI
    (`L_DataMineServer.lua:495-567`, URL shape from the report links)."""

    def _get(self, app, query):
        import io as _io

        env = {
            "REQUEST_METHOD": "GET", "PATH_INFO": "/data_request",
            "QUERY_STRING": query, "wsgi.input": _io.BytesIO(b""),
        }
        captured = {}

        def start_response(status, headers):
            captured["status"] = status
            captured["headers"] = dict(headers)

        body = b"".join(app(env, start_response)).decode()
        return captured["status"], captured["headers"], body

    def test_lr_dmdb_csv_and_report(self, spark, db_dir):
        from datayours_spark.http import GraphiteApp

        app = GraphiteApp(
            spark, spark.range(0).selectExpr(
                "'x' AS path", "id AS ts_sec", "CAST(id AS DOUBLE) AS value"
            ),
            now=T0 + 6_000, dm_dir=db_dir,
        )
        st, hdr, body = self._get(
            app, f"id=lr_dmDB&channel=1&t1={T0 - 100}&t2={T0 + 6000}"
        )
        assert st.startswith("200")
        assert hdr["Content-Type"] == "text/plain"
        assert f"{T0 + 10},1" in body
        st, hdr, body = self._get(app, "id=lr_dmDB&report=channels")
        assert st.startswith("200")
        assert hdr["Content-Type"] == "text/html"
        assert "chartType:'Table'" in body

    def test_other_handler_ids_501(self, spark, db_dir):
        from datayours_spark.http import GraphiteApp

        app = GraphiteApp(
            spark, spark.range(0).selectExpr(
                "'x' AS path", "id AS ts_sec", "CAST(id AS DOUBLE) AS value"
            ),
            dm_dir=db_dir,
        )
        st, _, _ = self._get(app, "id=lr_other")
        assert st.startswith("501")

    def test_live_db_updates_visible_per_request(self, spark, tmp_path):
        """ADVICE r5: the reference opens cursors against the LIVE DB per
        request — a weekly CSV written while the server runs must show up
        on the next request (no stale first-request snapshot)."""
        import json as _json

        from datayours_spark.http import GraphiteApp

        db = tmp_path / "dm"
        f1 = db / "database" / "1" / "raw" / "2821.txt"
        f1.parent.mkdir(parents=True)
        f1.write_text(f"{T0 + 10},1.0\n")
        (db / "dataMineConfig.json").write_text(_json.dumps({
            "Variables": [
                {"Id": 1, "Name": "temp", "Device": 12, "Service": SRV_T,
                 "Variable": "CurrentTemperature", "DataOffset": 0.0,
                 "FilterEnable": 0, "Filterminimum": 0.0,
                 "FilterMaximum": 0.0},
            ],
        }))
        app = GraphiteApp(
            spark, spark.range(0).selectExpr(
                "'x' AS path", "id AS ts_sec", "CAST(id AS DOUBLE) AS value"
            ),
            now=T0 + 8 * 86_400, dm_dir=str(db),
        )
        q = f"id=lr_dmDB&channel=1&t1={T0 - 100}&t2={T0 + 2 * WEEK}"
        st, _, body = self._get(app, q)
        assert st.startswith("200") and f"{T0 + 10},1" in body
        # a new week lands while the server is running
        f2 = db / "database" / "1" / "raw" / "2822.txt"
        f2.write_text(f"{T0 + WEEK + 20},2.5\n")
        st, _, body = self._get(app, q)
        assert st.startswith("200")
        assert f"{T0 + WEEK + 20},2.5" in body, "new weekly file not picked up"

    def test_dm_cache_ttl_keeps_snapshot(self, spark, tmp_path):
        import json as _json

        from datayours_spark.http import GraphiteApp

        db = tmp_path / "dm"
        f1 = db / "database" / "1" / "raw" / "2821.txt"
        f1.parent.mkdir(parents=True)
        f1.write_text(f"{T0 + 10},1.0\n")
        (db / "dataMineConfig.json").write_text(_json.dumps({
            "Variables": [
                {"Id": 1, "Name": "temp", "Device": 12, "Service": SRV_T,
                 "Variable": "CurrentTemperature", "DataOffset": 0.0,
                 "FilterEnable": 0, "Filterminimum": 0.0,
                 "FilterMaximum": 0.0},
            ],
        }))
        app = GraphiteApp(
            spark, spark.range(0).selectExpr(
                "'x' AS path", "id AS ts_sec", "CAST(id AS DOUBLE) AS value"
            ),
            now=T0 + 8 * 86_400, dm_dir=str(db), dm_cache_ttl=3600.0,
        )
        q = f"id=lr_dmDB&channel=1&t1={T0 - 100}&t2={T0 + 2 * WEEK}"
        self._get(app, q)
        (db / "database" / "1" / "raw" / "2822.txt").write_text(
            f"{T0 + WEEK + 20},2.5\n"
        )
        st, _, body = self._get(app, q)
        assert st.startswith("200")
        assert f"{T0 + WEEK + 20},2.5" not in body  # snapshot held by TTL
