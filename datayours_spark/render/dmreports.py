"""dataMine server report/plot actions — the dmDB CLI's gviz reports.

Spark-first re-expression of the dispatch block
`/root/reference/L_DataMineServer.lua:495-567` and its action bodies
(`:258-493`): `report=channels|timeline|graphs|graphmap|dataMine`,
`plot=<channel>` and `graph=<graph-id>`.  The data-side work (per-channel
first/last timestamps, as-of resampling onto a plot grid) runs as pruned
Spark jobs; the HTML assembly mirrors the reference's driver-side gviz
rendering — report payloads are config- or channel-count-sized (KBs), so
formatting on the driver is the correct shape exactly as it is for the
/render endpoint.

Helpers ported for structural parity (all plain Python, no Spark):

- :func:`tree_table` — the generic TreeMap DataTable builder
  (`L_DataMineServer.lua:215-245`): fixed (_id, _parent, _size, _colour,
  _level) columns plus leaf columns typed from the first data element.
- :func:`show_tooltip` — the tooltip JS wrapper (`:195-209`).
- :func:`channel_name` — key → display name (`:185-193`), falling back to
  the ``"dev = %03d, srv = %s, var = %s"`` form on a non-unique match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.render.gviz import chart_html, gviz_datatable

#: icon-id → name (`L_DataMineServer.lua:300-304,345-349`)
GRAPH_ICONS = (
    "Temperature", "Humidity", "Switch", "Light", "Energy", "Security",
    "High setpoint", "Low setpoint", "Weather", "Battery",
    "Time", "System", "Network", "Plug", "Remote Control",
    "Webcam", "Fire", "Computer", "Counter", "Curtains", "Gas",
)

#: treemap colour ramp (`L_DataMineServer.lua:46-50`)
COLOURS = {
    "minColor": "LightSkyBlue",
    "midColor": "Khaki",
    "maxColor": "LightCoral",
}


GRAPHS_SCHEMA = (
    "pos int, graph_id int, name string, icon int, period bigint, "
    "channels array<struct<device:int,service:string,variable:string>>"
)


def empty_graphs(spark: SparkSession) -> DataFrame:
    """A zero-row Graphs table (configs without a Graphs section)."""
    return spark.createDataFrame([], GRAPHS_SCHEMA)


def read_graphs(spark: SparkSession, db_dir: str) -> DataFrame:
    """The ``Graphs`` subset of dataMineConfig.json — ``getDBconfig
    (subset)`` (`L_DataBaseDM.lua:160-176`): (pos, graph_id, name, icon,
    period, channels array<struct<device,service,variable>>).

    ``graph_id`` is the 1-based array position — the reference addresses
    ``Graphs[p]`` by Lua array index (`L_DataMineServer.lua:381`)."""
    raw = spark.read.option("multiLine", "true").json(
        f"{db_dir}/dataMineConfig.json"
    )
    if "Graphs" not in raw.columns:
        return empty_graphs(spark)
    g = raw.select(F.posexplode("Graphs").alias("pos", "g"))
    return g.select(
        F.col("pos").cast("int").alias("pos"),
        (F.col("pos") + 1).cast("int").alias("graph_id"),
        F.col("g.Name").alias("name"),
        F.col("g.Icon").cast("int").alias("icon"),
        F.col("g.Period").cast("bigint").alias("period"),
        F.transform(
            "g.Channels",
            lambda c: F.struct(
                c["Device"].cast("int").alias("device"),
                c["Service"].alias("service"),
                c["Variable"].alias("variable"),
            ),
        ).alias("channels"),
    )


# ------------------------------------------------------------ helpers


def _search_rows(rows: list[dict], **key) -> list[dict]:
    """dmDB.search over collected config rows: string criteria by
    substring, everything else exact (`L_DataBaseDM.lua:82-99`)."""
    out = []
    for r in rows:
        for k, v in key.items():
            rv = r.get(k)
            if isinstance(v, str):
                if rv is None or v not in rv:
                    break
            elif rv != v:
                break
        else:
            out.append(r)
    return out


def channel_name(cfg_rows: list[dict], device, service, variable) -> str:
    """`channelName` (`L_DataMineServer.lua:185-193`)."""
    import re

    match = _search_rows(
        cfg_rows, device=device, service=service, variable=variable
    )
    if len(match) == 1:
        return match[0]["name"]
    srv_tail = re.search(r"\w*$", service or "").group(0)
    return "dev = %03d, srv = %s, var = %s" % (device or 0, srv_tail, variable)


def show_tooltip(code: str | None = None) -> str:
    """Tooltip JS (`L_DataMineServer.lua:195-209`): with no code, just the
    function NAME (what the chart options reference); with code, the full
    function definition to embed in the page."""
    if code is None:
        return "showTooltip"
    return "".join([
        "function showTooltip",
        """(row, size, value) {
      var startDiv = '<div style="background:#fd9; padding:10px; font-family:Arial; font-size:10pt;" >';
      var endDiv   = '</div>';
      var _colour  = data.getValue(row, 3);
      var _level   = data.getValue(row, 4);   // depth of treemap element
      """,
        code,
        """
      return startDiv + toolTip + endDiv;}
     """,
    ])


def tree_table(
    data: list[dict],
    root: str = "",
    branches: list[str] | None = None,
    leaves: list[str] | None = None,
) -> str:
    """Generic TreeMap DataTable (`L_DataMineServer.lua:212-245`).

    Each data element supplies ``_label`` / ``_size`` / ``_colour`` (with
    the reference's defaults) plus the named leaf fields; branch nodes are
    created lazily per distinct branch value.  Returns the DataTable JS
    literal."""
    branches = branches or []
    leaves = leaves or []
    first = data[0] if data else {}
    cols: list[tuple[str, str]] = [
        ("string", "_id"), ("string", "_parent"), ("number", "_size"),
        ("number", "_colour"), ("number", "_level"),
    ]
    for leaf in leaves:
        v = first.get(leaf)
        cols.append(
            ("number" if isinstance(v, (int, float)) else "string", leaf)
        )
    rows: list[tuple] = []
    counter = [0]

    def new_leaf(parent_id: str | None, x: dict, level) -> str:
        counter[0] += 1
        nid = str(counter[0])
        row = [
            (nid, x.get("_label") or nid),
            parent_id,
            x.get("_size", 1),
            x.get("_colour", x.get("_color", 0)),
            level,
        ]
        for leaf in leaves:
            row.append(x.get(leaf))
        rows.append(tuple(row))
        return nid

    root_id = new_leaf(None, {"_label": root, "_size": 0}, 0)
    branch_ids: dict[tuple, str] = {}
    for d in data:
        parent = root_id
        key: tuple = ()
        for i, f in enumerate(branches, start=1):
            index = d.get(f)
            if index is not None:
                key = key + (index,)
                if key not in branch_ids:
                    branch_ids[key] = new_leaf(
                        parent, {"_label": index, "_size": 0}, i
                    )
                parent = branch_ids[key]
        new_leaf(parent, d, None)
    return gviz_datatable(cols, rows)


def _collect_config(config: DataFrame) -> list[dict]:
    rows = [r.asDict() for r in config.orderBy("pos").collect()]
    for r in rows:
        r.setdefault("device", None)
        r.setdefault("service", None)
        r.setdefault("variable", None)
    return rows


def _collect_graphs(graphs: DataFrame) -> list[dict]:
    out = []
    for r in graphs.orderBy("pos").collect():
        d = r.asDict()
        d["channels"] = [c.asDict() for c in (d.get("channels") or [])]
        out.append(d)
    return out


def _icon_name(icon) -> str:
    if isinstance(icon, int) and 1 <= icon <= len(GRAPH_ICONS):
        return GRAPH_ICONS[icon - 1]
    return str(icon)


# ------------------------------------------------------------ reports


def report_channels(config: DataFrame, options: dict | None = None) -> str:
    """``report=channels`` — the channel directory Table
    (`L_DataMineServer.lua:284-297`)."""
    import re

    options = options or {}
    rows = []
    for r in _collect_config(config):
        srv = re.search(r"([^:]*)$", r["service"] or "").group(1)
        rows.append((r["channel_id"], r["name"], srv, r["variable"], r["device"]))
    table = gviz_datatable(
        [
            ("number", "Id"), ("string", "Channel Name"),
            ("string", "Service"), ("string", "Variable"),
            ("number", "Device No."),
        ],
        rows,
    )
    opt = {
        "width": options.get("width", 750),
        "height": options.get("height", 700),
    }
    return chart_html(table, "Table", opt)


def report_timeline(
    samples: DataFrame, config: DataFrame, options: dict | None = None
) -> str:
    """``report=timeline`` — per-channel coverage bars
    (`L_DataMineServer.lua:258-282`): one Spark aggregation for every
    channel's first/last sample, then the Timeline chart."""
    options = options or {}
    stats = {
        r["channel_id"]: (r["first"], r["last"])
        for r in samples.groupBy("channel_id")
        .agg(F.min("ts_sec").alias("first"), F.max("ts_sec").alias("last"))
        .collect()
    }
    rows = []
    for r in _collect_config(config):
        span = stats.get(r["channel_id"])
        if not span or span[0] is None:
            continue  # cursor open failed / no data → skipped (`:274`)
        first, last = span
        if last <= first:
            last = first + 1
        name = "%s : %d.%s.%s" % (
            r["name"] or "?", r["device"] or 0, r["service"] or "?",
            r["variable"] or "?",
        )
        rows.append((name, first, last))
    table = gviz_datatable(
        [("string", "Channel Name"), ("date", "Start"), ("date", "End")],
        rows,
    )
    opt = {
        "width": options.get("width", 800),
        "height": options.get("height", 700),
    }
    return chart_html(table, "Timeline", opt)


def report_graphs(
    graphs: DataFrame, config: DataFrame, options: dict | None = None
) -> str:
    """``report=graphs`` — the Graphs listing Table
    (`L_DataMineServer.lua:345-377`), channels resolved to display names
    and the plot link kept verbatim."""
    options = options or {}
    cfg_rows = _collect_config(config)
    rows = []
    for g in _collect_graphs(graphs):
        chan = "<br>".join(
            channel_name(cfg_rows, c["device"], c["service"], c["variable"])
            for c in g["channels"]
        )
        plot = (
            '<a href="/data_request?id=lr_dmDB&height=300&graph=%d">%s</a>'
            % (g["graph_id"], g["name"])
        )
        rows.append(
            (g["graph_id"], _icon_name(g["icon"]), plot,
             "%g" % ((g["period"] or 0) / 86_400), chan)
        )
    table = gviz_datatable(
        [
            ("number", "Id"), ("string", "Icon"), ("string", "Graph"),
            ("string", "Duration (Days)"), ("string", "Channels"),
        ],
        rows,
    )
    opt = {"width": options.get("width", 800), "allowHtml": True}
    if options.get("height") is not None:
        opt["height"] = options["height"]
    return chart_html(table, "Table", opt)


def report_graphmap(
    graphs: DataFrame, config: DataFrame, options: dict | None = None
) -> str:
    """``report=graphmap`` — Graphs TreeMap grouped by icon
    (`L_DataMineServer.lua:300-342`)."""
    options = options or {}
    cfg_rows = _collect_config(config)
    data = []
    for g in _collect_graphs(graphs):
        chan = "<br>".join(
            channel_name(cfg_rows, c["device"], c["service"], c["variable"])
            for c in g["channels"]
        )
        plots = "plot: " + " / ".join(
            '<a target="Plot" href="/data_request?id=lr_dmDB&height=300'
            "&graph=%d&from=-%dd\">%s</a>" % (g["graph_id"], days, label)
            for label, days in (
                ("day", 1), ("week", 7), ("month", 30), ("quarter", 90)
            )
        )
        data.append({
            "_label": g["name"], "_color": g["icon"],
            "icon": _icon_name(g["icon"]), "plot": plots, "chan": chan,
        })
    tree = tree_table(
        data, root="dataMine Graphs", branches=["icon"],
        leaves=["_label", "chan", "plot"],
    )
    tooltip = show_tooltip("""
      var toolTip  = '#graphs: ' + size;  // for higher levels, it's just a metric count
      if (_level == null) { toolTip =
         '<b>' + data.getValue(row, 5) + '</b><br>' +
          data.getValue(row, 7) + '<br>' +
          data.getValue(row, 6) ;
       };
     """)
    opt = {
        "height": options.get("height", 300),
        "allowHtml": True,
        "maxDepth": 3,
        "generateTooltip": show_tooltip(),
        "minColorValue": 0,
        "maxColorValue": len(GRAPH_ICONS),
        **COLOURS,
    }
    if options.get("width") is not None:
        opt["width"] = options["width"]
    return chart_html(tree, "TreeMap", opt, extra_js=tooltip)


def report_datamine_map(config: DataFrame, options: dict | None = None) -> str:
    """``report=dataMine`` — channel TreeMap grouped by service type
    (`L_DataMineServer.lua:443-493`)."""
    import re

    options = options or {}
    data = []
    types: dict[str, int] = {}
    for r in _collect_config(config):
        srv_tail = re.search(r"([A-Za-z]*)\d*$", r["service"] or "").group(1)
        typ = srv_tail.replace("Sensor", "")
        if typ not in types:
            types[typ] = len(types) + 1
        data.append({
            "_label": r["name"], "_colour": types[typ], "type": typ,
            "type_var": f"{typ} - {r['variable']}", "id": r["channel_id"],
            "schema": f"dataMine #{r['channel_id']}",
            "devStr": str(r["device"]),
        })
    tree = tree_table(
        data, root="dataMine Database", branches=["type"],
        leaves=["type_var", "id", "_label", "schema", "devStr"],
    )
    tooltip = show_tooltip("""
      var toolTip  = '#metrics: ' + size;  // for higher levels, it's just a metric count
      if (_level == null) { toolTip =
         '<b>[' + data.getValue(row, 9) + '] ' + data.getValue(row, 7) + '</b>' +
         '<br>dataMine channel #' + data.getValue(row, 6) +
         '<br>' + data.getValue(row, 5) ;
       };
     """)
    opt = {
        "height": options.get("height", 500),
        "maxDepth": 3,
        "generateTooltip": show_tooltip(),
        "minColorValue": 0,
        "maxColorValue": len(types),
        **COLOURS,
    }
    if options.get("width") is not None:
        opt["width"] = options["width"]
    return chart_html(tree, "TreeMap", opt, extra_js=tooltip)


# ------------------------------------------------------------ graph plot


def plot_range(t1: int, t2: int, n: int) -> list[int]:
    """`range` (`L_DataMineServer.lua:138-146`): n instants from t1 to t2
    inclusive, each rounded to the nearest second."""
    dt = (t2 - t1) / (n - 1)
    return [int(t1 + i * dt + 0.5) for i in range(n)]


def graph_plot(
    spark: SparkSession,
    samples: DataFrame,
    config: DataFrame,
    graphs: DataFrame,
    graph_id: int,
    t1: int | None = None,
    now: int | None = None,
    options: dict | None = None,
    points: int = 24 * 30 + 1,
) -> str:
    """``graph=<n>`` — multi-channel LineChart over the graph's period
    (`L_DataMineServer.lua:380-417`): every channel of Graphs[n] is
    as-of-resampled onto a shared 721-point grid (ONE union-merge LOCF
    pass for all channels — no per-channel jobs), channel filters/offsets
    applied, and the chart titled with the graph name."""
    import time as _time

    from datayours_spark.operators.align import asof_on_grid

    options = options or {}
    glist = [g for g in _collect_graphs(graphs) if g["graph_id"] == graph_id]
    if not glist:
        return "no such graph"
    g = glist[0]
    now = int(_time.time()) if now is None else now
    lo = t1 if t1 is not None else now - (g["period"] or 86_400)
    rng = plot_range(lo, now, points)
    cfg_rows = _collect_config(config)

    # resolve each graph channel to its channel_id + display name + filters
    chans = []
    for c in g["channels"]:
        match = _search_rows(
            cfg_rows, device=c["device"], service=c["service"],
            variable=c["variable"],
        )
        chans.append((
            match[0]["channel_id"] if len(match) == 1 else None,
            channel_name(cfg_rows, c["device"], c["service"], c["variable"]),
            match[0] if len(match) == 1 else None,
        ))
    wanted = [cid for cid, _, _ in chans if cid is not None]

    cells: dict[tuple[int, int], float] = {}
    if wanted:
        grid = spark.createDataFrame([(t,) for t in rng], "slot bigint")
        series = samples.where(F.col("channel_id").isin(wanted)).select(
            F.col("channel_id").cast("string").alias("path"), "ts_sec", "value"
        )
        resampled = asof_on_grid(series, grid, hi=rng[-1])
        for r in resampled.collect():
            cells[(int(r["path"]), r["slot"])] = r["value"]

    def _filtered(cfg, v):
        # `filter` (`L_DataMineServer.lua:166-183`): offset then clamp
        if v is None or cfg is None:
            return v
        v2 = v + (cfg.get("data_offset") or 0.0)
        if cfg.get("filter_enable") == 1:
            if cfg.get("filter_max") is not None and v2 > cfg["filter_max"]:
                v2 = cfg["filter_max"]
            elif cfg.get("filter_min") is not None and v2 < cfg["filter_min"]:
                v2 = cfg["filter_min"]
        return v2

    cols: list[tuple[str, str]] = [("datetime", "Time")]
    for _, name, _ in chans:
        cols.append(("number", name))
    rows = [
        tuple(
            [t]
            + [
                _filtered(cfg, cells.get((cid, t))) if cid is not None else None
                for cid, _, cfg in chans
            ]
        )
        for t in rng
    ]
    table = gviz_datatable(cols, rows)
    opt = {
        "title": g["name"],
        "height": options.get("height", 600),
        "legend": "bottom",
    }
    return chart_html(table, "LineChart", opt)
