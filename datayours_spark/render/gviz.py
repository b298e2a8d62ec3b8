"""Google-Charts (gviz) DataTable emitter — the dmDB CLI's chart formats.

The reference's dataMine CLI (`lr_dmDB`) selects an output format from
``csv | iso | Table | LineChart | AreaChart``
(`/root/reference/L_DataMineServer.lua:585` CLI spec); the three chart
formats render the query result as a Google-Charts **DataTable JavaScript
literal** inside a ChartWrapper page. The emitter lives in the reference's
library (`/root/reference/L_DataLibrary.lua`):

- ``toJScr`` — Lua→JavaScript literal conversion with single-quoted strings,
  bare object keys, ``null`` for nil (`L_DataLibrary.lua:165-185`);
- ``DataTable`` — ``{cols: [...], rows: [{c:[{v: ..}, ..]}, ..]}`` with
  per-column-type value formatting: date/datetime → ``new Date (<ms>)``,
  timeofday → ``[h,m,s]`` (`L_DataLibrary.lua:187-258`, formats at 190-194,
  emitter at 227-255);
- ``ChartWrapper``/``Chart`` — the HTML page around the literal
  (`L_DataLibrary.lua:273-330`);
- the dmDB chart builder: two columns ``(datetime Time, number Value)`` fed
  from a cursor range scan (`L_DataMineServer.lua:419-435`).

These are query OUTPUT formats (the dashboard UI itself stays a non-goal per
SURVEY §7.3). Everything here formats an already-bounded result — the dmDB
range scan is maxpoints-capped (≤10080 rows, `L_DataBaseDM.lua:74`) — so
driver-side string building mirrors the reference and is not a scale risk.

Determinism note: the Lua emitter iterates table keys with ``pairs`` (order
unspecified); we fix deterministic orders (declared column-info order,
sorted option keys) instead of reproducing nondeterminism.
"""

from __future__ import annotations

from datetime import datetime, timezone

#: gviz column types the reference accepts (`L_DataLibrary.lua:193-194`);
#: anything else raised "unsupported column type" (207-208).
COLUMN_TYPES = {"boolean", "string", "number", "date", "datetime", "timeofday"}

_ESCAPES = {
    '"': '\\"',
    "'": "\\'",
    "\\": "\\\\",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def js_string(s: str, quote: str = "'") -> str:
    """Single-quoted JS string with the reference's escape set
    (`L_DataLibrary.lua:164-173`)."""
    return quote + "".join(_ESCAPES.get(c, c) for c in str(s)) + quote


def js_number(x: float) -> str:
    """Lua ``tostring`` prints numbers with %.14g (`L_DataLibrary.lua:172`)."""
    if isinstance(x, bool):  # bool is an int subclass; keep it out
        return "true" if x else "false"
    if isinstance(x, int) or (isinstance(x, float) and x.is_integer() and abs(x) < 1e15):
        return str(int(x))
    return f"{x:.14g}"


def to_jscr(value) -> str:
    """Lua→JavaScript literal conversion (`L_DataLibrary.lua:165-185`):
    single-quoted strings, BARE object keys, ``null`` for None."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return js_number(value)
    if isinstance(value, str):
        return js_string(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(to_jscr(v) for v in value) + "]"
    if isinstance(value, dict):
        # bare keys: string(i, equote) with equote='' (`L_DataLibrary.lua:163,180`)
        return "{" + ",".join(f"{k}:{to_jscr(v)}" for k, v in value.items()) + "}"
    raise TypeError(f"cannot convert {type(value).__name__} to JavaScript")


def _format_cell(v, ctype: str) -> str:
    """Per-type cell value formatting (`L_DataLibrary.lua:190-194`)."""
    if v is None:
        return "null"  # nowt (`L_DataLibrary.lua:163,240-246`)
    if ctype in ("date", "datetime"):
        return f"new Date ({js_number(v * 1e3)})"  # epoch sec → ms (190)
    if ctype == "timeofday":
        t = datetime.fromtimestamp(v, tz=timezone.utc)
        return f"[{t.hour},{t.minute},{t.second}]"  # (191)
    if ctype == "boolean":
        return "true" if v else "false"
    if ctype == "string":
        return js_string(v)
    return js_number(v)


def gviz_datatable(
    cols: list[tuple[str, str] | tuple[str, str, str]],
    rows: list[tuple],
) -> str:
    """The DataTable JS literal (`L_DataLibrary.lua:227-255`).

    cols: (type, label[, id]) per column — unsupported types raise like
    ``addColumn`` does (`L_DataLibrary.lua:200-209`). rows: value tuples;
    a cell may also be ``(v, f)`` — a value with a formatted-string
    override, emitted as ``{v: .., f: '..'}`` (`L_DataLibrary.lua:241-245`).
    """
    infos = []
    for col in cols:
        ctype = col[0]
        if ctype not in COLUMN_TYPES:
            raise ValueError(f"unsupported column type '{ctype}' in DataTable")
        info = {"type": ctype, "label": col[1]}
        if len(col) > 2:
            info["id"] = col[2]
        infos.append(info)

    out = ["\n{cols: ", to_jscr(infos), ",\nrows: [\n"]
    for n, row in enumerate(rows):
        if n:
            out.append(",\n")
        cells = []
        for v, col in zip(row, cols):
            if isinstance(v, tuple):  # (value, formatted)
                cells.append(
                    "{v: " + _format_cell(v[0], col[0]) + ", f: " + js_string(v[1]) + "}"
                )
            else:
                cells.append("{v: " + _format_cell(v, col[0]) + "}")
        out.append("{c:[" + ",".join(cells) + "]}")
    out.append("]\n}")
    return "".join(out)


def chart_html(
    datatable_js: str,
    chart_type: str,
    options: dict | None = None,
    container_id: str = "gVizDiv",
    extra_js: str = "",
) -> str:
    """The ChartWrapper page around a DataTable literal
    (`L_DataLibrary.lua:273-310`): loader script, ChartWrapper opts,
    setDataTable, draw.  ``extra_js`` is the draw()'s ``extras`` slot —
    page-embedded helper functions (e.g. the treemap tooltip)."""
    opts = {"options": options or {}, "chartType": chart_type, "containerId": container_id}
    return "\n".join(
        [
            "<!DOCTYPE html>",
            "<html>",
            "  <head>",
            '    <meta charset="utf-8" />',
            '    <script type="text/javascript" src="https://www.gstatic.com/charts/loader.js"></script>',
            '    <script type="text/javascript" src="https://www.google.com/jsapi"></script>',
            '    <script type="text/javascript">',
            "      google.charts.load('current', {'packages':['corechart', 'table', 'treemap']});",
            "      google.charts.setOnLoadCallback(gViz);",
            "      function gViz() {",
            "          var w = new google.visualization.ChartWrapper(",
            to_jscr(opts),
            ");",
            "          var data = new google.visualization.DataTable(",
            datatable_js,
            ");",
            "          w.setDataTable(data);",
            "          w.draw();",
            # the draw()'s `extras` slot; omitted entirely when empty so
            # pre-existing chart bytes stay golden-stable
            *([extra_js] if extra_js else []),
            "        }",
            "    </script>",
            "  </head>",
            "  <body><div id=" + to_jscr(container_id) + "></div></body>",
            "</html>",
            "",
        ]
    )


def gviz_chart(
    points: list[tuple[int, float]],
    chart_type: str,
    title: str = "",
    options: dict | None = None,
) -> str:
    """The dmDB chart builder (`L_DataMineServer.lua:419-435`): DataTable of
    ``(datetime Time, number Value)`` rows + ChartWrapper page; options get
    the reference's defaults (height 500, legend none)."""
    options = options or {}
    table = gviz_datatable([("datetime", "Time"), ("number", "Value")], points)
    opt = {
        "title": title,
        "height": options.get("height", 500),
        "legend": "none",
    }
    if options.get("width") is not None:
        opt["width"] = options["width"]
    return chart_html(table, chart_type, opt)
