"""HTTP facade golden-byte tests (graphite_cgi.lua envelope parity)."""

from __future__ import annotations

import io

from datayours_spark.http import GraphiteApp, get_parameters, parse_parameters

T0 = 1_704_067_200  # 2024-01-01 00:00:00 UTC
H = 3_600


def _dp(make_datapoints):
    return make_datapoints(
        [
            ("a.x", T0 + 0 * H + 10, 1.0),
            ("a.x", T0 + 2 * H + 10, 3.0),
            ("a.y", T0 + 1 * H + 10, 5.0),
            ("b.x", T0 + 0 * H + 10, 9.0),
        ]
    )


def call(app, path, query="", method="GET", body=b"", ctype=""):
    """Drive the WSGI callable directly; returns (status, headers, body)."""
    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "CONTENT_LENGTH": str(len(body)),
        "CONTENT_TYPE": ctype,
        "wsgi.input": io.BytesIO(body),
    }
    out = {}

    def start_response(status, headers):
        out["status"], out["headers"] = status, dict(headers)

    chunks = app(environ, start_response)
    return out["status"], out["headers"], b"".join(chunks).decode()


class TestParameterCoercion:
    def test_repeated_params_accumulate_empty_dropped(self):
        p = parse_parameters("target=a.x&target=a.y&format=&q=x%20y")
        assert p == {"target": ["a.x", "a.y"], "q": ["x y"]}

    def test_target_always_array_and_singleton_collapse(self):
        env = {"QUERY_STRING": "target=a.x&format=json", "REQUEST_METHOD": "GET"}
        p = get_parameters(env)
        assert p["target"] == ["a.x"]      # scalar promoted to array
        assert p["format"] == "json"       # singleton collapsed to scalar
        assert get_parameters({"QUERY_STRING": "", "REQUEST_METHOD": "GET"})[
            "target"
        ] == []

    def test_post_body_fills_but_querystring_wins(self):
        body = b"format=csv&extra=1"
        env = {
            "QUERY_STRING": "format=json",
            "REQUEST_METHOD": "POST",
            "CONTENT_TYPE": "application/x-www-form-urlencoded",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        p = get_parameters(env)
        assert p["format"] == "json"  # querystring takes precedence
        assert p["extra"] == "1"

    def test_json_post_body(self):
        body = b'{"query": "a.*", "jsonp": "cb"}'
        env = {
            "QUERY_STRING": "",
            "REQUEST_METHOD": "POST",
            "CONTENT_TYPE": "application/json",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        p = get_parameters(env)
        assert p["query"] == "a.*" and p["jsonp"] == "cb"


class TestMetricsEndpoints:
    def test_find_treejson_default_golden(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints), now=T0 + 3 * H)
        status, headers, body = call(app, "/metrics/find", "query=*")
        assert status == "200 OK"
        assert headers["Content-Type"] == "application/json"
        assert body == (
            '[{"allowChildren":1,"context":{},"expandable":1,"id":"a",'
            '"leaf":0,"text":"a"},'
            '{"allowChildren":1,"context":{},"expandable":1,"id":"b",'
            '"leaf":0,"text":"b"}]'
        )

    def test_find_completer_golden(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints), now=T0 + 3 * H)
        _, _, body = call(app, "/metrics/find", "query=a.*&format=completer")
        assert body == (
            '{"metrics":[{"is_leaf":1,"name":"x","path":"a.x"},'
            '{"is_leaf":1,"name":"y","path":"a.y"}]}'
        )

    def test_find_jsonp_wrapper(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints), now=T0 + 3 * H)
        _, headers, body = call(app, "/metrics/find", "query=a.*&jsonp=cb")
        assert headers["Content-Type"] == "text/javascript"
        assert body.startswith("cb([") and body.endswith("])")

    def test_find_missing_query_400(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        status, _, body = call(app, "/metrics/find")
        assert status == "400 Bad Request"
        assert body == '{"errors":{"query":"this parameter is required."}}'

    def test_bare_metrics_dispatches_to_find(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        s1 = call(app, "/metrics", "query=*")
        s2 = call(app, "/metrics/find", "query=*")
        assert s1 == s2
        # trailing slash ignored (`graphite_cgi.lua:487`)
        assert call(app, "/metrics/find/", "query=*") == s2

    def test_expand_golden_and_leaves_only(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        _, _, body = call(app, "/metrics/expand", "query=*")
        assert body == '{"results":["a.","b."]}'
        _, _, body = call(app, "/metrics/expand", "query=a.*&leavesOnly=1")
        assert body == '{"results":["a.x","a.y"]}'

    def test_index_sorted_leaves_golden(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        _, _, body = call(app, "/metrics/index.json")
        assert body == '["a.x","a.y","b.x"]'

    def test_unknown_path_501(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        status, _, body = call(app, "/nope")
        assert status == "501 Not Implemented"
        assert body == "Not Implemented: /nope"


class TestRenderEndpoint:
    def test_csv_golden_text_plain(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints), now=T0 + 2 * H)
        status, headers, body = call(
            app, "/render",
            f"target=a.x&format=csv&from={T0}&until={T0 + 2 * H}",
        )
        assert status == "200 OK"
        # the reference emits text/plain for csv (`graphite_cgi.lua:337`)
        assert headers["Content-Type"] == "text/plain"
        assert body == (
            "a.x,2024-01-01 00:00:00,1\n"
            "a.x,2024-01-01 01:00:00,nil\n"
            "a.x,2024-01-01 02:00:00,3"
        )

    def test_json_golden_multi_target(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints), now=T0 + 2 * H)
        _, headers, body = call(
            app, "/render",
            f"target=a.x&target=a.y&format=json&from={T0}&until={T0 + H}",
        )
        assert headers["Content-Type"] == "application/json"
        assert body == "\n".join(
            [
                "[", "",
                "{", '  "target": "a.x",', '  "datapoints": [',
                f"  [1, {T0}],", f"  [null, {T0 + H}]", "  ]", "}", ",",
                "{", '  "target": "a.y",', '  "datapoints": [',
                f"  [null, {T0}],", f"  [5, {T0 + H}]", "  ]", "}", "]",
            ]
        )

    def test_default_format_svg_stub(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        status, headers, body = call(app, "/render", "target=a.x")
        assert (status, body) == ("200 OK", "[]")
        assert headers["Content-Type"] == "application/json"

    def test_handler_exception_500(self, spark, make_datapoints):
        app = GraphiteApp(spark, _dp(make_datapoints))
        # an invalid from time raises inside the handler → 500 envelope
        status, _, body = call(
            app, "/render", "target=a.x&format=csv&from=notatime"
        )
        assert status == "500 Internal Server Error"
        assert body == ""

    def test_malformed_json_post_body_500_envelope(self, spark, make_datapoints):
        # Request parsing failures get the same 500-empty-body envelope as
        # handler failures (graphite_cgi.lua:494-498) — never a traceback.
        app = GraphiteApp(spark, _dp(make_datapoints))
        status, headers, body = call(
            app, "/render", method="POST",
            body=b'{"target": broken', ctype="application/json",
        )
        assert status == "500 Internal Server Error"
        assert body == ""
        assert headers["Content-Type"] == "text/plain"

    def test_malformed_body_on_unknown_path_still_501(self, spark, make_datapoints):
        # Unknown paths never touch the body parser, so the 501 dispatch
        # envelope survives a broken body too.
        app = GraphiteApp(spark, _dp(make_datapoints))
        status, _, body = call(
            app, "/nope", method="POST",
            body=b"not json", ctype="application/json",
        )
        assert status == "501 Not Implemented"
        assert body == "Not Implemented: /nope"
