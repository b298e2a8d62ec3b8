"""Conf-driven launcher: boot the daemon set from Graphite confs end-to-end
(`L_DataYours.lua:146-229` Startup/create_daemons, `:110-130` heartbeat)."""

import json
import shutil
import time
import urllib.parse
import urllib.request
from pathlib import Path

from datayours_spark.launcher import HEARTBEAT_PATH, start_from_conf

TMP = Path(__file__).resolve().parent / "_tmp" / "launcher"
REF_CONF = Path("/root/reference/Configuration")

NOW = 1_704_672_000  # 2024-01-08 00:00 UTC


def _setup_confs() -> Path:
    """A conf dir seeded from the reference's own shipped configuration."""
    conf = TMP / "conf"
    conf.mkdir(parents=True)
    # the reference's real storage confs, verbatim
    shutil.copy(REF_CONF / "storage-schemas.conf", conf)
    shutil.copy(REF_CONF / "storage-aggregation.conf", conf)
    (conf / "carbon.conf").write_text(
        "[cache]\n"
        "MAX_CACHE_SIZE = inf\n"
        "[graph]\n"
        f"DATAMINE_DIR = {TMP}/dmDB\n"
    )
    (conf / "rewrite-rules.conf").write_text(
        "# strip the legacy prefix as soon as records arrive\n"
        "[pre]\n"
        "^legacy\\. = house.\n"
    )
    return conf


class TestStartFromConf:
    def test_boot_ingest_heartbeat_render(self, spark):
        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        work = TMP / "work"
        stack = start_from_conf(
            spark, str(conf), str(work),
            daemons="Watch Cache Graph Mine", now_override=NOW,
            start=False,  # watch the series first; the predicate is read
            # at every (re)start, like the reference re-registering its
            # variable watches from the conf file
        )
        try:
            assert stack.daemons == ["Watch", "Cache", "Graph", "Mine"]
            # carbon.conf parameterized the daemons (DATAMINE_DIR reaches
            # the stack like the reference's graph section)
            assert stack.dm_dir == f"{TMP}/dmDB"
            # the reference's own storage-schemas rules drive routing:
            # ':Temperature' series get the 10m:7d,... chain
            rule = stack.engine.match_schema("house.room:Temperature")
            assert rule.retentions.startswith("10m:7d")
            agg = stack.engine.match_aggregation("house.room:Temperature")
            assert agg.aggregation_method == "average"

            # watch the incoming tags (the predicate applies pre-rewrite,
            # like the Watcher relay); the heartbeat is auto-watched
            stack.watchlist.watch("house.room:Temperature")
            stack.watchlist.watch("legacy.attic:Temperature")
            assert HEARTBEAT_PATH in stack.watchlist.paths()
            stack.start()

            t = NOW - 600
            (work / "in" / "drop1.txt").write_text(
                f"house.room:Temperature 20.0 {t}\n"
                f"house.room:Temperature 21.0 {t + 60}\n"
                f"legacy.attic:Temperature 5.5 {t}\n"   # pre-rewrite applies
                f"unwatched.series 1.0 {t}\n"           # fails the watch list
            )
            stack.process_available()

            dp = {
                (r["path"], r["ts_sec"]): r["value"]
                for r in stack.datapoints().collect()
            }
            assert dp[("house.room:Temperature", t + 60)] == 21.0
            assert dp[("house.attic:Temperature", t)] == 5.5  # rewritten
            assert not any(p.startswith("unwatched") for p, _ in dp)

            # heartbeat: counts the database's metrics and publishes the
            # count THROUGH the ingest path (DataYoursPulse analogue)
            n = stack.heartbeat()
            assert n == 2  # house.room + house.attic
            stack.process_available()
            dp2 = {
                (r["path"], r["ts_sec"]): r["value"]
                for r in stack.datapoints().collect()
            }
            assert dp2[(HEARTBEAT_PATH, NOW)] == 2.0
            assert stack.heartbeat() == 3  # now counts itself

            # rollup maintenance over the maintained chain, method/xff
            # rule-assigned from the conf (average for :Temperature)
            levels = stack.refresh_rollups()
            hour = {
                (r["path"], r["slot"]): r["value"]
                for r in levels[3_600].collect()
            }
            slot = t - t % 3_600
            assert abs(hour[("house.room:Temperature", slot)] - 20.5) < 1e-9

            # serve /metrics and /render over a real WSGI server
            self._assert_http(stack)
        finally:
            stack.stop()
            shutil.rmtree(TMP, ignore_errors=True)

    def test_relay_syslog_and_destinations_from_conf(self, spark):
        """[relay] SYSLOG/DESTINATIONS parameterize the boot like the
        reference's relay block — the startup syslog line goes out over a
        real UDP socket (S6 transport)."""
        import socket

        shutil.rmtree(TMP, ignore_errors=True)
        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        port = rx.getsockname()[1]
        try:
            conf = TMP / "conf2"
            conf.mkdir(parents=True)
            (conf / "carbon.conf").write_text(
                "[relay]\n"
                f"SYSLOG = 127.0.0.1:{port}\n"
                "DESTINATIONS = 127.0.0.1:2003, 127.0.0.1:2004\n"
            )
            stack = start_from_conf(
                spark, str(conf), str(TMP / "work2"),
                daemons="Cache", now_override=NOW, start=False,
            )
            assert stack.destinations == ["127.0.0.1:2003", "127.0.0.1:2004"]
            assert stack.syslog is not None
            rx.settimeout(10)
            gram = rx.recvfrom(65_535)[0].decode()
            assert gram.startswith("<14>") and gram.endswith(
                "DataDaemon: starting...\n"
            )
            stack.syslog.close()
        finally:
            rx.close()
            shutil.rmtree(TMP, ignore_errors=True)

    def test_udp_wire_into_conf_booted_stack(self, spark):
        """The reference's full deployment shape: datagrams on the UDP
        wire → receiver bridge → conf-booted Cache daemon → queryable
        datapoints.  (S1 transport composed with the launcher.)"""
        from datayours_spark.streaming.transport import (
            UdpLineReceiver,
            open_for_send,
        )

        shutil.rmtree(TMP, ignore_errors=True)
        conf = TMP / "conf3"
        conf.mkdir(parents=True)
        shutil.copy(REF_CONF / "storage-schemas.conf", conf)
        work = TMP / "work3"
        stack = start_from_conf(
            spark, str(conf), str(work), daemons="Cache", now_override=NOW,
        )
        rx = UdpLineReceiver(str(work / "in"))
        try:
            tx = open_for_send(f"127.0.0.1:{rx.port}")
            t = NOW - 300
            tx.send(f"wire.room:Temperature 19.5 {t}".encode())
            tx.close()
            deadline = time.time() + 5
            while rx.poll() == 0 and time.time() < deadline:
                time.sleep(0.01)
            rx.flush()
            stack.process_available()
            dp = {
                (r["path"], r["ts_sec"]): r["value"]
                for r in stack.datapoints().collect()
            }
            assert dp[("wire.room:Temperature", t)] == 19.5
        finally:
            rx.close()
            stack.stop()
            shutil.rmtree(TMP, ignore_errors=True)

    def _assert_http(self, stack) -> None:
        import threading
        from wsgiref.simple_server import WSGIServer, make_server

        class Quiet(WSGIServer):
            def handle_error(self, request, client_address):  # noqa: D102
                pass

        app = stack.graphite_app(step=3_600, now=NOW)
        srv = make_server("127.0.0.1", 0, app, server_class=Quiet)
        srv.RequestHandlerClass.log_message = lambda *a, **k: None
        port = srv.server_address[1]
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        try:
            def get(path, **params):
                q = urllib.parse.urlencode(params)
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}?{q}", timeout=120
                ) as resp:
                    return resp.status, resp.read().decode()

            status, body = get("/metrics/index.json")
            assert status == 200
            paths = json.loads(body)
            assert "house.room:Temperature" in paths
            assert HEARTBEAT_PATH in paths

            status, body = get(
                "/render",
                target="house.room:Temperature",
                format="json",
                **{"from": str(NOW - 3_600), "until": str(NOW)},
            )
            assert status == 200
            doc = json.loads(body)
            series = {d["target"]: d["datapoints"] for d in doc}
            pts = {ts: v for v, ts in series["house.room:Temperature"]}
            slot = (NOW - 600) - (NOW - 600) % 3_600
            assert pts[slot] == 21.0  # LWW within the hour slot
        finally:
            srv.shutdown()
            srv.server_close()


class TestAdviceRegressions:
    def test_work_dir_wins_over_conf_local_data_dir(self, spark):
        """Round-3 ADVICE: a conf LOCAL_DATA_DIR (possibly from a silently
        used *.example fallback written for another machine) must NOT
        redirect parquet output outside work_dir unless the caller opts in
        with use_conf_paths=True."""
        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        (conf / "carbon.conf").write_text(
            "[cache]\nLOCAL_DATA_DIR = /nonexistent/other-machine/whisper\n"
        )
        work = TMP / "work_prec"
        stack = start_from_conf(
            spark, str(conf), str(work), daemons="Cache", start=False
        )
        assert stack.pipeline.output_dir == str(work / "out")
        opted = start_from_conf(
            spark, str(conf), str(work), daemons="Cache", start=False,
            use_conf_paths=True,
        )
        assert opted.pipeline.output_dir == "/nonexistent/other-machine/whisper"
        shutil.rmtree(TMP, ignore_errors=True)

    def test_heartbeat_writes_atomically_and_never_collides(self, spark):
        """Round-3 ADVICE: heartbeat must use the dotfile+rename protocol
        (the file-stream source must never list a half-written file) and a
        unique filename (the file source tracks processed files by name, so
        a same-second overwrite would silently never be re-read)."""
        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        work = TMP / "work_hb"
        stack = start_from_conf(
            spark, str(conf), str(work), daemons="Cache",
            now_override=NOW, start=False,
        )
        stack.heartbeat()
        stack.heartbeat()  # same second, same count: must not collide
        in_dir = Path(stack.pipeline.input_dir)
        visible = [p.name for p in in_dir.iterdir() if not p.name.startswith(".")]
        assert len([n for n in visible if n.startswith("heartbeat-")]) == 2
        # no half-written dotfiles left behind
        assert not [p for p in in_dir.iterdir() if p.name.startswith(".")]
        shutil.rmtree(TMP, ignore_errors=True)


class TestFlowLimitConf:
    def test_cache_section_flow_limits_reach_the_pipeline(self, spark):
        """carbon.conf [cache] flow knobs wire through as enforceable ints;
        'inf' and absent mean unlimited (None), the reference's own
        convention."""
        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        (conf / "carbon.conf").write_text(
            "[cache]\n"
            "MAX_CACHE_SIZE = inf\n"
            "MAX_UPDATES_PER_SECOND = 500\n"
            "MAX_CREATES_PER_MINUTE = 50\n"
            "MAX_QUEUE_SIZE = inf\n"
        )
        stack = start_from_conf(
            spark, str(conf), str(TMP / "work_fl"), daemons="Cache",
            start=False,
        )
        assert stack.pipeline.max_updates_per_second == 500
        assert stack.pipeline.max_creates_per_minute == 50
        assert stack.pipeline.max_queue is None
        assert stack.pipeline.max_cache is None
        shutil.rmtree(TMP, ignore_errors=True)

    def test_zero_semantics(self, spark):
        """MAX_CREATES_PER_MINUTE=0 means 'create nothing' (carbon's own
        semantics); a throughput knob at 0 can never make progress and is
        rejected loudly instead of silently inverted to unlimited."""
        import pytest

        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        (conf / "carbon.conf").write_text(
            "[cache]\nMAX_CREATES_PER_MINUTE = 0\n"
        )
        stack = start_from_conf(
            spark, str(conf), str(TMP / "work_z"), daemons="Cache",
            start=False,
        )
        assert stack.pipeline.max_creates_per_minute == 0

        (conf / "carbon.conf").write_text(
            "[cache]\nMAX_UPDATES_PER_SECOND = 0\n"
        )
        with pytest.raises(ValueError, match="MAX_UPDATES_PER_SECOND"):
            start_from_conf(
                spark, str(conf), str(TMP / "work_z2"), daemons="Cache",
                start=False,
            )
        shutil.rmtree(TMP, ignore_errors=True)

    def test_enforced_end_to_end_from_conf(self, spark):
        """The conf-booted stack actually throttles on the wall clock: a
        12-row burst against MAX_UPDATES_PER_SECOND=5 lands completely
        but only as budget accrues, with deferral tallies."""
        from tests.test_streaming_ingest import FakeClock

        shutil.rmtree(TMP, ignore_errors=True)
        conf = _setup_confs()
        (conf / "carbon.conf").write_text(
            "[cache]\nMAX_UPDATES_PER_SECOND = 5\n"
        )
        stack = start_from_conf(
            spark, str(conf), str(TMP / "work_fe"), daemons="Cache",
            now_override=NOW, start=False,
        )
        clock = FakeClock()
        stack.pipeline.clock = clock
        stack.start()
        t = NOW - 600
        in_dir = Path(stack.pipeline.input_dir)
        (in_dir / "burst.txt").write_text(
            "\n".join(f"house.t {i} {t + i}" for i in range(12)) + "\n"
        )
        stack.process_available()
        for i in range(2):  # two wall-clock seconds drain the rest
            clock.advance(1.0)
            (in_dir / f"tick{i}.txt").write_text("")
            stack.process_available()
        stack.stop()
        assert stack.datapoints().count() == 12
        deferred = [
            r["n"]
            for r in stack.pipeline.flow_tally()
            .where("metric = 'deferred_updates'")
            .orderBy("batch_id")
            .collect()
        ]
        assert deferred == [7, 2]
        shutil.rmtree(TMP, ignore_errors=True)
