"""UDP transports: S1 line-receiver bridge and S6 syslog sink
(`L_DataDaemon.lua:203-259`) over real localhost sockets."""

import shutil
import socket
import time
from pathlib import Path

import pytest

from datayours_spark.streaming.transport import (
    SyslogSink,
    UdpLineReceiver,
    open_for_send,
    parse_ip_port,
    syslog_foreach_partition,
)

TMP = Path(__file__).resolve().parent / "_tmp" / "transport"

NOW = 1_704_672_000  # 2024-01-08 00:00 UTC


class TestParseIpPort:
    def test_reference_strict_syntax(self):
        assert parse_ip_port("127.0.0.1:2003") == ("127.0.0.1", 2003)
        for bad in ("localhost:2003", "127.0.0.1", "1.2.3.4:x", ""):
            with pytest.raises(ValueError, match="invalid ip:port"):
                parse_ip_port(bad)


class TestUdpLineReceiver:
    def test_wire_to_file_to_stream_end_to_end(self, spark):
        """The full S1 path: plaintext datagrams on a UDP socket → bridge
        files → IngestPipeline (the Cache daemon) → LWW datapoints."""
        from datayours_spark.streaming.ingest import IngestPipeline

        shutil.rmtree(TMP, ignore_errors=True)
        rx = UdpLineReceiver(str(TMP / "in"))
        try:
            tx = open_for_send(f"127.0.0.1:{rx.port}")
            t = NOW - 600
            # one datagram may carry several lines (the wire contract)
            tx.send(
                f"metrics.a 1.5 {t}\nmetrics.a 2.5 {t}\n".encode()
            )
            tx.send(f"metrics.b 7 {t}".encode())
            tx.close()
            deadline = time.time() + 5
            got = 0
            while got < 2 and time.time() < deadline:
                got += rx.poll()
                time.sleep(0.01)
            assert got == 2
            assert rx.flush() is not None

            pipe = IngestPipeline(
                spark=spark,
                input_dir=str(TMP / "in"),
                output_dir=str(TMP / "out"),
                checkpoint_dir=str(TMP / "ckpt"),
                now_override=NOW,
            )
            q = pipe.start()
            q.processAllAvailable()
            q.stop()
            dp = {
                (r["path"], r["ts_sec"]): r["value"]
                for r in pipe.datapoints().collect()
            }
            assert dp[("metrics.a", t)] == 2.5  # in-datagram arrival LWW
            assert dp[("metrics.b", t)] == 7.0
        finally:
            rx.close()
            shutil.rmtree(TMP, ignore_errors=True)

    def test_serve_polls_on_a_thread_and_flushes_on_close(self):
        shutil.rmtree(TMP, ignore_errors=True)
        rx = UdpLineReceiver(str(TMP / "in2"))
        rx.serve(poll_interval=0.05)
        try:
            tx = open_for_send(f"127.0.0.1:{rx.port}")
            tx.send(b"metrics.c 1 1704672000")
            tx.close()
        finally:
            rx.close()  # joins the thread, drains, flushes
        files = list((TMP / "in2").glob("udp-*.txt"))
        assert len(files) == 1
        assert files[0].read_text() == "metrics.c 1 1704672000\n"
        shutil.rmtree(TMP, ignore_errors=True)

    def test_half_written_files_never_visible(self):
        # the bridge writes dotfiles then renames: nothing but complete
        # udp-*.txt files ever exists under the watched glob
        shutil.rmtree(TMP, ignore_errors=True)
        rx = UdpLineReceiver(str(TMP / "in3"))
        try:
            tx = open_for_send(f"127.0.0.1:{rx.port}")
            tx.send(b"metrics.d 1 1704672000")
            tx.close()
            deadline = time.time() + 5
            while rx.poll() == 0 and time.time() < deadline:
                time.sleep(0.01)
            rx.flush()
            names = {p.name for p in (TMP / "in3").iterdir()}
            assert all(n.startswith("udp-") and n.endswith(".txt") for n in names)
        finally:
            rx.close()
            shutil.rmtree(TMP, ignore_errors=True)


def _recv_all(sock, n, timeout=10.0):
    sock.settimeout(timeout)
    out = []
    try:
        while len(out) < n:
            out.append(sock.recvfrom(65_535)[0].decode())
    except socket.timeout:
        pass
    return out


class TestSyslogTransport:
    def test_foreach_partition_sends_datagrams_executor_side(self, spark):
        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        port = rx.getsockname()[1]
        try:
            df = spark.createDataFrame(
                [("m.a", 1.5, NOW), ("m.b", 2.0, NOW + 1)],
                "path string, value double, ts_sec bigint",
            )
            df.foreachPartition(
                syslog_foreach_partition(
                    f"127.0.0.1:{port}", host="Vera-555", tag="DataCache"
                )
            )
            grams = sorted(_recv_all(rx, 2))
            assert len(grams) == 2
            # golden shape (render/formats.syslog_line, facility user/info)
            assert grams[0] == "<14>Jan 08 00:00:00 Vera-555 DataCache: m.a 1.5 1704672000\n"
            assert grams[1] == "<14>Jan 08 00:00:01 Vera-555 DataCache: m.b 2.0 1704672001\n"
        finally:
            rx.close()

    def test_syslog_sink_send_surface(self):
        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        port = rx.getsockname()[1]
        sink = SyslogSink(f"127.0.0.1:{port}", host="Vera-1", tag="DataYours")
        try:
            sink.send("starting...", when=NOW)
            grams = _recv_all(rx, 1)
            assert grams == ["<14>Jan 08 00:00:00 Vera-1 DataYours: starting...\n"]
        finally:
            sink.close()
            rx.close()
