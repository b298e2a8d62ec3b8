"""UDP wire transports: the reference's datagram plumbing, Spark-adjacent.

Closes the two SURVEY §2 transport partials:

- **S1 UDP line receiver** (`L_DataDaemon.lua:218-244` `open_for_listen`):
  the reference polls a non-blocking UDP socket at 1 Hz and hands each
  plaintext datagram to the Cache daemon.  Spark's file stream is the
  durable equivalent, so the receiver here is a BRIDGE: drain the socket,
  append datagram lines to rotating files in the ingest input directory —
  `IngestPipeline` (the Cache daemon) picks them up as a streaming source.
  Wire → file → stream keeps Spark's exactly-once checkpointing while the
  wire side stays fire-and-forget UDP, exactly the reference's at-most-once
  ingest contract.
- **S6 syslog sink** (`L_DataDaemon.lua:246-259` `open_for_syslog`): the
  ``<14>%b %d %H:%M:%S HOST tag: message`` datagram (record format already
  in `render/formats.syslog_line`) sent over a real UDP socket.  The
  foreachBatch helper sends per PARTITION on the executors — the driver
  never funnels the relay echo.

Scale notes: one receiver instance is one ingest edge node; N edges write
to the same input directory (files are uniquely named per receiver+flush),
and the file stream absorbs them all.  The syslog sink opens one socket per
partition per batch — no shared driver socket, no serialization of a live
socket into the closure.
"""

from __future__ import annotations

import os
import re
import socket
import threading
import time
import uuid

_IP_PORT = re.compile(r"^(\d+\.\d+\.\d+\.\d+):(\d+)$")


def parse_ip_port(ip_and_port: str) -> tuple[str, int]:
    """The reference's strict ``d.d.d.d:port`` syntax
    (`L_DataDaemon.lua:207`); anything else is an error, as there."""
    m = _IP_PORT.match(ip_and_port)
    if not m:
        raise ValueError(f"invalid ip:port syntax {ip_and_port!r}")
    return m.group(1), int(m.group(2))


def open_for_send(ip_and_port: str) -> socket.socket:
    """A UDP socket connected to the destination (`open_for_send`,
    `L_DataDaemon.lua:205-217`)."""
    ip, port = parse_ip_port(ip_and_port)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.connect((ip, port))
    return sock


def atomic_drop(input_dir: str, name: str, text: str) -> str:
    """Drop `text` into a stream input directory ATOMICALLY: write to a
    dot-prefixed temp name and rename.  This is THE protocol every
    producer feeding the file-stream source must use — the source must
    never list a half-written file, and it tracks processed files BY NAME
    (an overwritten name is silently never re-read), so names must be
    unique.  Shared by the UDP receiver, the launcher heartbeat, and any
    test/producer dropping records.  Returns the final path."""
    tmp = os.path.join(input_dir, "." + name)
    dst = os.path.join(input_dir, name)
    with open(tmp, "w") as f:
        f.write(text)
    os.rename(tmp, dst)
    return dst


class UdpLineReceiver:
    """S1: non-blocking UDP listener bridging datagrams into the file-drop
    ingest directory.

    `poll()` mirrors the reference's polling callback
    (`L_DataDaemon.lua:224-232`): drain every pending datagram without
    blocking, then return.  Buffered lines land in the input directory as
    one uniquely-named file per `flush()` (or automatically every
    ``flush_lines``).  `serve()` runs the 1 Hz-style poll loop on a daemon
    thread for callers that want the reference's standing listener.
    """

    def __init__(
        self,
        input_dir: str,
        port: int = 0,
        host: str = "127.0.0.1",
        flush_lines: int = 500,
    ):
        self.input_dir = input_dir
        os.makedirs(input_dir, exist_ok=True)
        self.flush_lines = flush_lines
        self._buf: list[str] = []
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host, port))
        self._sock.setblocking(False)
        self.port = self._sock.getsockname()[1]
        self._uid = uuid.uuid4().hex[:8]
        self._n_files = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def poll(self) -> int:
        """Drain pending datagrams (non-blocking); returns datagrams read."""
        n = 0
        while True:
            try:
                datagram, _addr = self._sock.recvfrom(65_535)
            except BlockingIOError:
                break
            n += 1
            text = datagram.decode("utf-8", errors="replace")
            self._buf.extend(
                line for line in text.splitlines() if line.strip()
            )
        if len(self._buf) >= self.flush_lines:
            self.flush()
        return n

    def flush(self) -> str | None:
        """Write buffered lines as one new file in the input directory —
        the moment records become visible to the file stream.  Files are
        written to a dotfile first and renamed, so the stream source never
        lists a half-written file."""
        if not self._buf:
            return None
        self._n_files += 1
        name = f"udp-{self._uid}-{self._n_files:06d}.txt"
        dst = atomic_drop(self.input_dir, name, "\n".join(self._buf) + "\n")
        self._buf = []
        return dst

    def serve(self, poll_interval: float = 1.0) -> None:
        """Start the standing listener (reference: 1 Hz `call_delay` poll)."""
        def loop():
            while not self._stop.is_set():
                self.poll()
                self._stop.wait(poll_interval)
            self.poll()
            self.flush()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        else:
            self.poll()
            self.flush()
        self._sock.close()


def syslog_foreach_partition(
    ip_and_port: str, host: str, tag: str = "DataDaemon"
):
    """A `foreachPartition` function echoing (path, value, ts_sec) rows as
    syslog datagrams — the relay's syslog destination (`L_DataDaemon.lua:
    315-320`), executor-side.

    Each partition opens its own socket (sockets don't serialize; the
    closure carries only the address), formats every record with the
    byte-tested `syslog_line`, and sends fire-and-forget — UDP syslog's
    contract.  Use: ``df.foreachPartition(syslog_foreach_partition(...))``
    or inside a streaming `foreachBatch`.
    """
    def send_partition(rows) -> None:
        from datayours_spark.render.formats import syslog_line

        sock = None
        try:
            for row in rows:
                if sock is None:  # open lazily: empty partitions stay silent
                    ip, port = parse_ip_port(ip_and_port)
                    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                    sock.connect((ip, port))
                message = f"{row['path']} {row['value']} {row['ts_sec']}"
                sock.send(
                    syslog_line(
                        message, host, tag, when=row["ts_sec"]
                    ).encode()
                )
        finally:
            if sock is not None:
                sock.close()

    return send_partition


class SyslogSink:
    """Driver-side syslog emitter with the reference's send() surface
    (`open_for_syslog` returns {send, close}) — for control-plane messages
    (startup, heartbeat lines).  Data-plane echo belongs in
    :func:`syslog_foreach_partition`."""

    def __init__(self, ip_and_port: str, host: str, tag: str = "DataDaemon"):
        self.host = host
        self.tag = tag
        self._sock = open_for_send(ip_and_port)

    def send(self, message: str, when: int | None = None) -> None:
        from datayours_spark.render.formats import syslog_line

        self._sock.send(
            syslog_line(message, self.host, self.tag, when=when).encode()
        )

    def close(self) -> None:
        self._sock.close()


__all__ = [
    "UdpLineReceiver",
    "SyslogSink",
    "open_for_send",
    "parse_ip_port",
    "syslog_foreach_partition",
]
