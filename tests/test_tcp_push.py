"""TCP/telnet push sink: distributed per-partition connections, retry,
and a full socket-in -> path -> socket-out round trip in one process."""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from dcafs_spark.sinks import tcp_push_sink, telnet_push_sink


class _CollectServer(threading.Thread):
    """Accepts any number of connections; records every received line."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.lines: list[str] = []
        self.conn_count = 0
        self._lock = threading.Lock()
        self._stop = False

    def run(self):
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            with self._lock:
                self.conn_count += 1
            threading.Thread(target=self._reader, args=(conn,), daemon=True).start()

    def _reader(self, conn):
        buf = b""
        with conn:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
        if buf:
            with self._lock:
                self.lines.extend(buf.decode().replace("\r\n", "\n").strip("\n").split("\n"))

    def close(self):
        self._stop = True
        try:
            self.srv.close()
        except OSError:
            pass


def test_batch_push_all_rows_arrive(spark):
    server = _CollectServer()
    server.start()
    df = spark.range(100).select(F.concat(F.lit("row-"), F.col("id")).alias("value")).repartition(4)
    sink = tcp_push_sink("127.0.0.1", server.port)
    sink(df, 0)
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline and len(server.lines) < 100:
        time.sleep(0.1)
    server.close()
    assert sorted(server.lines) == sorted(f"row-{i}" for i in range(100))
    # one connection per partition — the push is distributed, not funneled
    assert server.conn_count == 4


def test_telnet_hello_and_crlf(spark):
    server = _CollectServer()
    server.start()
    df = spark.createDataFrame([("a",), ("b",)], "value string").coalesce(1)
    sink = telnet_push_sink("127.0.0.1", server.port, hello=("LOGIN admin",))
    sink(df, 0)
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline and len(server.lines) < 3:
        time.sleep(0.1)
    server.close()
    assert server.lines[0] == "LOGIN admin"
    assert sorted(server.lines[1:]) == ["a", "b"]


def test_push_raises_when_target_down(spark):
    # grab a port and close it -> connection refused; sink must raise
    # (surfacing Spark task failure), not drop the batch silently
    probe = socket.create_server(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    df = spark.createDataFrame([("x",)], "value string")
    sink = tcp_push_sink("127.0.0.1", port, retries=1, backoff=0.05, connect_timeout=0.5)
    with pytest.raises(Exception):
        sink(df, 0)


def test_stream_in_path_out_round_trip(spark):
    """socket source -> filter path -> tcp push sink, all in-process:
    the reference's stream->forward->stream forwarding loop."""
    from dcafs_spark.streaming import StreamingPath

    out_server = _CollectServer()
    out_server.start()
    in_server = socket.create_server(("127.0.0.1", 0))
    in_port = in_server.getsockname()[1]
    accepted: dict = {}

    def accept():
        conn, _ = in_server.accept()
        accepted["conn"] = conn

    threading.Thread(target=accept, daemon=True).start()

    sp = StreamingPath(
        spark,
        source={"kind": "socket", "host": "127.0.0.1", "port": in_port, "id": "in"},
        path={
            "id": "fwd",
            "delimiter": ",",
            "steps": [{"type": "filter", "rules": [["start", "$OK"]]}],
        },
        sinks=[tcp_push_sink("127.0.0.1", out_server.port)],
    )
    q = sp.start("t_roundtrip")
    try:
        deadline = time.monotonic() + 30
        while "conn" not in accepted and time.monotonic() < deadline:
            time.sleep(0.1)
        accepted["conn"].sendall(b"$OK,1\ndrop,me\n$OK,2\n")
        while time.monotonic() < deadline and len(out_server.lines) < 2:
            q.processAllAvailable()
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination(10)
        for s in (in_server, accepted.get("conn")):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass
        out_server.close()
    assert sorted(out_server.lines) == ["$OK,1", "$OK,2"]
