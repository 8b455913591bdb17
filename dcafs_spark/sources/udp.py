"""UDP datagram source bridge.

The reference accepts UDP sensor streams directly
(`src/io/stream/udp/UdpServer.java`, wired by StreamManager's
`ss:addudp`). Structured Streaming has no UDP source, so the same
file-drop bridge the MQTT connector uses applies: a driver-side
listener spools datagram payloads into a directory the `text` source
streams — half-written files are never visible (tmp + atomic rename),
and the spool directory is the replayable source of record.

Scale note: like the reference's netty UDP handler this is an edge
concern — one socket per ingest host feeding the distributed plane
through files; throughput is bounded by the OS datagram path, not
Spark.
"""

from __future__ import annotations

import os
import socket
import threading
import time


class UdpBridge:
    """Listen on a UDP port, spool one line per datagram into
    `spool_dir` for a text file-drop stream (`ss:addudp` wires one up)."""

    def __init__(
        self,
        port: int,
        spool_dir: str,
        host: str = "127.0.0.1",
        lines_per_file: int = 2048,
        flush_age_s: float = 1.0,
    ):
        self.host, self.port = host, port
        self.spool_dir = spool_dir
        self.lines_per_file = lines_per_file
        self.flush_age_s = flush_age_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._sock: socket.socket | None = None
        self.n_messages = 0

    # ---------------------------------------------------------- lifecycle
    def start(self) -> "UdpBridge":
        os.makedirs(self.spool_dir, exist_ok=True)
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind((self.host, self.port))
        self.port = sock.getsockname()[1]  # resolve port 0 → ephemeral
        sock.settimeout(0.25)  # short poll so age flushes + stop work when idle
        self._sock = sock
        self._thread = threading.Thread(target=self._run, daemon=True, name="udp-bridge")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass

    # ------------------------------------------------------------- pump
    def _run(self) -> None:
        buf: list[str] = []
        seq = 0
        last_flush = time.monotonic()
        while not self._stop.is_set():
            try:
                data, _addr = self._sock.recvfrom(65535)
            except (socket.timeout, TimeoutError):
                data = None
            except OSError:
                break
            now = time.monotonic()
            if data is not None:
                # one datagram = one record (the reference splits on the
                # stream's eol only for TCP; UDP frames are the framing)
                for line in data.decode(errors="replace").splitlines() or [""]:
                    buf.append(line)
                    self.n_messages += 1
            if buf and (len(buf) >= self.lines_per_file or now - last_flush >= self.flush_age_s):
                seq = self._flush(buf, seq)
                buf, last_flush = [], now
        if buf:
            self._flush(buf, seq)

    def _flush(self, lines: list[str], seq: int) -> int:
        tmp = os.path.join(self.spool_dir, f".udp_{seq:08d}.tmp")
        dst = os.path.join(self.spool_dir, f"udp_{seq:08d}.txt")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, dst)
        return seq + 1
