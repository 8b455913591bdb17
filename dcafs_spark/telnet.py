"""Interactive telnet command server — the reference's primary UX.

Parity target: `src/io/telnet/TelnetServer.java` + `TelnetHandler.java`
— clients connect, get a greeting, issue `prefix:args` commands and
subscribe to live data (`raw:<id>` in the reference's handler), replies
end with CRLF. Here the bridge is sockets → `Engine.command` →
path-sink subscriptions: a `raw:<path-id>` request registers a
per-client sink on the path (the same fan-out every other sink uses),
so subscribed lines ride the existing foreachBatch machinery — no
second data path.

Spark-side scale note: the server is a driver-side control surface
(like the reference's netty loop); the data plane stays distributed.
The only driver materialization is the per-subscriber push, bounded to
`max_push_lines` per micro-batch — a human terminal, not a sink.
"""

from __future__ import annotations

import socket
import threading
from typing import Any

from pyspark.sql import DataFrame

CRLF = "\r\n"


def _render(result: Any, max_rows: int = 20) -> str:
    """Command result → telnet text (DataFrames render like the
    reference's table replies, capped for an interactive session)."""
    if result is None:
        return ""
    if isinstance(result, bool):
        return "OK" if result else "FAILED"
    if isinstance(result, DataFrame):
        rows = result.limit(max_rows + 1).collect()
        header = ",".join(result.columns)
        body = [",".join("" if v is None else str(v) for v in r) for r in rows[:max_rows]]
        if len(rows) > max_rows:
            body.append(f"... ({max_rows}+ rows, refine the query)")
        return "\n".join([header, *body])
    return str(result)


class _Client:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.lock = threading.Lock()  # sinks + command replies interleave
        self.subs: list[tuple[str, Any]] = []  # (path_id, sink fn)
        self.alive = True

    def write_line(self, text: str) -> None:
        with self.lock:
            self.sock.sendall((text + CRLF).encode())


class TelnetServer:
    """Thin accept-loop bridging line-based sessions to Engine.command."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 title: str = "dcafs", max_push_lines: int = 1000):
        self.engine = engine
        self.host = host
        self.port = port
        self.title = title
        self.max_push_lines = max_push_lines
        self._server: socket.socket | None = None
        self._clients: list[_Client] = []
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        engine.telnet_server = self  # task output="telnet" broadcasts here

    def broadcast(self, line: str) -> int:
        """Push one line to every connected session; returns #receivers
        (the reference's TELNET task output / `telnet:broadcast`,
        src/util/task/Task.java:69)."""
        n = 0
        for c in list(self._clients):
            try:
                c.write_line(line)
                n += 1
            except Exception:
                self._drop(c)
        return n

    # ------------------------------------------------------------ lifecycle
    def start(self) -> tuple[str, int]:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(8)
        self._server = srv
        self.host, self.port = srv.getsockname()
        t = threading.Thread(target=self._accept_loop, daemon=True, name="telnet-accept")
        t.start()
        self._threads.append(t)
        return self.host, self.port

    def stop(self) -> None:
        self._stop.set()
        for c in list(self._clients):
            self._drop(c)
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass

    # ------------------------------------------------------------- internals
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _addr = self._server.accept()
            except OSError:
                return  # closed
            client = _Client(sock)
            self._clients.append(client)
            t = threading.Thread(
                target=self._serve, args=(client,), daemon=True, name="telnet-client"
            )
            t.start()
            self._threads.append(t)

    def _drop(self, client: _Client) -> None:
        client.alive = False
        for pid, sink in client.subs:
            h = self.engine.paths.get(pid)
            if h is not None and sink in h.sinks:
                h.sinks.remove(sink)
        client.subs.clear()
        try:
            client.sock.close()
        except OSError:
            pass
        if client in self._clients:
            self._clients.remove(client)

    def _subscribe(self, client: _Client, pid: str) -> str:
        if pid not in self.engine.paths:
            return f"No such path: {pid}"

        def _push_batch(df: DataFrame, batch_id: int) -> None:
            if not client.alive:
                return
            # bounded driver materialization: an interactive terminal
            # reads at most max_push_lines per micro-batch — limit()
            # caps the transfer regardless of batch size
            rows = df.select("value").limit(self.max_push_lines).collect()
            try:
                for r in rows:
                    client.write_line(str(r["value"]))
            except OSError:
                client.alive = False  # reader went away; next cmd drops it

        self.engine.add_sink(pid, _push_batch)
        client.subs.append((pid, _push_batch))
        return f"Subscribed to raw data of {pid}"

    def _unsubscribe(self, client: _Client) -> str:
        n = len(client.subs)
        for pid, sink in client.subs:
            h = self.engine.paths.get(pid)
            if h is not None and sink in h.sinks:
                h.sinks.remove(sink)
        client.subs.clear()
        return f"Unsubscribed from {n} path(s)"

    def _serve(self, client: _Client) -> None:
        client.write_line(f"Welcome to {self.title}!")
        reader = client.sock.makefile("r", encoding="utf-8", errors="replace")
        try:
            for raw in reader:
                line = raw.strip()
                if not line:
                    continue
                if line.lower() in ("bye", "exit", "quit"):
                    client.write_line("Bye! Back to telnet mode...")
                    break
                if line.lower().startswith("raw:"):
                    client.write_line(self._subscribe(client, line[4:].strip()))
                    continue
                if line.lower().startswith("read:"):
                    # CommandPool doREAD parity: read:<id> subscribes this
                    # session to the readable's data, same fan-out as raw:
                    client.write_line(self._subscribe(client, line[5:].strip()))
                    continue
                if line.lower() in ("stop", "unsub"):
                    client.write_line(self._unsubscribe(client))
                    continue
                try:
                    reply = _render(self.engine.command(line))
                except Exception as exc:  # noqa: BLE001 — session must survive
                    reply = f"error: {exc}"
                for out in (reply or "done").split("\n"):
                    client.write_line(out)
        except OSError:
            pass
        finally:
            self._drop(client)
