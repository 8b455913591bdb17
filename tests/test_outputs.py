"""Action output transports against real in-process servers: a
protocol-speaking SMTP server and an HTTP webhook endpoint, wired
through a scheduler task so the full trigger → template → transport
path is covered without external services."""

from __future__ import annotations

import json
import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from dcafs_spark.outputs import smtp_action, webhook_action


class _SmtpServer(threading.Thread):
    """Minimal RFC 5321 responder recording one delivered message."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.mail_from = None
        self.rcpt = []
        self.data = None

    def run(self):
        conn, _ = self.srv.accept()
        f = conn.makefile("rb")

        def reply(line: str):
            conn.sendall((line + "\r\n").encode())

        reply("220 test.local SMTP")
        in_data, body = False, []
        while True:
            raw = f.readline()
            if not raw:
                break
            line = raw.decode().rstrip("\r\n")
            if in_data:
                if line == ".":
                    self.data = "\n".join(body)
                    in_data = False
                    reply("250 queued")
                else:
                    body.append(line)
                continue
            verb = line.split(" ", 1)[0].upper()
            if verb in ("HELO", "EHLO"):
                reply("250 test.local")
            elif verb == "MAIL":
                self.mail_from = line.split(":", 1)[1].strip()
                reply("250 ok")
            elif verb == "RCPT":
                self.rcpt.append(line.split(":", 1)[1].strip())
                reply("250 ok")
            elif verb == "DATA":
                in_data = True
                reply("354 go")
            elif verb == "QUIT":
                reply("221 bye")
                break
            else:
                reply("250 ok")
        conn.close()
        self.srv.close()


def test_smtp_action_delivers():
    srv = _SmtpServer()
    srv.start()
    send = smtp_action(
        "127.0.0.1", srv.port, "engine@local", "ops@local", subject="alert: {body}"
    )
    send("temp above 30\nsecond line")
    srv.join(10)
    assert srv.mail_from == "<engine@local>"
    assert srv.rcpt == ["<ops@local>"]
    assert "Subject: alert: temp above 30" in srv.data
    assert "second line" in srv.data


def test_smtp_action_raises_when_down():
    probe = socket.create_server(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    with pytest.raises(Exception):
        smtp_action("127.0.0.1", port, "a@b", "c@d", timeout=0.5)("x")
    errs = []
    smtp_action("127.0.0.1", port, "a@b", "c@d", timeout=0.5, on_error=errs.append)("x")
    assert len(errs) == 1  # fire-and-forget flavor swallows


class _Hook(BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        _Hook.received.append(
            (self.path, self.headers.get("Authorization"), json.loads(self.rfile.read(n)))
        )
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):  # silence
        pass


def test_webhook_action_matrix_shape():
    httpd = HTTPServer(("127.0.0.1", 0), _Hook)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.handle_request, daemon=True).start()
    send = webhook_action(
        f"http://127.0.0.1:{port}/rooms/r1/send/m.room.message",
        text_key="body",
        extra={"msgtype": "m.text"},
        headers={"Authorization": "Bearer tok"},
    )
    send("geofence ENTER harbor")
    httpd.server_close()
    path, auth, payload = _Hook.received[-1]
    assert path.endswith("/send/m.room.message")
    assert auth == "Bearer tok"
    assert payload == {"msgtype": "m.text", "body": "geofence ENTER harbor"}


def test_scheduler_task_fires_email(spark):
    """Full path: store value -> template -> SMTP transport."""
    from dcafs_spark.scheduler import Task, TaskManager
    from dcafs_spark.streaming.values_store import ValuesStore

    store = ValuesStore()
    df = spark.createDataFrame(
        [("ctd", "temp", 31.5, 1.0)], "group string, name string, value double, ts double"
    )
    store.merge_batch(df)

    srv = _SmtpServer()
    srv.start()
    tm = TaskManager(store)
    task = Task(
        "alert",
        smtp_action("127.0.0.1", srv.port, "engine@local", "ops@local"),
        value="temp is {r:ctd_temp}",
    )
    assert tm.fire(task) is True
    srv.join(10)
    assert "temp is 31.5" in srv.data


def test_full_alert_loop_issue_plus_webhook(spark):
    """Threshold crossing -> issue raised + webhook alert; clearing
    resolves the issue; re-crossing re-alerts (hysteresis) — the
    reference's trigger->IssuePool->notification loop end to end."""
    from dcafs_spark.issues import IssuePool
    from dcafs_spark.streaming.values_store import TriggerRule, ValuesStore

    httpd = HTTPServer(("127.0.0.1", 0), _Hook)
    port = httpd.server_address[1]
    n_before = len(_Hook.received)

    def serve_n(n):
        for _ in range(n):
            threading.Thread(target=httpd.handle_request, daemon=True).start()

    serve_n(2)
    store = ValuesStore()
    pool = IssuePool(clock=lambda: 1000.0)
    pool.attach(store, "overtemp", "ctd", "temp", "above 30")
    alert = webhook_action(f"http://127.0.0.1:{port}/alert")
    store.add_rule(
        TriggerRule(
            "ctd", "temp", "comparison", comparison="above 30",
            cmd=lambda g, n, v: alert(f"{g}.{n}={v}"),
        )
    )

    def push(*vals):
        rows = [("ctd", "temp", float(v), float(i)) for i, v in enumerate(vals)]
        store.merge_batch(
            spark.createDataFrame(rows, "group string, name string, value double, ts double")
        )

    push(25.0, 31.5)  # crossing: raise + one alert
    assert [i.id for i in pool.active()] == ["overtemp"]
    push(28.0)  # clears: resolve, rules re-arm
    assert pool.active() == []
    push(35.0)  # re-crossing: second alert, issue re-raised
    assert pool.issues["overtemp"].count == 2
    httpd.server_close()
    sent = [p for _path, _a, p in _Hook.received[n_before:]]
    assert sent == [{"text": "ctd.temp=31.5"}, {"text": "ctd.temp=35.0"}]
