"""Action output transports for scheduler tasks and trigger rules.

Parity target: the reference's task outputs — email, SMS, Matrix
(`src/util/task/Task.java:69-71`, `src/util/email/EmailWorker.java`,
Matrix via its client-server REST API). These are control-plane
notifications fired from the driver (one message per trigger/task
firing), so plain stdlib clients are the right weight: smtplib for
email, an HTTP POST for Matrix/SMS-gateway-style webhooks. Each
factory returns a `Callable[[str], None]` matching the scheduler's
`Task.action` signature (it receives the rendered template text).

Failures raise by default so a taskset's failure links fire
(`TaskManager.fire` counts an exception as a failed run); pass
`on_error` to swallow-and-log instead for fire-and-forget alerting.
"""

from __future__ import annotations

import json
import smtplib
import urllib.request
from collections.abc import Callable
from email.message import EmailMessage
from typing import Any


def smtp_action(
    host: str,
    port: int,
    sender: str,
    to: str | list[str],
    subject: str = "dcafs alert",
    timeout: float = 10.0,
    starttls: bool = False,
    on_error: Callable[[Exception], Any] | None = None,
) -> Callable[[str], None]:
    """Email output: rendered task text becomes the message body.

    The subject may carry a `{body}` placeholder for one-line alerts
    (reference emails use the triggering value in the subject)."""
    recipients = [to] if isinstance(to, str) else list(to)

    def send(text: str) -> None:
        msg = EmailMessage()
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        # plain replace, not str.format: subjects carrying scheduler
        # template tokens ({r:id}/{utc:fmt}) or a literal brace must
        # not crash the transport at send time
        msg["Subject"] = subject.replace("{body}", text.splitlines()[0] if text else "")
        msg.set_content(text)
        try:
            with smtplib.SMTP(host, port, timeout=timeout) as s:
                if starttls:
                    s.starttls()
                s.send_message(msg)
        except Exception as exc:  # noqa: BLE001 — transport boundary
            if on_error is None:
                raise
            on_error(exc)

    return send


def webhook_action(
    url: str,
    text_key: str = "text",
    extra: dict | None = None,
    headers: dict | None = None,
    timeout: float = 10.0,
    on_error: Callable[[Exception], Any] | None = None,
) -> Callable[[str], None]:
    """JSON-POST output — the Matrix `m.room.message` / SMS-gateway
    shape: `{text_key: <rendered text>, **extra}` to a fixed URL.
    For Matrix proper: url=.../rooms/{id}/send/m.room.message,
    extra={"msgtype": "m.text"}, text_key="body",
    headers={"Authorization": "Bearer <token>"}."""

    def send(text: str) -> None:
        payload = {**(extra or {}), text_key: text}
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", **(headers or {})},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
        except Exception as exc:  # noqa: BLE001 — transport boundary
            if on_error is None:
                raise
            on_error(exc)

    return send
