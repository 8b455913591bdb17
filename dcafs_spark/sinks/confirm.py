"""ConfirmCollector: send-until-acknowledged command queue.

Parity target: reference `src/io/collector/ConfirmCollector.java:17-53`
— messages are queued with an expected reply (`**` in the reply
template is replaced by the message); the head message is sent to the
target, the collector waits for a matching reply (case-insensitive),
resends on timeout up to `max_attempts`, then reports failure and
drains. A confirm with an empty expected reply is fire-and-forget.

This is control-plane (device handshakes), not data-plane: it runs on
the driver next to the scheduler, so there is nothing to distribute.
The stream's inbound lines are fed in via `add_data` (e.g. from a
`foreachBatch` over the device's reply stream); timeouts are advanced
by `check_timeout`, which the engine scheduler calls on its tick.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class _Confirm:
    msg: str
    reply: str  # "" = fire-and-forget
    attempts: int = 0
    sent_at: float = 0.0


@dataclass
class ConfirmCollector:
    id: str
    target: Callable[[str], None]  # Writable.writeLine equivalent
    max_attempts: int = 5  # ConfirmCollector.java:22
    timeout_seconds: float = 3.0  # ConfirmCollector.java:23
    clock: Callable[[], float] = time.monotonic
    on_result: list[Callable[[str, bool], None]] = field(default_factory=list)
    _queue: list[_Confirm] = field(default_factory=list)
    _failed: list[str] = field(default_factory=list)

    def add_confirm(self, message: str, reply: str = "") -> None:
        """Queue a message; `**` in the reply template is replaced by
        the message (ConfirmCollector.java:52-55). The first queued
        confirm is sent immediately."""
        self._queue.append(_Confirm(message, reply.replace("**", message)))
        if len(self._queue) == 1:
            self._attempt()

    def add_confirms(self, messages: list[str], reply: str = "") -> None:
        for m in messages:
            self.add_confirm(m, reply)

    def _attempt(self) -> None:
        head = self._queue[0]
        head.attempts += 1
        head.sent_at = self.clock()
        self.target(head.msg)
        # An empty-reply confirm is "delayed sending": it stays queued
        # until the next timeout tick pops it and sends the successor
        # (reference timedOut(), ConfirmCollector.java:131-141) — the
        # timeout doubles as pacing between unconfirmed sends.

    def add_data(self, reply: str) -> bool:
        """Inbound line from the target stream. Matching the head
        confirm's expected reply pops it and sends the next. Returns
        False when nothing is waiting (collector can detach).
        Fire-and-forget heads (empty expected reply) are released by
        the timeout tick, never by inbound data — a blank keepalive
        line must not count as an acknowledgement."""
        if not self._queue:
            return False
        head = self._queue[0]
        if head.reply and reply.strip().lower() == head.reply.lower():
            self._queue.pop(0)
            self._report(head.msg, True)
            if self._queue:
                self._attempt()
        return bool(self._queue)

    def check_timeout(self) -> None:
        """Scheduler tick. Fire-and-forget head (empty reply): the
        expired wait IS the release — pop, report ok, send the
        successor (the timeout doubles as pacing between unconfirmed
        sends, reference timedOut(), ConfirmCollector.java:131-141).
        Confirmed head: resend until max_attempts, then report bad and
        drain — every drained successor also gets a failure callback
        and a `failed` record (none of them were ever sent)."""
        if not self._queue:
            return
        head = self._queue[0]
        if self.clock() - head.sent_at < self.timeout_seconds:
            return
        if not head.reply:
            self._queue.pop(0)
            self._report(head.msg, True)
            if self._queue:
                self._attempt()
            return
        if head.attempts >= self.max_attempts:
            drained = [c.msg for c in self._queue]  # head + unsent successors
            self._queue.clear()  # a failed handshake aborts the batch
            for m in drained:
                self._failed.append(m)
                self._report(m, False)
            return
        self._attempt()

    def _report(self, msg: str, ok: bool) -> None:
        for cb in self.on_result:
            cb(msg, ok)

    @property
    def pending(self) -> list[str]:
        return [c.msg for c in self._queue]

    @property
    def failed(self) -> list[str]:
        return list(self._failed)

    def is_empty(self) -> bool:
        return not self._queue
