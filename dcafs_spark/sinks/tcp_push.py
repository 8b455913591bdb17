"""Outbound TCP/telnet line push — the data-plane write path.

Parity target: the reference forwards processed lines back out over
TCP/telnet (`src/io/stream/StreamManager.java` writeLine/writeBytesToStream
paths; telnet is the same byte stream with CRLF line endings). Its
writer is a single socket on the event loop; here the push distributes:
each partition opens its own connection and streams its rows, so
throughput scales with partitions and no executor funnels through the
driver. Per-partition connect/write retries with exponential backoff;
after `retries` exhausted the task raises, surfacing Spark's own task
retry / failure accounting instead of silently dropping data.

Usable both as a `foreachBatch` sink on a StreamingPath and directly
on a batch DataFrame.
"""

from __future__ import annotations

import socket
import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame


_CHUNK_LINES = 1000  # replay-buffer bound: only this many rows are ever held


def _send_partition(
    rows: Iterator[Any],
    host: str,
    port: int,
    value_col: str,
    newline: str,
    connect_timeout: float,
    retries: int,
    backoff: float,
    hello: tuple[str, ...],
) -> None:
    # Bounded at-least-once: rows stream to the socket in chunks of
    # _CHUNK_LINES; a flushed chunk is dropped, so executor memory holds
    # at most one chunk regardless of partition size. On a mid-write
    # failure the current chunk is resent on a fresh connection
    # (chunk-granular resend, like the reference's resend-on-timeout —
    # receivers get at-least-once either way since Spark task retry
    # replays whole partitions).
    it = iter(rows)
    # don't open a connection for an empty partition: streaming fires
    # the sink on every micro-batch (many are empty), and at scale idle
    # partitions would otherwise storm the target with no-op connects
    try:
        first = next(it)
    except StopIteration:
        return
    chunk: list[str] = [str(first[value_col])]
    attempt = 0
    sock: socket.socket | None = None
    f = None

    def _connect():
        nonlocal sock, f
        sock = socket.create_connection((host, port), timeout=connect_timeout)
        f = sock.makefile("wb")
        for line in hello:
            f.write((line + newline).encode())

    try:
        while True:
            # fill the current chunk from the row iterator
            for row in it:
                chunk.append(str(row[value_col]))
                if len(chunk) >= _CHUNK_LINES:
                    break
            if not chunk:
                return
            while True:  # flush this chunk, reconnect+resend on failure
                try:
                    if sock is None:
                        _connect()
                    for line in chunk:
                        f.write((line + newline).encode())
                    f.flush()
                    break
                except OSError:
                    if sock is not None:
                        try:
                            sock.close()
                        except OSError:
                            pass
                        sock = None
                    attempt += 1
                    if attempt > retries:
                        raise
                    time.sleep(backoff * (2 ** (attempt - 1)))
            chunk = []  # flushed — release before filling the next one
    finally:
        if sock is not None:
            try:
                f.flush()
                sock.close()
            except OSError:
                pass


def tcp_push_sink(
    host: str,
    port: int,
    value_col: str = "value",
    newline: str = "\n",
    connect_timeout: float = 5.0,
    retries: int = 3,
    backoff: float = 0.2,
    hello: tuple[str, ...] = (),
) -> Callable[[DataFrame, int], None]:
    """Build a sink callable pushing `value_col` as lines over TCP.

    `newline="\\r\\n"` gives telnet framing; `hello` lines are sent
    once per connection before data (login banners / mode commands —
    the telnet-session preamble)."""

    def sink(df: DataFrame, batch_id: int) -> None:
        df.select(value_col).foreachPartition(
            lambda rows: _send_partition(
                rows, host, port, value_col, newline, connect_timeout, retries, backoff, hello
            )
        )

    return sink


def telnet_push_sink(host: str, port: int, **kwargs) -> Callable[[DataFrame, int], None]:
    """TCP push with CRLF line endings (telnet byte framing)."""
    kwargs.setdefault("newline", "\r\n")
    return tcp_push_sink(host, port, **kwargs)
