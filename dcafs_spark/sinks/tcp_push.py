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
    # materialize nothing: stream rows straight onto the socket. On a
    # mid-write failure the whole partition is resent on the next
    # attempt (at-least-once, like the reference's resend-on-timeout).
    it = iter(rows)
    # don't open a connection for an empty partition: streaming fires
    # the sink on every micro-batch (many are empty), and at scale idle
    # partitions would otherwise storm the target with no-op connects
    try:
        first = next(it)
    except StopIteration:
        return
    buffered: list[str] = [str(first[value_col])]
    attempt = 0
    while True:
        try:
            with socket.create_connection((host, port), timeout=connect_timeout) as s:
                f = s.makefile("wb")
                for line in hello:
                    f.write((line + newline).encode())
                for line in buffered:  # first row + rows drained on failed tries
                    f.write((line + newline).encode())
                for row in it:
                    line = str(row[value_col])
                    buffered.append(line)
                    f.write((line + newline).encode())
                f.flush()
            return
        except OSError:
            attempt += 1
            if attempt > retries:
                raise
            time.sleep(backoff * (2 ** (attempt - 1)))


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
