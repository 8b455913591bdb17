"""Outbound MQTT publish sink — pure-python 3.1.1 client per partition.

Parity target: the reference publishes processed values back to a
broker (`src/io/mqtt/MqttWorker.java` publish path, wired by MqttPool).
No connector jar ships in this sandbox, so the sink reuses the wire
helpers from `sources/mqtt.py` (public OASIS 3.1.1 format): each
partition opens one CONNECT/CONNACK session and streams QoS-0 PUBLISH
packets, so throughput scales with partitions and nothing funnels
through the driver — same distribution argument as sinks/tcp_push.

At-least-once like the reference's QoS-0 worker restart: a mid-write
failure reconnects and resends the current bounded chunk; Spark task
retry replays whole partitions on harder failures.
"""

from __future__ import annotations

import socket
import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame

from dcafs_spark.sources.mqtt import CONNACK, connect_packet, publish_packet, read_packet

_CHUNK_LINES = 1000  # replay-buffer bound, matching sinks/tcp_push


def _publish_partition(
    rows: Iterator[Any],
    host: str,
    port: int,
    topic_col: str | None,
    topic: str,
    value_col: str,
    connect_timeout: float,
    retries: int,
    backoff: float,
    client_id: str,
) -> None:
    it = iter(rows)
    try:
        first = next(it)
    except StopIteration:
        return  # no connect for empty partitions (micro-batches often are)

    def to_msg(row: Any) -> tuple[str, bytes]:
        t = str(row[topic_col]) if topic_col else topic
        return t, str(row[value_col]).encode()

    chunk: list[tuple[str, bytes]] = [to_msg(first)]
    attempt = 0
    sock: socket.socket | None = None

    def _connect():
        nonlocal sock
        import uuid

        sock = socket.create_connection((host, port), timeout=connect_timeout)
        # unique client id per connection: brokers drop the older session
        # when two clients share one (MQTT 3.1.1 §3.1.4), and partitions
        # connect concurrently
        sock.sendall(connect_packet(f"{client_id}-{uuid.uuid4().hex[:8]}"))
        ptype, _, _ = read_packet(sock)
        if ptype != CONNACK:
            raise OSError(f"expected CONNACK, got type {ptype}")

    try:
        while True:
            for row in it:
                chunk.append(to_msg(row))
                if len(chunk) >= _CHUNK_LINES:
                    break
            if not chunk:
                return
            while True:  # flush chunk; reconnect + resend chunk on failure
                try:
                    if sock is None:
                        _connect()
                    payload = b"".join(publish_packet(t, p) for t, p in chunk)
                    sock.sendall(payload)
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
            chunk = []
    finally:
        if sock is not None:
            try:
                sock.close()
            except OSError:
                pass


def mqtt_push_sink(
    host: str,
    port: int,
    topic: str = "dcafs/out",
    topic_col: str | None = None,
    value_col: str = "value",
    connect_timeout: float = 5.0,
    retries: int = 3,
    backoff: float = 0.2,
    client_id: str = "dcafs_spark_pub",
) -> Callable[[DataFrame, int], None]:
    """Build a sink callable publishing `value_col` rows to a broker.

    Fixed `topic`, or per-row when `topic_col` names a column."""

    def sink(df: DataFrame, batch_id: int) -> None:
        cols = [value_col] + ([topic_col] if topic_col else [])
        df.select(*cols).foreachPartition(
            lambda rows: _publish_partition(
                rows, host, port, topic_col, topic, value_col,
                connect_timeout, retries, backoff, client_id,
            )
        )

    return sink
