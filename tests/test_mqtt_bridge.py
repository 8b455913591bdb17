"""MQTT bridge round-trip against an in-process stub broker.

Honest-coverage test for the MqttWorker parity path: a thread speaks
broker-side MQTT 3.1.1 (CONNACK/SUBACK, then PUBLISH frames) using the
same public wire-format helpers; the bridge must complete the
subscribe handshake, spool messages as topic<TAB>payload lines, and
feed them through `build_source` → path → sink end-to-end, all with no
connector jar (mirrors test_outputs.py's in-process SMTP/HTTP peers).
"""

from __future__ import annotations

import socket
import threading
import time

import pytest

from dcafs_spark.sources.mqtt import (
    CONNACK,
    CONNECT,
    DISCONNECT,
    PINGREQ,
    PINGRESP,
    SUBACK,
    SUBSCRIBE,
    MqttBridge,
    packet,
    parse_publish,
    publish_packet,
    read_packet,
)


class StubBroker:
    """Single-client broker: handshake, then replay a message script."""

    def __init__(self, messages: list[tuple[str, bytes]]):
        self.messages = messages
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.subscribed_topics: list[str] = []
        self.got_disconnect = False
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self) -> None:
        conn, _ = self.srv.accept()
        with conn:
            ptype, _, _body = read_packet(conn)
            assert ptype == CONNECT
            conn.sendall(packet(CONNACK, 0, b"\x00\x00"))
            ptype, _, body = read_packet(conn)
            assert ptype == SUBSCRIBE
            pid, rest = body[:2], body[2:]
            while rest:
                tlen = int.from_bytes(rest[:2], "big")
                self.subscribed_topics.append(rest[2 : 2 + tlen].decode())
                rest = rest[2 + tlen + 1 :]  # skip qos byte
            codes = bytes(len(self.subscribed_topics))
            conn.sendall(packet(SUBACK, 0, pid + codes))
            for topic, payload in self.messages:
                conn.sendall(publish_packet(topic, payload))
            # stay up for pings until the client disconnects
            conn.settimeout(60)
            try:
                while True:
                    ptype, _, _ = read_packet(conn)
                    if ptype == PINGREQ:
                        conn.sendall(packet(PINGRESP, 0, b""))
                    elif ptype == DISCONNECT:
                        self.got_disconnect = True
                        return
            except OSError:
                return

    def close(self) -> None:
        self.srv.close()


def test_wire_format_roundtrip():
    body = publish_packet("a/b", b"hello")
    # strip fixed header (1 type byte + 1 varint byte for short packets)
    topic, payload = parse_publish(body[2:])
    assert (topic, payload) == ("a/b", b"hello")


def test_bridge_handshake_and_spool(tmp_path):
    broker = StubBroker([("sensor/ctd", b"$CTD,1,2"), ("sensor/ctd", b"$CTD,3,4")])
    spool = tmp_path / "spool"
    bridge = MqttBridge("127.0.0.1", broker.port, ["sensor/#"], str(spool), lines_per_file=2)
    bridge.start()
    try:
        assert bridge.connected.wait(10), "SUBACK handshake did not complete"
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and bridge.n_messages < 2:
            time.sleep(0.05)
        assert bridge.n_messages == 2
        assert broker.subscribed_topics == ["sensor/#"]
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not list(spool.glob("mqtt_*.txt")):
            time.sleep(0.05)
        files = sorted(spool.glob("mqtt_*.txt"))
        assert files, "no spool file written"
        lines = files[0].read_text().splitlines()
        assert lines == ["sensor/ctd\t$CTD,1,2", "sensor/ctd\t$CTD,3,4"]
    finally:
        bridge.stop()
        broker.close()
    assert broker.got_disconnect  # clean DISCONNECT on stop


@pytest.mark.usefixtures("spark")
def test_mqtt_to_path_end_to_end(spark, tmp_path):
    """ss:addmqtt → streaming path → sink: the full reference shape
    (broker message in, filtered pipeline row out)."""
    from dcafs_spark.engine import Engine

    broker = StubBroker(
        [("t/a", b"$ok,1"), ("t/a", b"nope"), ("t/b", b"$ok,2")]
    )
    eng = Engine(spark)
    spool = tmp_path / "mq"
    reply = eng.command(f"ss:addmqtt,mq1,127.0.0.1:{broker.port},t/#,{spool}")
    assert "Subscribed source 'mq1'" in reply
    try:
        assert eng.bridges["mq1"].connected.wait(10)
        # messages spool as topic\tpayload; keep payloads starting with $
        eng.command(
            'pf:load,<path id="pmq" src="mq1" delimiter="\t">'
            '<filter type="contain">$</filter>'
            '<editor type="rexkeep">\\$.*</editor></path>'
        )
        got: list = []
        eng.add_sink("pmq", lambda df, bid: got.extend(r["value"] for r in df.collect()))
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and eng.bridges["mq1"].n_messages < 3:
            time.sleep(0.05)
        time.sleep(1.1)  # age-based flush cadence
        q = eng.start("pmq")
        try:
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline and len(got) < 2:
                q.processAllAvailable()
                time.sleep(0.1)
        finally:
            eng.stop("pmq")
        assert sorted(got) == ["$ok,1", "$ok,2"]
    finally:
        eng.bridges["mq1"].stop()
        broker.close()


class CollectBroker:
    """Multi-client broker-side collector: CONNACK each client, record
    every PUBLISH (the sink side of the MQTT story)."""

    def __init__(self):
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(16)
        self.port = self.srv.getsockname()[1]
        self.received: list[tuple[str, bytes]] = []
        self.lock = threading.Lock()
        self.clients = 0
        self._stop = False
        self._t = threading.Thread(target=self._accept, daemon=True)
        self._t.start()

    def _accept(self) -> None:
        while not self._stop:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            self.clients += 1
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        from dcafs_spark.sources.mqtt import PUBLISH

        with conn:
            try:
                ptype, _, _ = read_packet(conn)
                assert ptype == CONNECT
                conn.sendall(packet(CONNACK, 0, b"\x00\x00"))
                while True:
                    ptype, _, body = read_packet(conn)
                    if ptype == PUBLISH:
                        with self.lock:
                            self.received.append(parse_publish(body))
                    elif ptype == DISCONNECT:
                        return
            except OSError:
                return

    def close(self) -> None:
        self._stop = True
        try:
            self.srv.close()
        except OSError:
            pass


class TestMqttPushSink:
    def test_batch_publish_fixed_topic(self, spark):
        from dcafs_spark.sinks.mqtt_push import mqtt_push_sink

        broker = CollectBroker()
        try:
            df = spark.createDataFrame([(f"line{i}",) for i in range(20)], "value string").repartition(4)
            mqtt_push_sink("127.0.0.1", broker.port, topic="t/out")(df, 0)
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and len(broker.received) < 20:
                time.sleep(0.05)
            assert len(broker.received) == 20
            assert {t for t, _ in broker.received} == {"t/out"}
            assert {p.decode() for _, p in broker.received} == {f"line{i}" for i in range(20)}
            assert broker.clients >= 1  # per-partition connections, no driver funnel
        finally:
            broker.close()

    def test_per_row_topic_column(self, spark):
        from dcafs_spark.sinks.mqtt_push import mqtt_push_sink

        broker = CollectBroker()
        try:
            df = spark.createDataFrame(
                [("a", "sensors/ctd"), ("b", "sensors/gps")], "value string, topic string"
            )
            mqtt_push_sink("127.0.0.1", broker.port, topic_col="topic")(df, 0)
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and len(broker.received) < 2:
                time.sleep(0.05)
            got = {(t, p.decode()) for t, p in broker.received}
            assert got == {("sensors/ctd", "a"), ("sensors/gps", "b")}
        finally:
            broker.close()

    def test_empty_partitions_do_not_connect(self, spark):
        from dcafs_spark.sinks.mqtt_push import mqtt_push_sink

        broker = CollectBroker()
        try:
            df = spark.createDataFrame([("x",)], "value string").repartition(8)
            mqtt_push_sink("127.0.0.1", broker.port)(df, 0)
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and len(broker.received) < 1:
                time.sleep(0.05)
            assert len(broker.received) == 1
            assert broker.clients == 1  # 7 empty partitions stayed silent
        finally:
            broker.close()


def test_engine_mqtt_send_and_brokers(spark):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    assert eng.command("mqtt:brokers") == "No brokers yet"
    broker = CollectBroker()
    try:
        reply = eng.command(f"mqtt:send,127.0.0.1:{broker.port},t/cmd,hello,world")
        assert reply.startswith("Published to t/cmd")
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline and not broker.received:
            time.sleep(0.05)
        assert broker.received == [("t/cmd", b"hello,world")]
    finally:
        broker.close()
    assert eng.command("mqtt:send,127.0.0.1:notaport,t,x") == "No valid port number: notaport"
    assert "Failed to reach broker" in eng.command("mqtt:send,127.0.0.1:1,t,x")


class SlowChunkBroker(StubBroker):
    """Broker that dribbles one PUBLISH byte-by-byte with a pause
    LONGER than the bridge's 0.25 s poll timeout mid-packet — the
    framing-desync regression: a timeout firing after the fixed
    header byte was consumed must not lose the packet or shift the
    stream."""

    def _serve(self) -> None:  # noqa: D102 — same handshake as StubBroker
        conn, _ = self.srv.accept()
        with conn:
            ptype, _, _body = read_packet(conn)
            assert ptype == CONNECT
            conn.sendall(packet(CONNACK, 0, b"\x00\x00"))
            ptype, _, body = read_packet(conn)
            assert ptype == SUBSCRIBE
            pid = body[:2]
            conn.sendall(packet(SUBACK, 0, pid + b"\x00"))
            pkt = publish_packet("slow/topic", b"dribbled-payload")
            conn.sendall(pkt[:1])          # fixed header byte only
            time.sleep(0.6)                # > bridge poll timeout
            conn.sendall(pkt[1:3])         # varint + first body byte
            time.sleep(0.4)
            conn.sendall(pkt[3:])          # rest
            # immediately follow with a normal packet: desynced framing
            # would misparse it
            conn.sendall(publish_packet("fast/topic", b"after"))
            conn.settimeout(60)
            try:
                while True:
                    ptype, _, _ = read_packet(conn)
                    if ptype == PINGREQ:
                        conn.sendall(packet(PINGRESP, 0, b""))
                    elif ptype == DISCONNECT:
                        self.got_disconnect = True
                        return
            except OSError:
                return


def test_bridge_survives_mid_packet_stall(tmp_path):
    broker = SlowChunkBroker([])
    spool = tmp_path / "slowspool"
    bridge = MqttBridge("127.0.0.1", broker.port, ["#"], str(spool), lines_per_file=1)
    bridge.start()
    try:
        assert bridge.connected.wait(5)
        deadline = time.monotonic() + 10
        while bridge.n_messages < 2 and time.monotonic() < deadline:
            time.sleep(0.1)
        assert bridge.n_messages == 2
        time.sleep(1.2)  # allow age-based flush
        lines = []
        for p in sorted(spool.glob("mqtt_*.txt")):
            lines += p.read_text().splitlines()
        assert "slow/topic\tdribbled-payload" in lines
        assert "fast/topic\tafter" in lines
    finally:
        bridge.stop()
        broker.close()
