"""Minimal MQTT 3.1.1 subscribe bridge — broker → file-drop source.

Parity target: reference `src/io/mqtt/MqttWorker.java:163-168` — a
worker subscribes to topics on a broker and turns each received message
into a Datagram for the pipeline. Spark has no built-in MQTT source and
this sandbox ships no connector jar, so the bridge is a pure-python
MQTT 3.1.1 client (public OASIS wire format: CONNECT/CONNACK,
SUBSCRIBE/SUBACK, PUBLISH, PING) that spools received messages as
`topic<TAB>payload` lines into a directory — exactly the file-drop
shape `build_source({"kind": "text"})` already streams. The Spark side
stays declarative; only the network edge is imperative, like the
reference's paho worker thread.

Scale note: one bridge = one broker subscription feeding a spool the
whole cluster reads. For high-rate brokers run several bridges on
disjoint topic filters (same pattern as multiple reference workers);
the streaming read itself scales with files, not with this thread.

Wire-format helpers are module-level so tests can speak broker-side
with the same primitives (mirroring test_outputs.py's in-process SMTP/
HTTP peers).
"""

from __future__ import annotations

import os
import socket
import threading
import time

# packet types (MQTT 3.1.1 §2.2.1)
CONNECT, CONNACK, PUBLISH, SUBSCRIBE, SUBACK = 1, 2, 3, 8, 9
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


def encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def decode_varint(read) -> int:
    mult, val = 1, 0
    while True:
        (b,) = read(1)
        val += (b & 0x7F) * mult
        if not b & 0x80:
            return val
        mult *= 128


def _str16(s: str) -> bytes:
    raw = s.encode()
    return len(raw).to_bytes(2, "big") + raw


def packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + encode_varint(len(body)) + body


def connect_packet(client_id: str, keepalive_s: int = 60) -> bytes:
    body = _str16("MQTT") + bytes([4, 0x02]) + keepalive_s.to_bytes(2, "big")
    return packet(CONNECT, 0, body + _str16(client_id))


def subscribe_packet(packet_id: int, topics: list[str]) -> bytes:
    body = packet_id.to_bytes(2, "big")
    for t in topics:
        body += _str16(t) + b"\x00"  # QoS 0 — the reference's default
    return packet(SUBSCRIBE, 0x02, body)


def publish_packet(topic: str, payload: bytes) -> bytes:
    return packet(PUBLISH, 0, _str16(topic) + payload)


def read_packet(sock: socket.socket, first: bytes | None = None) -> tuple[int, int, bytes]:
    """(type, flags, body) of the next packet; raises OSError on EOF.

    `first` hands in an already-received fixed-header byte — the
    poll-loop reads byte one under a short timeout and the REMAINDER
    of the packet under the full timeout, so a timeout can only ever
    fire on a packet boundary (a mid-packet timeout after consuming
    bytes would silently desync the framing)."""

    def _read(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise OSError("connection closed")
            buf += chunk
        return buf

    b0 = first[0] if first else _read(1)[0]
    length = decode_varint(_read)
    return b0 >> 4, b0 & 0x0F, _read(length) if length else b""


def parse_publish(body: bytes) -> tuple[str, bytes]:
    tlen = int.from_bytes(body[:2], "big")
    return body[2 : 2 + tlen].decode(), body[2 + tlen :]


class MqttBridge:
    """Subscribe to topics, spool messages into `spool_dir` for a
    text file-drop stream (`ss:addmqtt` wires one up)."""

    def __init__(
        self,
        host: str,
        port: int,
        topics: list[str],
        spool_dir: str,
        client_id: str = "dcafs_spark",
        lines_per_file: int = 2048,
        timeout_s: float = 10.0,
    ):
        self.host, self.port = host, port
        self.topics = topics
        self.spool_dir = spool_dir
        self.client_id = client_id
        self.lines_per_file = lines_per_file
        self.timeout_s = timeout_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._sock: socket.socket | None = None
        self.connected = threading.Event()  # set after SUBACK
        self.n_messages = 0

    # ---------------------------------------------------------- lifecycle
    def start(self) -> "MqttBridge":
        os.makedirs(self.spool_dir, exist_ok=True)
        self._thread = threading.Thread(target=self._run, daemon=True, name="mqtt-bridge")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._sock is not None:
            try:
                self._sock.sendall(packet(DISCONNECT, 0, b""))
            except OSError:
                pass
            try:
                self._sock.close()
            except OSError:
                pass
        if self._thread is not None:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------- client
    def _run(self) -> None:
        try:
            sock = socket.create_connection((self.host, self.port), timeout=self.timeout_s)
            self._sock = sock
            sock.sendall(connect_packet(self.client_id))
            ptype, _, _ = read_packet(sock)
            if ptype != CONNACK:
                raise OSError(f"expected CONNACK, got type {ptype}")
            sock.sendall(subscribe_packet(1, self.topics))
            ptype, _, _ = read_packet(sock)
            if ptype != SUBACK:
                raise OSError(f"expected SUBACK, got type {ptype}")
            self.connected.set()
            self._pump(sock)
        except OSError:
            if not self._stop.is_set():
                raise

    def _pump(self, sock: socket.socket) -> None:
        buf: list[str] = []
        seq = 0
        last_flush = time.monotonic()
        last_ping = time.monotonic()
        # short poll so age-based flushes and keepalive pings happen even
        # while the broker is idle. ONLY the first header byte is read
        # under the poll timeout; once a packet has begun, the rest is
        # read under the full timeout — a 0.25 s timeout firing inside a
        # half-received packet (slow/chunking broker) would otherwise
        # discard the consumed bytes and desync the framing.
        sock.settimeout(0.25)
        while not self._stop.is_set():
            try:
                b0 = sock.recv(1)
            except TimeoutError:
                ptype = None
            else:
                if not b0:
                    break  # EOF
                sock.settimeout(self.timeout_s)
                try:
                    ptype, _flags, body = read_packet(sock, first=b0)
                finally:
                    sock.settimeout(0.25)
            now = time.monotonic()
            if ptype == PUBLISH:
                topic, payload = parse_publish(body)
                buf.append(f"{topic}\t{payload.decode(errors='replace')}")
                self.n_messages += 1
            elif ptype == PINGRESP:
                pass
            elif ptype == DISCONNECT:
                break
            if ptype is None and now - last_ping >= 5.0:
                sock.sendall(packet(PINGREQ, 0, b""))
                last_ping = now
            # flush on size or ~1s age: mirrors the file-drop cadence the
            # text source polls (a half-written file must never be seen,
            # so write tmp + atomic rename)
            if buf and (len(buf) >= self.lines_per_file or now - last_flush >= 1.0):
                seq = self._flush(buf, seq)
                buf, last_flush = [], now
        if buf:
            self._flush(buf, seq)

    def _flush(self, lines: list[str], seq: int) -> int:
        tmp = os.path.join(self.spool_dir, f".mqtt_{seq:08d}.tmp")
        dst = os.path.join(self.spool_dir, f"mqtt_{seq:08d}.txt")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, dst)
        return seq + 1
