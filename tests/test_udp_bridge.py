"""UDP source bridge: datagrams → atomic spool files → engine source
(StreamManager ss:addudp parity; Structured Streaming has no UDP
source, so the file-drop bridge is the ingest edge)."""

from __future__ import annotations

import glob
import socket
import time


def _send(port: int, payloads: list[bytes]) -> None:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for p in payloads:
        s.sendto(p, ("127.0.0.1", port))
    s.close()


def _wait_lines(spool: str, n: int, timeout: float = 10.0) -> list[str]:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        lines = []
        for f in sorted(glob.glob(f"{spool}/udp_*.txt")):
            with open(f, encoding="utf-8") as fh:
                lines += [ln.rstrip("\n") for ln in fh]
        if len(lines) >= n:
            return lines
        time.sleep(0.1)
    raise AssertionError(f"spool never reached {n} lines")


def test_udp_bridge_spools_datagrams(tmp_path):
    from dcafs_spark.sources.udp import UdpBridge

    bridge = UdpBridge(0, str(tmp_path / "spool")).start()
    try:
        _send(bridge.port, [b"$CTD01,1,2,3", b"$CTD01,4,5,6", b"two\nlines"])
        lines = _wait_lines(str(tmp_path / "spool"), 4)
        assert lines[:2] == ["$CTD01,1,2,3", "$CTD01,4,5,6"]
        assert "two" in lines and "lines" in lines
        assert bridge.n_messages == 4
    finally:
        bridge.stop()


def test_no_partial_files_visible(tmp_path):
    from dcafs_spark.sources.udp import UdpBridge

    spool = str(tmp_path / "spool")
    bridge = UdpBridge(0, spool, lines_per_file=1).start()
    try:
        _send(bridge.port, [b"a", b"b", b"c"])
        _wait_lines(spool, 3)
        assert not glob.glob(f"{spool}/.udp_*.tmp")
    finally:
        bridge.stop()


def test_engine_addudp_verb(spark, tmp_path):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    spool = str(tmp_path / "sp")
    reply = eng.command(f"ss:addudp,u1,0,{spool}")
    assert reply.startswith("Listening on udp:")
    port = eng.bridges["u1"].port
    assert port > 0
    assert eng.sources["u1"]["kind"] == "text"
    _send(port, [b"hello"])
    _wait_lines(spool, 1)
    assert eng.command("ss:addudp,u2,notaport") == "No valid port number: notaport"
    eng.bridges["u1"].stop()
