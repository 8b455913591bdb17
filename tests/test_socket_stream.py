"""In-process TCP socket end-to-end (round-2/3 carry item).

A real localhost TCP server feeds Spark's socket streaming source
through an XML-configured path (settings.xml grammar → PathSpec →
compiled narrow steps) into the driver-side values store, with a
comparison trigger rule asserting hysteresis across micro-batches.
No external services: the server is a thread in this process, so this
covers the reference's stream→forward→store main loop (SURVEY §3.1,
`src/io/stream/StreamManager.java` TCP path) end to end.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest

from dcafs_spark.plans.xmlconfig import load_paths
from dcafs_spark.streaming import StreamingPath, TriggerRule, ValuesStore

PATH_XML = """
<path id="sock_ctd" delimiter=",">
  <filter><rule type="start">$CTD</rule><rule type="minitems">3</rule></filter>
  <generic keep="origin,ts">
    <text index="0">station</text>
    <real index="2">temp</real>
  </generic>
</path>
"""


class _LineServer(threading.Thread):
    """One-client TCP line server; push() sends lines to the client."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.conn = None
        self._ready = threading.Event()

    def run(self):
        try:
            self.conn, _ = self.srv.accept()
            self._ready.set()
        except OSError:
            pass

    def push(self, *lines: str) -> None:
        assert self._ready.wait(30), "spark socket source never connected"
        self.conn.sendall(("".join(f"{x}\n" for x in lines)).encode())

    def close(self):
        for s in (self.conn, self.srv):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


def test_socket_xml_path_store_triggers(spark):
    server = _LineServer()
    server.start()

    spec = load_paths(PATH_XML)["sock_ctd"]
    fired: list = []
    store = ValuesStore(history_n=8)
    store.add_rule(
        TriggerRule(
            group="sock1",
            name="$CTD01",
            kind="comparison",
            comparison="above 20",
            cmd=lambda g, n, v: fired.append(v),
        )
    )
    rows: list = []
    sp = StreamingPath(
        spark,
        source={"kind": "socket", "host": "127.0.0.1", "port": server.port, "id": "sock1"},
        path=spec,
        store=store,
        # socket ts is per-batch current_timestamp (ties within a batch);
        # ordering falls back to the monotone temp channel
        store_cols={"group": "origin", "name": "station", "value": "temp", "ts": "temp"},
        sinks=[lambda df, bid: rows.extend(df.collect())],
    )
    q = sp.start("t_socket")

    def drain_until(n_updates: int):
        deadline = time.monotonic() + 60
        key = ("sock1", "$CTD01")
        while time.monotonic() < deadline:
            q.processAllAvailable()
            st = store.state.get(key)
            if st is not None and st.count >= n_updates:
                return
            time.sleep(0.2)
        raise AssertionError(f"store never reached {n_updates} updates")

    try:
        # batch 1: below then above threshold -> one fire at 25.5
        server.push("$CTD01,t1,15.0,x", "$CTD01,t2,25.5,x", "noise,skip,me")
        drain_until(2)
        # batch 2: drops below -> trigger re-arms, no fire
        server.push("$CTD01,t3,18.0,x")
        drain_until(3)
        # batch 3: crosses again -> second fire at 30.25
        server.push("$CTD01,t4,30.25,x")
        drain_until(4)
    finally:
        q.stop()
        q.awaitTermination(10)
        server.close()

    assert fired == [25.5, 30.25]
    st = store.state[("sock1", "$CTD01")]
    assert st.count == 4
    assert st.last == pytest.approx(30.25)
    assert st.min == pytest.approx(15.0)
    assert st.max == pytest.approx(30.25)
    # the filter dropped the noise line; 4 good rows reached the sink
    assert len(rows) == 4
    assert {r["station"] for r in rows} == {"$CTD01"}
