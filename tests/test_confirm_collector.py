"""ConfirmCollector semantics (sinks/confirm.py) — pure driver-side,
no Spark. Parity target: reference ConfirmCollector.java retry /
fire-and-forget behavior."""

from __future__ import annotations

from dcafs_spark.sinks.confirm import ConfirmCollector


def _mk(reply_log, results, t):
    return ConfirmCollector(
        id="c1",
        target=reply_log.append,
        max_attempts=3,
        timeout_seconds=1.0,
        clock=lambda: t["now"],
        on_result=[lambda m, ok: results.append((m, ok))],
    )


def test_confirmed_handshake_pops_and_sends_next():
    sent, results, t = [], [], {"now": 0.0}
    c = _mk(sent, results, t)
    c.add_confirms(["a", "b"], reply="ok **")
    assert sent == ["a"]
    assert c.add_data("OK A")  # case-insensitive match pops head
    assert sent == ["a", "b"]
    assert results == [("a", True)]
    assert not c.add_data("ok b")  # queue drained → False (detach)
    assert results == [("a", True), ("b", True)]
    assert c.is_empty() and c.failed == []


def test_fire_and_forget_released_by_timeout_not_data():
    sent, results, t = [], [], {"now": 0.0}
    c = _mk(sent, results, t)
    c.add_confirms(["x", "y"], reply="")
    assert sent == ["x"]
    # a blank keepalive line must NOT acknowledge a fire-and-forget head
    c.add_data("   ")
    assert c.pending == ["x", "y"] and results == []
    # the timeout tick IS the release: pop, report ok, send successor
    t["now"] = 1.5
    c.check_timeout()
    assert sent == ["x", "y"]
    assert results == [("x", True)]
    t["now"] = 3.0
    c.check_timeout()
    assert results == [("x", True), ("y", True)]
    assert c.is_empty() and c.failed == []


def test_retry_then_drain_reports_every_queued_message():
    sent, results, t = [], [], {"now": 0.0}
    c = _mk(sent, results, t)
    c.add_confirms(["a", "b", "c"], reply="ack")
    # never acknowledged: resend until max_attempts=3, then drain
    for i in range(1, 5):
        t["now"] = i * 1.1
        c.check_timeout()
    assert sent == ["a", "a", "a"]  # 1 initial + 2 resends
    # head failed AND unsent successors each got a failure callback
    assert results == [("a", False), ("b", False), ("c", False)]
    assert c.failed == ["a", "b", "c"]
    assert c.is_empty()


def test_rollover_count_buckets_by_multiple(spark, tmp_path):
    """fc 'every 30 min' rollover: rows at :00/:25/:35 land in two
    30-minute partitions (the count was previously dropped and every
    row got its own minute/hour bucket)."""
    from dcafs_spark.sinks.file_collector import FileCollector

    df = spark.createDataFrame(
        [
            ("a", "2026-01-01 10:00:00"),
            ("b", "2026-01-01 10:25:00"),
            ("c", "2026-01-01 10:35:00"),
        ],
        "value string, ts string",
    ).selectExpr("value", "cast(ts as timestamp) as ts")
    fc = FileCollector(str(tmp_path / "out"), rollover="min", rollover_count=30)
    out, parts = fc._prepare(df)
    got = {r["rollover"] for r in out.select("rollover").collect()}
    assert parts == ["rollover"]
    assert got == {"2026-01-01T10.00", "2026-01-01T10.30"}
