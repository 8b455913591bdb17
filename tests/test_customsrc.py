"""Interval custom sources (PathForward CustomSrc parity): plain /
cmd / rtvals-template / sqlite-replay ticks spooled for the text
source."""

from __future__ import annotations

import glob
import time


def _wait_lines(spool: str, n: int, timeout: float = 10.0) -> list[str]:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        lines = []
        for f in sorted(glob.glob(f"{spool}/*.txt")):
            with open(f, encoding="utf-8") as fh:
                lines += [ln.rstrip("\n") for ln in fh]
        if len(lines) >= n:
            return lines
    raise AssertionError(f"spool never reached {n} lines")


def test_plain_source_ticks(spark):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    reply = eng.command("ss:addplain,p1,100ms,$HELLO,world")
    assert reply.startswith("Added plain source 'p1'")
    spool = eng.sources["p1"]["path"]
    lines = _wait_lines(spool, 3)
    assert all(ln == "$HELLO,world" for ln in lines)  # commas survive re-join
    eng.bridges["p1"].stop()


def test_rtvals_template_source(spark):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    eng.store.texts[("gps", "mode")] = "rtk"
    from dcafs_spark.streaming.values_store import _KeyState

    eng.store.state[("gps", "hdop")] = _KeyState(last=1.5)
    eng.command("ss:addrtvals,r1,100ms,mode={t:gps_mode} hdop={r:gps_hdop}")
    lines = _wait_lines(eng.sources["r1"]["path"], 1)
    assert lines[0] == "mode=rtk hdop=1.5"
    eng.bridges["r1"].stop()


def test_cmd_source_replays_command_output(spark):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    eng.command("issue:add,leak,Water detected")
    eng.command("ss:addcmd,c1,100ms,issue:list")
    lines = _wait_lines(eng.sources["c1"]["path"], 1)
    assert "leak" in lines[0]
    eng.bridges["c1"].stop()


def test_sqlite_source_read_once(spark, tmp_path):
    import sqlite3

    from dcafs_spark.engine import Engine

    db = str(tmp_path / "src.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE obs(id INTEGER, val REAL)")
    con.executemany("INSERT INTO obs VALUES (?, ?)", [(i, i * 1.5) for i in range(5)])
    con.commit()
    con.close()

    eng = Engine(spark)
    eng.command(f"ss:addsqlitesrc,s1,100ms,{db},SELECT id, val FROM obs ORDER BY id")
    lines = _wait_lines(eng.sources["s1"]["path"], 5)
    assert lines[0] == "0,0.0" and lines[4] == "4,6.0"
    # read-once: ticker stops after exhausting the result set
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and not eng.bridges["s1"].exhausted:
        time.sleep(0.1)
    assert eng.bridges["s1"].exhausted


def test_bad_interval_is_text_reply(spark):
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    assert eng.command("ss:addplain,x1,nope,data") == "No valid interval: nope"


def test_xml_customsrc_binds_and_streams(spark):
    """<customsrc> element → interval spool → full streaming path
    (PathForward.java:127-133 XML grammar)."""
    from dcafs_spark.engine import Engine

    eng = Engine(spark)
    xml = """
    <path id="cs1" delimiter=",">
      <customsrc type="plain" interval="100ms">$CS,1,2</customsrc>
      <filter type="start">$CS</filter>
    </path>
    """
    assert "loaded 1 path" in eng.command(f"pf:load,{xml}")
    seen = []
    eng.add_sink("cs1", lambda df, bid: seen.extend(r["value"] for r in df.collect()))
    q = eng.start("cs1")
    try:
        # let the ticker produce a few files, then stop it so
        # processAllAvailable can drain (it never settles while new
        # spool files keep arriving every 100ms)
        spool = eng.sources["cs1_csrc"]["path"]
        _wait_lines(spool, 2)
        eng.bridges["cs1_csrc"].stop()
        q.processAllAvailable()
    finally:
        eng.stop("cs1")
        eng.bridges["cs1_csrc"].stop()
    assert len(seen) >= 2 and all(v == "$CS,1,2" for v in seen)
