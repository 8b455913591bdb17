"""Taskmanager-script XML loader (reference <tasklist> grammar,
TaskManager.java:1124-1212 + manual 'Creating a script')."""

from __future__ import annotations

import time


XML = """
<tasklist>
  <tasksets>
    <taskset name="Startup sequence" id="boot" run="step" failure="onfail">
      <task output="log:info" trigger="delay:1s">booting @localtime</task>
      <task output="system">issue:add,ok,Booted fine</task>
    </taskset>
    <taskset id="onfail" run="oneshot">
      <task output="log:error">boot failed</task>
    </taskset>
  </tasksets>
  <tasks>
    <task id="hello" output="system" trigger="interval:10s,5s">admin:clock</task>
    <task id="warn" output="email:admin" req="gps_hdop above 4">High HDOP;value is {r:gps_hdop}</task>
    <task id="linked" output="log:info" link="skipone,hello">linking</task>
    <task id="towire" output="stream:ctd" trigger="delay:1s">init</task>
  </tasks>
</tasklist>
"""


def _engine(spark):
    from dcafs_spark.engine import Engine

    return Engine(spark)


def test_load_counts_and_shapes(spark):
    eng = _engine(spark)
    reply = eng.command(f"tm:load,{XML}")
    assert reply == "Loaded 4 task(s) and 2 taskset(s)"
    assert set(eng.tasks.tasksets) == {"boot", "onfail"}
    hello = eng.tasks.tasks["hello"]
    assert hello.trigger == "interval"
    assert hello.initial_delay_s == 10.0 and hello.interval_s == 5.0
    assert eng.tasks.tasksets["boot"].run_type == "step"
    assert eng.tasks.tasksets["boot"].failure_set == "onfail"
    linked = eng.tasks.tasks["linked"]
    assert linked.linktype == "skipone" and linked.link == "hello"


def test_system_task_dispatches_command(spark):
    eng = _engine(spark)
    eng.command(f"tm:load,{XML}")
    assert eng.command("tm:run,boot")  # step set: log then issue:add
    assert any("booting" in ln for ln in eng._infolog)
    assert "ok" in eng.command("issue:list")


def test_req_gates_email_task(spark):
    from dcafs_spark.streaming.values_store import _KeyState

    eng = _engine(spark)
    eng.command(f"tm:load,{XML}")
    sent = []
    eng.email_sender = lambda to, subject, body: sent.append((to, subject, body))
    warn = eng.tasks.tasks["warn"]
    assert not eng.tasks.fire(warn)  # no value yet -> check fails
    eng.store.state[("gps", "hdop")] = _KeyState(last=6.5)
    assert eng.tasks.fire(warn)
    assert sent == [("admin", "High HDOP", "value is 6.5")]


def test_stream_output_routes_to_writer(spark):
    eng = _engine(spark)
    eng.command(f"tm:load,{XML}")
    wire = []
    eng.stream_writers["ctd"] = wire.append
    assert eng.tasks.fire(eng.tasks.tasks["towire"])
    assert wire == ["init"]


def test_macros_render(spark):
    from dcafs_spark.scheduler import _task_macros

    out = _task_macros("at @localtime on @utcstamp")
    assert "@localtime" not in out and "@utcstamp" not in out
    assert len(out.split(" on ")[1].split(" ")) == 2  # dd/mm/yy HH:MM:SS


def test_bad_script_is_text_reply(spark):
    eng = _engine(spark)
    assert eng.command("tm:load,<nope/>").startswith("Failed to load script")


def test_new_output_transports(spark):
    """mqtt/telnet/sms/matrix task outputs (Task.java:69 output list)."""
    import socket

    from dcafs_spark.telnet import TelnetServer

    eng = _engine(spark)
    sent: dict[str, list] = {"sms": [], "matrix": []}
    eng.sms_sender = lambda to, text: sent["sms"].append((to, text))
    eng.matrix_sender = lambda to, text: sent["matrix"].append((to, text))

    srv = TelnetServer(eng)
    host, port = srv.start()
    cli = socket.create_connection((host, port), timeout=5)
    cli.settimeout(5)
    time.sleep(0.2)
    cli.recv(4096)  # greeting

    xml = """
    <tasklist><tasks>
      <task id="s" output="sms:+321">alarm {r:missing|n/a}</task>
      <task id="m" output="matrix:#room">deploy done</task>
      <task id="t" output="telnet">hello sessions</task>
    </tasks></tasklist>
    """
    assert eng.command(f"tm:load,{xml}").startswith("Loaded 3 task")
    for tid in ("s", "m", "t"):
        eng.tasks.fire(eng.tasks.tasks[tid])
    assert sent["sms"] and sent["sms"][0][0] == "+321"
    assert sent["matrix"] == [("#room", "deploy done")]
    buf = b""
    while b"hello sessions" not in buf:
        buf += cli.recv(4096)
    cli.close()
    srv.stop()


def test_mqtt_output_delegates_to_command(spark):
    eng = _engine(spark)
    calls: list[str] = []
    orig = eng.command
    eng.command = lambda s: calls.append(s) or "OK" if s.startswith("mqtt:") else orig(s)
    xml = """<tasklist><tasks>
      <task id="pub" output="mqtt:localhost:1883,sensors/a">42.5</task>
    </tasks></tasklist>"""
    assert orig(f"tm:load,{xml}").startswith("Loaded 1 task")
    eng.tasks.fire(eng.tasks.tasks["pub"])
    assert calls == ["mqtt:send,localhost:1883,sensors/a,42.5"]
