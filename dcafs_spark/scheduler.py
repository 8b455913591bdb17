"""Task engine: scheduled / conditional commands over the values store.

Parity target: reference `src/util/task/TaskManager.java` + `Task.java`
— tasks fire on INTERVAL (+ initial delay), CLOCK (time-of-day +
weekday set), KEYWORD (a matching record arrived), or as part of a
TaskSet (oneshot = all at once; step = sequential, stop + run the
failure set on error — `TaskManager.java:511-546`). A task's
`req`/`check` gates execution on a boolean expression over rtvals
(`Task.java:104-161`), with RETRY/WHILE/WAITFOR re-scheduling.

Spark-side design (SURVEY §3.3): this runs in the SAME process as the
Structured Streaming driver. Checks evaluate against the
ValuesStore's in-memory state (KEYWORD triggers are fed from
`foreachBatch` via `on_keyword`), so no extra cluster work happens
unless a task's action itself runs a query. Time math is pure
stdlib — deliberately no extra dependency.
"""

from __future__ import annotations

import re
import threading
import time as _time
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Any, Callable

from dcafs_spark.functions.compare import compile_compare_py
from dcafs_spark.streaming.values_store import ValuesStore

_RT_REF = re.compile(r"\{(r|i|f|t):([^}]+)\}")
_UTC_REF = re.compile(r"\{utc(?::([^}]+))?\}")

_WEEKDAYS = {"mo": 0, "tu": 1, "we": 2, "th": 3, "fr": 4, "sa": 5, "su": 6}


def render_template(text: str, store: ValuesStore | None, now: datetime | None = None) -> str:
    """Fill `{r:group_name}` value refs and `{utc:fmt}` time refs
    (reference ValTools.parseRTline; CHANGELOG 1.2.8)."""

    def _rt(m: re.Match) -> str:
        if store is None:
            return m.group(0)
        ref = m.group(2)
        group, _, name = ref.partition("_")
        if m.group(1) == "t":  # {t:...} reads the TextVal store
            t = store.get_text(group, name)
            return m.group(0) if t is None else t
        v = store.get(group, name)
        return m.group(0) if v is None else f"{v:g}"

    def _utc(m: re.Match) -> str:
        dt = now or datetime.now(timezone.utc)
        fmt = m.group(1)
        return dt.isoformat() if fmt is None else dt.strftime(fmt)

    return _UTC_REF.sub(_utc, _RT_REF.sub(_rt, text))


@dataclass
class Check:
    """`req` expression over a stored value: fires only when true."""

    group: str
    name: str
    comparison: str

    def __post_init__(self):
        self._fn = compile_compare_py(self.comparison)

    def passes(self, store: ValuesStore) -> bool:
        v = store.get(self.group, self.name)
        return v is not None and self._fn(v)


@dataclass
class Task:
    id: str
    action: Callable[[str], Any]  # receives the rendered command text
    value: str = ""  # command/output template
    trigger: str = "execute"  # interval | clock | keyword | delay | execute
    interval_s: float | None = None
    initial_delay_s: float = 0.0
    clock: str | None = None  # "HH:MM" (UTC unless clock_local)
    clock_local: bool = False  # localtime: triggers compare local wall-clock
    days: str | None = None  # "mo,tu,we" (None = all)
    keyword: str | None = None
    check: Check | None = None
    retries: int = 0  # RETRY: re-run while check fails, up to N times
    # WHILE/WAITFOR (Task.java:311-326): N check-passes needed before a
    # step taskset may advance past this gate task
    runs: int = 1
    # link to other task(s) applied after a successful run
    # (Task.java:74-78,221-230): linktype ∈ disable24h | nottoday |
    # donow | skipone, link = ';'-separated task ids
    link: str | None = None
    linktype: str = "none"
    # runtime
    last_fire: float | None = None
    fire_count: int = 0
    do_today: bool = True  # cleared by disable24h/nottoday links
    skip_executions: int = 0  # set by skipone links
    disabled_until: datetime | None = None  # UTC re-enable time


@dataclass
class TaskSet:
    id: str
    run_type: str  # oneshot | step
    tasks: list[Task]
    failure_set: str | None = None  # TaskManager.java:511-546


class TaskManager:
    """Driver-side scheduler loop + keyword dispatch."""

    def __init__(self, store: ValuesStore | None = None, tick_s: float = 0.1):
        self.store = store or ValuesStore()
        self.tasks: dict[str, Task] = {}
        self.tasksets: dict[str, TaskSet] = {}
        self.tick_s = tick_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.log: list[tuple[str, str]] = []
        self._firing: set[str] = set()  # donow-cycle guard (A->B->A links)
        # safety bound for WAITFOR polling (None = reference behavior:
        # poll forever); WHILE is naturally bounded by its first failure
        self.max_gate_wait_s: float | None = 30.0
        # injectable UTC clock so link-expiry (24h / midnight) is testable
        self.now_utc: Callable[[], datetime] = lambda: datetime.now(timezone.utc)

    def add_task(self, task: Task) -> None:
        self.tasks[task.id] = task

    def add_taskset(self, ts: TaskSet) -> None:
        self.tasksets[ts.id] = ts
        for t in ts.tasks:
            self.tasks.setdefault(t.id, t)

    # ------------------------------------------------------------ firing
    def _gate(self, task: Task) -> bool:
        return task.check is None or task.check.passes(self.store)

    def _link_gate(self, task: Task) -> bool:
        """Gate on link state (TaskManager.java:579-580): skip while a
        skipone is pending or the task is disabled for today; the skip
        counter burns down on the skipped attempt (:835-836)."""
        if task.disabled_until is not None and self.now_utc() >= task.disabled_until:
            task.do_today = True
            task.disabled_until = None
        if task.skip_executions > 0:
            task.skip_executions -= 1
            self.log.append((task.id, "skipped"))
            return False
        if not task.do_today:
            self.log.append((task.id, "not_today"))
            return False
        return True

    def _apply_links(self, task: Task) -> None:
        """After a successful run, apply the task's link to each linked
        task (TaskManager.java:796-818)."""
        if task.link is None or task.linktype == "none":
            return
        now = self.now_utc()
        for linked_id in task.link.split(";"):
            t = self.tasks.get(linked_id.strip())
            if t is None:
                continue
            if task.linktype == "disable24h":
                t.do_today = False
                t.disabled_until = now + timedelta(hours=24)
            elif task.linktype == "nottoday":
                t.do_today = False
                t.disabled_until = (now + timedelta(days=1)).replace(
                    hour=0, minute=0, second=0, microsecond=0
                )
            elif task.linktype == "donow":
                self.fire(t)
            elif task.linktype == "skipone":
                t.skip_executions = 1

    def fire(self, task: Task) -> bool:
        """Evaluate link gate + check; run action on pass. Returns success.

        A task already firing in the current link chain is skipped:
        mutually-donow-linked tasks (A->B->A) would otherwise recurse
        without bound — each fires once per chain instead."""
        if task.id in self._firing:
            self.log.append((task.id, "link_cycle_skipped"))
            return False
        if not self._link_gate(task):
            return False
        attempts = task.retries + 1
        for i in range(attempts):
            if self._gate(task):
                text = render_template(task.value, self.store)
                # actions report transport failure by returning False
                # (dropped email/stream sends): that must COUNT as a
                # failed step — a step taskset's failure_set is defined
                # as running "on error", and swallowing the result made
                # it dead code for exactly the errors it exists for.
                # None (no status) stays success.
                if task.action(text) is False:
                    self.log.append((task.id, "action_failed"))
                    return False
                task.last_fire = _time.monotonic()
                task.fire_count += 1
                self.log.append((task.id, "fired"))
                self._firing.add(task.id)
                try:
                    self._apply_links(task)
                finally:
                    self._firing.discard(task.id)
                return True
            if i < attempts - 1:
                # RETRY semantics: wait the task's configured interval
                # between attempts (retry:10s,5 = five tries over 50 s)
                # — the scheduler tick is only the fallback for tasks
                # without one (the value being waited on needs time to
                # arrive; _run_gate_task already slept interval_s)
                _time.sleep(task.interval_s or self.tick_s)
        self.log.append((task.id, "check_failed"))
        return False

    def _run_gate_task(self, task: Task) -> bool:
        """WHILE / WAITFOR flow gates inside a step taskset
        (TaskManager.java:493-518 + :586-589 — a gate task executes no
        output, it only evaluates its check every `interval_s`):

        * ``while``   — the check must pass `runs` times, re-evaluated
          each interval; the FIRST failing check cancels the gate (the
          surrounding step set then stops / runs its failure set).
        * ``waitfor`` — poll until `runs` CONSECUTIVE passes; a failing
          check just resets the streak (:515-517) and polling continues,
          bounded by `max_gate_wait_s` (the reference polls forever —
          the bound exists so a dead value can't hang the driver)."""
        need = max(task.runs, 1)
        passes = 0
        deadline = (
            None
            if self.max_gate_wait_s is None
            else _time.monotonic() + self.max_gate_wait_s
        )
        while True:
            if self._gate(task):
                passes += 1
                task.fire_count += 1
                self.log.append((task.id, "gate_pass"))
                if passes >= need:
                    self.log.append((task.id, "gate_done"))
                    return True
            elif task.trigger == "while":
                self.log.append((task.id, "gate_failed"))
                return False
            else:
                passes = 0
                self.log.append((task.id, "gate_reset"))
            if deadline is not None and _time.monotonic() >= deadline:
                self.log.append((task.id, "gate_timeout"))
                return False
            _time.sleep(task.interval_s if task.interval_s is not None else self.tick_s)

    def run_taskset(self, set_id: str) -> bool:
        """oneshot: fire all (failures don't stop); step: sequential,
        stop at first failure and run the linked failure set. Failure
        sets that (transitively) name an already-running set are
        skipped — S-fails→F-fails→S would otherwise recurse forever."""
        key = f"set:{set_id}"  # namespaced: a task and set may share an id
        if key in self._firing:
            self.log.append((set_id, "link_cycle_skipped"))
            return False
        ts = self.tasksets[set_id]
        ok_all = True
        self._firing.add(key)
        try:
            for t in ts.tasks:
                if t.trigger in ("while", "waitfor"):
                    ok = self._run_gate_task(t)
                else:
                    ok = self.fire(t)
                ok_all = ok_all and ok
                if not ok and ts.run_type == "step":
                    self.log.append((set_id, "step_failed"))
                    if ts.failure_set and ts.failure_set in self.tasksets:
                        self.run_taskset(ts.failure_set)
                    return False
        finally:
            self._firing.discard(key)
        return ok_all

    def on_keyword(self, line: str) -> int:
        """KEYWORD trigger feed — call from foreachBatch with matched
        lines (TaskManager.startKeywordTask:201-208). Returns #fired."""
        n = 0
        for t in self.tasks.values():
            if t.trigger == "keyword" and t.keyword and t.keyword in line:
                if self.fire(t):
                    n += 1
        return n

    # --------------------------------------------------------- scheduling
    def _due(self, task: Task, now_mono: float, now_utc: datetime) -> bool:
        if task.trigger == "interval":
            if task.last_fire is None:
                return now_mono >= self._t0 + task.initial_delay_s
            return now_mono - task.last_fire >= (task.interval_s or 0)
        if task.trigger == "clock" and task.clock:
            # localtime: compares the host's wall clock (a 07:15 task
            # must fire at 07:15 local, not 07:15 UTC — and weekday
            # gating must use the local date near midnight); utctime:
            # and bare time: stay UTC
            now_wall = now_utc.astimezone() if task.clock_local else now_utc
            if task.days:
                allowed = {_WEEKDAYS[d.strip()[:2].lower()] for d in task.days.split(",")}
                if now_wall.weekday() not in allowed:
                    return False
            hh, mm = task.clock.split(":")
            target = now_wall.replace(hour=int(hh), minute=int(mm), second=0, microsecond=0)
            due = abs((now_wall - target).total_seconds()) < max(self.tick_s, 1.0)
            recently = task.last_fire is not None and now_mono - task.last_fire < 120
            return due and not recently
        if task.trigger == "delay":
            return task.last_fire is None and now_mono >= self._t0 + task.initial_delay_s
        return False

    def start(self) -> None:
        self._t0 = _time.monotonic()
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                now = _time.monotonic()
                now_utc = datetime.now(timezone.utc)
                for t in list(self.tasks.values()):
                    if t.trigger in ("interval", "clock", "delay") and self._due(t, now, now_utc):
                        self.fire(t)
                _time.sleep(self.tick_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)


_PERIOD = re.compile(r"(\d+)\s*(ms|s|m|h|d)")
_PERIOD_S = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def parse_period_s(text: str) -> float:
    """'5m3s' / '10s' / '250ms' → seconds (TimeTools.parsePeriodString
    shapes; a bare number is seconds)."""
    text = text.strip().lower()
    if not text:
        raise ValueError("empty period")
    if text.isdigit():
        return float(text)
    total, matched = 0.0, 0
    for m in _PERIOD.finditer(text):
        total += int(m.group(1)) * _PERIOD_S[m.group(2)]
        # the pattern consumes '5 m' including the space; compare both
        # sides space-stripped or the whitespace the regex accepts
        # would fail the full-coverage check
        matched += len(m.group(0).replace(" ", ""))
    if matched != len(text.replace(" ", "")):
        raise ValueError(f"unparsable period: {text!r}")
    return total


def parse_trigger(spec: str) -> dict[str, Any]:
    """Reference trigger grammar (`Task.java:288-355`) → Task kwargs.

    ``time:07:15,thursday`` / ``utctime:``/``localtime:`` → clock (+days),
    ``retry:10s,5`` → interval+retries, ``while:10s,2`` / ``waitfor:10s,1``
    → gate task, ``delay:5m3s``, ``interval:10s[,5m3s]`` (delay,interval),
    anything else → keyword. ``;``→``,`` and ``=``→``:`` normalization
    matches the reference's lenient parsing."""
    spec = spec.strip().replace(";", ",").replace("=", ":")
    low = spec.lower()
    if not low:
        return {"trigger": "execute"}
    cmd, sep, rest = low.partition(":")
    if not sep:
        return {"trigger": "keyword", "keyword": spec}
    items = rest.split(",")
    if cmd in ("time", "utctime", "localtime"):
        out: dict[str, Any] = {"trigger": "clock", "clock": items[0][:5]}
        if cmd == "localtime":
            out["clock_local"] = True
        if len(items) > 1 and items[1]:
            out["days"] = items[1]
        return out
    if cmd in ("retry", "while", "waitfor"):
        period = parse_period_s(items[0])
        n = int(items[1]) if len(items) > 1 and items[1] else -1
        if cmd == "retry":
            return {"trigger": "execute", "interval_s": period, "retries": n if n > 0 else 0}
        return {"trigger": cmd, "interval_s": period, "runs": n if n > 0 else 1}
    if cmd == "delay":
        return {"trigger": "delay", "initial_delay_s": parse_period_s(items[0])}
    if cmd == "interval":
        if len(items) == 1:
            iv = parse_period_s(items[0])
            return {"trigger": "interval", "interval_s": iv, "initial_delay_s": iv}
        return {
            "trigger": "interval",
            "initial_delay_s": parse_period_s(items[0]),
            "interval_s": parse_period_s(items[1]),
        }
    return {"trigger": "keyword", "keyword": spec}


def next_clock_fire(clock: str, days: str | None, now: datetime) -> datetime:
    """Next UTC occurrence of HH:MM on the allowed weekdays
    (TimeTools-style helper for introspection/tests)."""
    hh, mm = (int(x) for x in clock.split(":"))
    allowed = (
        {_WEEKDAYS[d.strip()[:2].lower()] for d in days.split(",")} if days else set(range(7))
    )
    cand = now.replace(hour=hh, minute=mm, second=0, microsecond=0)
    for _ in range(8):
        if cand > now and cand.weekday() in allowed:
            return cand
        cand += timedelta(days=1)
    raise ValueError("no valid occurrence")


def _task_macros(text: str, now: datetime | None = None) -> str:
    """Value macros (DAS Core manual 'The value'): @localtime,
    @utcstamp, @localstamp. Interface-address macros resolve via the
    same lookup admin:ipv4 uses."""
    now_utc = now or datetime.now(timezone.utc)
    local = now_utc.astimezone()
    out = text.replace("@localtime", local.strftime("%H:%M"))
    out = out.replace("@utcstamp", now_utc.strftime("%d/%m/%y %H:%M:%S"))
    out = out.replace("@localstamp", local.strftime("%d/%m/%y %H:%M:%S"))
    return out


def _parse_req(req: str) -> Check | None:
    """`req="group_name comparison"` → Check (RtvalCheck.java:17-57
    subset: one stored value against the comparison word grammar)."""
    req = req.strip()
    if not req:
        return None
    ref, _, comparison = req.partition(" ")
    ref = ref.replace("{r:", "").replace("}", "")
    group, _, name = ref.partition("_")
    if not name:
        group, name = "dcafs", ref
    return Check(group, name, comparison.strip())


def load_tasklist(source, engine) -> tuple[int, int]:
    """Parse a reference taskmanager script — `<tasklist>` holding
    `<tasksets>`/`<tasks>` (TaskManager.java:1124-1212, manual
    'Creating a script') — into the engine's TaskManager.

    Outputs map to engine transports: system/manager → Engine.command,
    log:* → the engine info log, email:to → engine.email_sender,
    file:path → append, stream:id → engine.stream_writers[id] (a
    callable registry; unrouted ids log a warning instead of failing).
    Returns (n_tasks, n_tasksets)."""
    import xml.etree.ElementTree as ET
    from pathlib import Path

    text = source
    if not str(source).lstrip().startswith("<"):
        text = Path(source).read_text()
    root = ET.fromstring(text)
    if root.tag != "tasklist":
        found = root.find(".//tasklist")
        if found is None:
            raise ValueError("no <tasklist> node in taskmanager script")
        root = found

    def make_action(output: str):
        kind, _, arg = (output or "system").partition(":")
        kind = kind.lower()
        # NB: TaskManager.fire already renders {r:}/{t:}/{utc:} refs
        # before invoking the action — only the @-macros remain here.
        if kind in ("system", "manager"):
            return lambda text: engine.command(_task_macros(text))
        if kind == "log":
            return lambda text: engine._log(f"[{arg or 'info'}] " + _task_macros(text))
        if kind == "email":
            def email_action(text: str, _to=arg):
                subject, _, body = text.partition(";")
                if engine.email_sender is None:
                    engine._log(f"email to {_to} dropped (no EmailWorker)")
                    return False
                engine.email_sender(_to, _task_macros(subject), _task_macros(body))
                return True

            return email_action
        if kind == "file":
            def file_action(text: str, _path=arg):
                with open(_path, "a", encoding="utf-8") as fh:
                    fh.write(_task_macros(text) + "\n")
                return True

            return file_action
        if kind == "stream":
            def stream_action(text: str, _sid=arg):
                writer = getattr(engine, "stream_writers", {}).get(_sid)
                if writer is None:
                    engine._log(f"stream '{_sid}' has no writer registered")
                    return False
                writer(_task_macros(text))
                return True

            return stream_action
        if kind == "mqtt":
            # output="mqtt:host:port,topic" → one-shot publish through the
            # engine's existing mqtt:send command path (Task.java:69 MQTT)
            def mqtt_action(text: str, _arg=arg):
                broker, _, topic = _arg.partition(",")
                reply = engine.command(f"mqtt:send,{broker},{topic},{_task_macros(text)}")
                return not str(reply).lower().startswith(("no ", "bad ", "failed"))

            return mqtt_action
        if kind == "telnet":
            # broadcast to every connected telnet session (Task.java:69
            # TELNET); no-op false when no server is attached
            def telnet_action(text: str):
                srv = getattr(engine, "telnet_server", None)
                if srv is None:
                    engine._log("telnet output dropped (no server)")
                    return False
                srv.broadcast(_task_macros(text))
                return True

            return telnet_action
        if kind in ("sms", "matrix"):
            # gateway-webhook transports (Task.java:69 SMS/MATRIX); the
            # engine carries one callable per channel, wired by the host
            # (tests wire outputs.webhook_action against a local server)
            def hook_action(text: str, _kind=kind, _to=arg):
                sender = getattr(engine, f"{_kind}_sender", None)
                if sender is None:
                    engine._log(f"{_kind} to {_to} dropped (no transport)")
                    return False
                sender(_to, _task_macros(text))
                return True

            return hook_action
        raise ValueError(f"unsupported task output '{output}'")

    def make_task(el, prefix: str, n: int) -> Task:
        kwargs = parse_trigger(el.get("trigger", ""))
        task = Task(
            id=el.get("id", f"{prefix}{n}"),
            action=make_action(el.get("output", "system")),
            value=(el.text or "").strip(),
            check=_parse_req(el.get("req", "")),
            **kwargs,
        )
        link = el.get("link", "")
        if link:
            linktype, _, target = link.partition(",")
            task.linktype = linktype.strip()
            task.link = target.strip() or None
        return task

    n_tasks = 0
    tasks_el = root.find("tasks")
    if tasks_el is not None:
        for el in tasks_el.findall("task"):
            engine.tasks.add_task(make_task(el, "task", n_tasks))
            n_tasks += 1
    n_sets = 0
    sets_el = root.find("tasksets")
    if sets_el is not None:
        for ts_el in sets_el.findall("taskset"):
            sid = ts_el.get("id", f"set{n_sets}")
            members = [
                make_task(el, f"{sid}_t", i) for i, el in enumerate(ts_el.findall("task"))
            ]
            engine.tasks.add_taskset(
                TaskSet(
                    id=sid,
                    run_type=ts_el.get("run", "oneshot"),
                    tasks=members,
                    failure_set=ts_el.get("failure") or None,
                )
            )
            n_sets += 1
    return n_tasks, n_sets
