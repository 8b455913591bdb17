"""Interval-driven custom sources (PathForward CustomSrc parity).

The reference's paths can be fed by non-network sources that tick at a
fixed interval (`src/io/forward/PathForward.java:435-590`, SRCTYPE
enum): `plain` (a literal line), `rtvals` (a template rendered from the
value store), `cmd` (output of an engine command), `sqlite` (rows of a
query replayed in chunks), `file` (covered by sources/replay.py).

Spark mapping: each tick renders lines and drops them into a spool
directory as an atomically-renamed file; the standard `text` streaming
source picks them up — the same bridge shape as the MQTT/UDP edges, so
every custom source rides the one data path and is replayable from its
spool. The render callable runs on the driver (these sources are
driver-scale by definition: a literal, a template, a command reply);
the heavy lifting stays in the distributed plan downstream.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable


class IntervalSpool:
    """Call `render()` every `interval_s`; write returned lines to the
    spool dir (tmp + atomic rename). `render` returning None stops the
    ticker (the reference's read-once exhaustion)."""

    def __init__(
        self,
        render: Callable[[], list[str] | None],
        interval_s: float,
        spool_dir: str,
        prefix: str = "src",
    ):
        self.render = render
        self.interval_s = interval_s
        self.spool_dir = spool_dir
        self.prefix = prefix
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seq = 0
        self.n_lines = 0

    def start(self) -> "IntervalSpool":
        os.makedirs(self.spool_dir, exist_ok=True)
        self._thread = threading.Thread(target=self._run, daemon=True, name="custom-src")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    @property
    def exhausted(self) -> bool:
        return self._thread is not None and not self._thread.is_alive()

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                lines = self.render()
            except Exception:  # noqa: BLE001 — a bad template must not kill the ticker
                continue
            if lines is None:
                break
            if lines:
                self._flush(lines)

    def _flush(self, lines: list[str]) -> None:
        tmp = os.path.join(self.spool_dir, f".{self.prefix}_{self._seq:08d}.tmp")
        dst = os.path.join(self.spool_dir, f"{self.prefix}_{self._seq:08d}.txt")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, dst)
        self._seq += 1
        self.n_lines += len(lines)


def sqlite_render(db_path: str, query: str, chunk: int = 2500) -> Callable[[], list[str] | None]:
    """Replay a sqlite query's rows as comma-joined lines, `chunk` per
    tick, then stop (the reference's read-once + 2500-line buffer,
    PathForward.java:42,520-560)."""
    state: dict = {"rows": None, "i": 0}

    def render() -> list[str] | None:
        if state["rows"] is None:
            import sqlite3

            con = sqlite3.connect(db_path)
            try:
                state["rows"] = [
                    ",".join("" if c is None else str(c) for c in row)
                    for row in con.execute(query)
                ]
            finally:
                con.close()
        i = state["i"]
        if i >= len(state["rows"]):
            return None
        state["i"] = i + chunk
        return state["rows"][i : i + chunk]

    return render
