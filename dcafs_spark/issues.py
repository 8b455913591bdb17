"""IssuePool: active alarm/issue registry fed by trigger rules.

Parity target: reference `src/das/IssuePool.java` — issues are named
conditions that become *active* when raised and *resolved* when
cleared, keeping start/stop timestamps and occurrence counts; trigger
rules and task checks raise/clear them.

Spark-side: a driver-held registry (issue cardinality = #configured
alarms, tiny) designed to be wired to ValuesStore trigger rules —
`attach()` registers a comparison rule whose hysteresis edge raises
the issue and whose clear edge resolves it. `to_df` exposes the
registry as a queryable table (the alerts table of SURVEY §2.9)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dcafs_spark.streaming.values_store import TriggerRule, ValuesStore


@dataclass
class Issue:
    id: str
    message: str
    active: bool = False
    count: int = 0
    raised_at: float | None = None
    resolved_at: float | None = None
    history: list[tuple[float, str]] = field(default_factory=list)


class IssuePool:
    def __init__(self, clock=time.time):
        self.issues: dict[str, Issue] = {}
        self._clock = clock

    def define(self, issue_id: str, message: str) -> Issue:
        return self.issues.setdefault(issue_id, Issue(issue_id, message))

    def raise_issue(self, issue_id: str, message: str | None = None) -> None:
        iss = self.issues.setdefault(issue_id, Issue(issue_id, message or issue_id))
        if not iss.active:  # re-raising an active issue is a no-op
            iss.active = True
            iss.count += 1
            iss.raised_at = self._clock()
            iss.history.append((iss.raised_at, "raised"))

    def resolve(self, issue_id: str) -> None:
        iss = self.issues.get(issue_id)
        if iss is not None and iss.active:
            iss.active = False
            iss.resolved_at = self._clock()
            iss.history.append((iss.resolved_at, "resolved"))

    def active(self) -> list[Issue]:
        return [i for i in self.issues.values() if i.active]

    def attach(self, store: ValuesStore, issue_id: str, group: str, name: str, comparison: str, message: str | None = None) -> None:
        """Wire an issue to a value condition: the trigger's hysteresis
        edge raises; a custom clear-side rule resolves (the reference's
        trigger pairs — RealVal.java:464-533 + IssuePool wiring)."""
        self.define(issue_id, message or f"{group}_{name} {comparison}")

        store.add_rule(
            TriggerRule(
                group, name, "comparison", comparison=comparison,
                cmd=lambda g, n, v: self.raise_issue(issue_id),
            )
        )

        # resolve on the complementary edge: a 'changed' rule that checks
        # the (non-)condition each update and clears when it stops holding
        from dcafs_spark.functions.compare import compile_compare_py

        check = compile_compare_py(comparison)

        def maybe_clear(g, n, v):
            if not check(v):
                self.resolve(issue_id)

        store.add_rule(TriggerRule(group, name, "always", cmd=maybe_clear))

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (i.id, i.message, i.active, i.count, i.raised_at, i.resolved_at)
            for i in self.issues.values()
        ]
        return spark.createDataFrame(
            rows,
            "issue_id string, message string, active boolean, n_raised long, "
            "raised_at double, resolved_at double",
        )
