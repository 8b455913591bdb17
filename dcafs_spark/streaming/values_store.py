"""Streaming realtime-value store with trigger rules + hysteresis.

Parity target: reference `src/util/data/RealtimeValues.java` (the
live store updated per record) and `RealVal.java:464-533` (triggered
commands: ``always``, ``changed``, comparison triggers with
hysteresis — a comparison trigger fires ONCE when its condition
becomes true and re-arms only after the condition clears,
`RealVal.java:527-531`).

Design (SURVEY §3.1 Spark equivalent): the stream is aggregated
per micro-batch (map-side partial agg → tiny shuffle keyed by
(group,name)), and the per-key *running* state — last value,
running min/max, count, history tail, armed/fired trigger flags —
merges batch deltas driver-side in ``foreachBatch``.

Why driver-side state is the scale-correct choice here: the key
cardinality is the number of distinct sensor value ids — hundreds,
not billions (`RealtimeValues` is a flat in-memory map in the
reference too). Each micro-batch reduces arbitrarily many input rows
to ≤ one delta row per key BEFORE it reaches the driver, so driver
work per batch is O(#keys), independent of data volume. For
billion-key state you'd swap this class for
``applyInPandasWithState`` with the same merge function; the
aggregation contract is identical.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dcafs_spark.functions.compare import compile_compare_py


@dataclass
class TriggerRule:
    """One triggered command on a value (AbstractVal.java:34 types)."""

    group: str
    name: str
    kind: str  # always | changed | comparison | stdev
    cmd: Callable[[str, str, float], Any] | None = None
    # comparison spec in the reference grammar: 'above 10', '< 3',
    # 'between 2 and 8', 'not below 1', ... (MathUtils.java:244-329)
    comparison: str | None = None
    fired: bool = False  # hysteresis: armed until condition clears

    def __post_init__(self):
        self._check = compile_compare_py(self.comparison) if self.comparison else None


@dataclass
class _KeyState:
    last: float | None = None
    min: float = math.inf
    max: float = -math.inf
    count: int = 0
    total: float = 0.0
    history: list[float] = field(default_factory=list)
    last_ts: Any = None


class ValuesStore:
    """Driver-side running store fed by per-batch aggregate deltas.

    ``max_keys`` guards the driver footprint: the design contract is
    rtval-style bounded key cardinality (hundreds of sensor ids, like
    the reference's flat in-memory map). Exceeding it raises with a
    pointer to ``streaming/stateful.py``'s applyInPandasWithState
    variant, which holds per-key state in the executor state store and
    scales to unbounded keys."""

    def __init__(self, history_n: int = 10, max_keys: int = 100_000):
        self.history_n = history_n
        self.max_keys = max_keys
        self.state: dict[tuple[str, str], _KeyState] = {}
        self.texts: dict[tuple[str, str], str] = {}  # TextVal store
        self.flags: dict[tuple[str, str], bool] = {}  # FlagVal store
        self.rules: list[TriggerRule] = []
        self.fired_log: list[tuple[str, str, str, float]] = []

    def add_rule(self, rule: TriggerRule) -> None:
        self.rules.append(rule)

    # ---------------------------------------------------------- batch path
    def batch_deltas(self, df: DataFrame, group="group", name="name", value="value", ts="ts") -> DataFrame:
        """Distributed reduction: one delta row per key per batch.

        collect_list over the groupBy is bounded: only the last
        ``history_n`` values matter, so we aggregate the batch tail via
        max_by struct packing (avoids shipping whole batches driver-side).

        NULL values are non-measurements (the reference's RealVal only
        updates on a parsed double) and are dropped up front: without
        the filter an all-NULL key crashes the merge on min(inf, None)
        and a mixed batch whose latest-ts value is NULL overwrites
        last/history with None.
        """
        df = df.filter(F.col(value).isNotNull())
        packed = F.array_sort(
            F.collect_list(F.struct(F.col(ts).alias("t"), F.col(value).alias("v")))
        )
        # dynamic start: slice(-n) on an array shorter than n is empty,
        # so clamp to -size when the batch holds fewer than n values
        tail = F.slice(
            packed, F.greatest(F.lit(-self.history_n), -F.size(packed)), F.lit(self.history_n)
        )
        return df.groupBy(
            F.col(group).alias("group"), F.col(name).alias("name")
        ).agg(
            F.max_by(F.col(value), F.col(ts)).alias("d_last"),
            F.min(value).alias("d_min"),
            F.max(value).alias("d_max"),
            F.count(value).alias("d_count"),
            F.sum(value).alias("d_sum"),
            F.max(ts).alias("d_ts"),
            F.transform(tail, lambda s: s["v"]).alias("d_tail"),
        )

    def merge_batch(self, batch_df: DataFrame, **cols) -> None:
        """foreachBatch body: merge per-key deltas into running state,
        evaluate trigger rules per record (reference parity:
        RealVal.java:464-533 fires on every update, so a value that
        crosses a threshold and returns WITHIN one batch still fires,
        and 'changed' fires once per change, not once per batch).

        Ruled keys are few (one per configured triggered cmd), so only
        THEIR full ordered value sequences come back to the driver —
        every other key still reduces to one delta row distributedly."""
        ruled = {(r.group, r.name) for r in self.rules}
        group = cols.get("group", "group")
        name = cols.get("name", "name")
        value = cols.get("value", "value")
        ts = cols.get("ts", "ts")
        seqs: dict[tuple[str, str], list[float]] = {}
        persisted = False
        if ruled:
            # two jobs consume this batch (the ruled-key sequences and
            # the per-key deltas) — persist so the micro-batch is
            # scanned once, not recomputed per job
            try:
                batch_df.persist()
                persisted = True
            except Exception:
                pass  # e.g. a plan that disallows caching: correctness unaffected
            key_expr = F.struct(F.col(group).alias("g"), F.col(name).alias("n"))
            wanted = [F.struct(F.lit(g).alias("g"), F.lit(n).alias("n")) for g, n in sorted(ruled)]
            seq_rows = (
                batch_df.filter(key_expr.isin(*wanted) & F.col(value).isNotNull())
                .groupBy(F.col(group).alias("group"), F.col(name).alias("name"))
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col(ts).alias("t"), F.col(value).alias("v")))
                        ),
                        lambda s: s["v"],
                    ).alias("vals")
                )
                .collect()
            )
            seqs = {(r["group"], r["name"]): list(r["vals"]) for r in seq_rows}
        try:
            delta_rows = self.batch_deltas(batch_df, **cols).collect()
        finally:
            if persisted:
                batch_df.unpersist()
        for row in delta_rows:
            key = (row["group"], row["name"])
            st = self.state.setdefault(key, _KeyState())
            prev = st.last
            st.last = row["d_last"]
            st.min = min(st.min, row["d_min"])
            st.max = max(st.max, row["d_max"])
            st.count += row["d_count"]
            st.total += row["d_sum"]
            st.last_ts = row["d_ts"]
            pre_hist = list(st.history)
            st.history = (st.history + list(row["d_tail"]))[-self.history_n :]
            if key in seqs:
                self._eval_rules_seq(key, prev, seqs[key], pre_hist)
        if len(self.state) > self.max_keys:
            raise RuntimeError(
                f"ValuesStore key cardinality {len(self.state)} exceeds max_keys="
                f"{self.max_keys}; this driver-side store is for bounded rtval "
                "cardinality — use dcafs_spark.streaming.stateful for unbounded keys"
            )

    # -------------------------------------------------------------- rules
    def _eval_rules_seq(
        self,
        key: tuple[str, str],
        prev: float | None,
        values: list[float],
        pre_hist: list[float] | None = None,
    ) -> None:
        """Per-record trigger evaluation over the batch's ordered values.

        Value-major: each update runs through ALL of the key's rules
        before the next update (RealVal.java:464-533 fires every
        trigger per update). Rule-major iteration would let a
        clear-side rule revisit an EARLIER value after a later one
        already fired its raise-side pair — un-sequencing paired
        raise/resolve rules within a multi-record batch."""
        rules = [r for r in self.rules if (r.group, r.name) == key]
        if not rules:
            return
        p = prev
        hist = list(pre_hist or [])
        for new in values:
            hist = (hist + [new])[-self.history_n :]
            for rule in rules:
                if rule.kind == "always":
                    self._fire(rule, key, new)
                elif rule.kind == "changed":
                    if p is None or p != new:
                        self._fire(rule, key, new)
                elif rule.kind in ("comparison", "stdev"):
                    if rule.kind == "stdev":
                        # compare the rolling history's sample stdev
                        # instead of the value; skip until the window is
                        # full (RealVal.java:515-521 NaN guard). Sample
                        # stdev needs >= 2 points, so a history_n=1
                        # store never fires (snapshot() applies the
                        # same len>1 rule) instead of dividing by zero
                        if len(hist) < max(self.history_n, 2):
                            continue
                        mean = sum(hist) / len(hist)
                        var = sum((x - mean) ** 2 for x in hist) / (len(hist) - 1)
                        probe = math.sqrt(var)
                    else:
                        probe = new
                    ok = rule._check(probe)
                    if ok and not rule.fired:  # fire once, then hold
                        rule.fired = True
                        self._fire(rule, key, new)  # $ renders the VALUE (RealVal.java:528)
                    elif not ok and rule.fired:  # condition cleared → re-arm
                        rule.fired = False
            p = new

    def _fire(self, rule: TriggerRule, key: tuple[str, str], value: float) -> None:
        self.fired_log.append((key[0], key[1], rule.kind, value))
        if rule.cmd is not None:
            rule.cmd(key[0], key[1], value)

    # ----------------------------------------------- text / flag values
    def merge_text_batch(self, df: DataFrame, group="group", name="name", value="value", ts="ts") -> None:
        """TextVal flavor (RealtimeValues.java:31): last text per key —
        the batch reduces to one max_by row per key distributedly.

        NULL texts are non-measurements and are dropped up front, the
        same discipline as the numeric path (round-10 fix there,
        round-11 review here): without the filter a batch whose
        latest-ts row failed to parse overwrites a good stored text
        with None, and an all-NULL key erases the entry."""
        deltas = df.filter(F.col(value).isNotNull()).groupBy(
            F.col(group).alias("group"), F.col(name).alias("name")
        ).agg(F.max_by(F.col(value), F.col(ts)).alias("d_last"), F.max(ts).alias("d_ts"))
        for row in deltas.collect():
            self.texts[(row["group"], row["name"])] = row["d_last"]

    def set_flag(self, group: str, name: str, op: str) -> bool:
        """FlagVal raise/lower/toggle (RealtimeValues.java:416-454)."""
        key = (group, name)
        cur = self.flags.get(key, False)
        if op == "raise":
            self.flags[key] = True
        elif op == "lower":
            self.flags[key] = False
        elif op == "toggle":
            self.flags[key] = not cur
        else:
            raise ValueError(f"unknown flag op {op}")
        new = self.flags[key]
        # edge commands (FlagVal.java:104-130): kind='raised'/'lowered'
        # rules fire only on the actual transition; $ renders true/false
        if new != cur:
            edge = "raised" if new else "lowered"
            for rule in self.rules:
                if (rule.group, rule.name) == key and rule.kind == edge:
                    self.fired_log.append((group, name, edge, 1.0 if new else 0.0))
                    if rule.cmd is not None:
                        rule.cmd(group, name, new)
        return new

    def get_text(self, group: str, name: str) -> str | None:
        return self.texts.get((group, name))

    def get_flag(self, group: str, name: str) -> bool:
        return self.flags.get((group, name), False)

    # ---------------------------------------------------------- group ops
    def reset_group(self, group: str) -> int:
        """Reset every value in a group to pristine stats
        (`rtvals:resetgroup` — RealtimeValues.java:854-858, RealVal
        reset :202-207): min/max/avg/history restart; the key stays
        registered. Returns #keys reset."""
        n = 0
        for key in list(self.state):
            if key[0] == group:
                self.state[key] = _KeyState()
                n += 1
        return n

    def update_group(self, group: str, value: float) -> int:
        """Set every value in a group (updateRealGroup,
        RealtimeValues.java:855-856): the forced value flows through
        min/max/avg/history like a real update. Returns #keys touched."""
        n = 0
        for key, st in self.state.items():
            if key[0] != group:
                continue
            prev = st.last
            pre_hist = list(st.history)  # rules see the REAL rolling
            st.last = value  # window, as a merge_batch update would
            st.min = min(st.min, value)
            st.max = max(st.max, value)
            st.count += 1
            st.total += value
            st.history = (st.history + [value])[-self.history_n :]
            self._eval_rules_seq(key, prev, [value], pre_hist)
            n += 1
        return n

    # ------------------------------------------------------------- reads
    def snapshot(self) -> list[dict]:
        """Current-values table (rv-style listing)."""
        out = []
        for (g, n), st in sorted(self.state.items()):
            hist = st.history
            full = len(hist) >= self.history_n
            mean = sum(hist) / len(hist) if hist else None
            stdev = None
            if full and len(hist) > 1:
                m = mean
                stdev = math.sqrt(sum((x - m) ** 2 for x in hist) / (len(hist) - 1))
            out.append(
                {
                    "group": g,
                    "name": n,
                    "last_value": st.last,
                    "min_value": st.min if st.count else None,
                    "max_value": st.max if st.count else None,
                    "avg_value": round(st.total / st.count, 3) if st.count else None,
                    "hist_avg": round(mean, 3) if mean is not None else None,
                    "hist_stdev": stdev,  # NaN-until-full contract → None
                    "n_updates": st.count,
                    "last_ts": st.last_ts,
                }
            )
        return out

    def get(self, group: str, name: str) -> float | None:
        st = self.state.get((group, name))
        return None if st is None else st.last
