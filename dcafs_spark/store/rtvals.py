"""Realtime value store (rtvals) — the reference's stateful aggregates.

Parity target: reference `src/util/data/RealtimeValues.java` +
`RealVal.java:145-182,385-414` — per-(group,name) last value, running
min/max, history ring buffer of N values, avg/stdev over the history
(sample stdev, NaN until the window is full), last-update timestamp.

Spark-first, batch flavor: one `groupBy(group, name).agg(...)` with
`max_by` for "last" (no sort needed → single shuffle, partial
aggregation map-side). History/avg/stdev use a bounded window over
event time — `rowsBetween(-N+1, 0)` — identical semantics to the ring
buffer. Streaming flavor lives in streaming.values_store.

At 100 TB: the agg is a single hash-aggregate shuffle on (group,name);
cardinality is #distinct sensors (small), so AQE coalesces the
post-shuffle side to almost nothing. The history window partitions by
key and sorts within partition only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def current_values(
    df: DataFrame,
    group: str = "group",
    name: str = "name",
    value: str = "value",
    ts: str = "ts",
    scale: int | None = None,
) -> DataFrame:
    """Latest/min/max/avg/stdev/count per (group, name).

    `last` = value at max timestamp (max_by — deterministic, unlike
    Spark's order-dependent `last()`); min/max are running since the
    epoch of the batch (reference resets via group reset —
    RealtimeValues.java:212-216 — callers re-aggregate a filtered df).
    """
    val = F.col(value)
    if scale is not None:
        val = F.round(val, scale)
    agg = df.groupBy(group, name).agg(
        F.max_by(val, F.col(ts)).alias("last_value"),
        F.min(val).alias("min_value"),
        F.max(val).alias("max_value"),
        F.round(F.avg(val), 3).alias("avg_value"),  # def scale 3 (RealVal.java:385-396)
        F.stddev_samp(val).alias("stdev_value"),
        F.max(ts).alias("last_ts"),
        F.count(val).alias("n_updates"),
    )
    return agg


def history_window(
    df: DataFrame,
    n: int,
    group: str = "group",
    name: str = "name",
    value: str = "value",
    ts: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Ring-buffer semantics: per key, rolling last-N window ordered by
    event time; avg over window, sample stdev that is NULL until the
    window holds N values (RealVal.java:403-414 returns NaN until
    full — SQL surfaces NULL, same 'not yet defined' contract)."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(group, name).orderBy(*order).rowsBetween(-(n - 1), 0)
    cnt = F.count(value).over(w)
    return (
        df.withColumn("hist_avg", F.round(F.avg(value).over(w), 3))
        .withColumn(
            "hist_stdev",
            F.when(cnt >= n, F.stddev_samp(value).over(w)),
        )
        .withColumn("hist_n", cnt)
    )


def flag_ops(df: DataFrame, op: str, value_col: str = "last_value") -> DataFrame:
    """raise/lower/toggle over a boolean values table
    (RealtimeValues.java:416-454)."""
    c = F.col(value_col).cast("boolean")
    if op == "raise":
        out = F.lit(True)
    elif op == "lower":
        out = F.lit(False)
    elif op == "toggle":
        out = ~c
    else:
        raise ValueError(f"unknown flag op {op}")
    return df.withColumn(value_col, out)
