"""Arbitrary-stateful streaming values: applyInPandasWithState.

The driver-side ValuesStore (values_store.py) is right when key
cardinality = #sensor ids (the reference's regime). This module is the
scale-out variant SURVEY §4.2 calls for: per-key state lives in the
Spark state store (RocksDB-backed on a real cluster, checkpointed,
sharded across executors), so the key space can be unbounded — same
aggregation contract, no driver involvement.

State per (group, name): last value+ts, running min/max/count/sum, and
the history ring buffer (RealVal.java:145-182,385-414 semantics,
including sample-stdev-only-when-window-full)."""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
        StructField("hist", ArrayType(DoubleType())),
        StructField("last_ts", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("name", StringType()),
        StructField("last_value", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("avg_value", DoubleType()),
        StructField("hist_avg", DoubleType()),
        StructField("hist_stdev", DoubleType()),
        StructField("n_updates", LongType()),
    ]
)


def _update_fn(history_n: int):
    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            last, vmin, vmax, cnt, total, hist, last_ts = state.get
            hist = list(hist)
        else:
            last, vmin, vmax, cnt, total, hist, last_ts = None, math.inf, -math.inf, 0, 0.0, [], -math.inf
        # drop NULL value/ts rows up front: a NaN value would make
        # cnt disagree with the skipna sum (wrong avg), poison the
        # history ring (NaN hist_avg/stdev once it enters), and a
        # NaN ts sorts last, freezing last_value.
        # Concat ALL chunks before the ts sort: a key whose batch spans
        # several Arrow chunks arrives in arbitrary cross-chunk order,
        # and sorting per chunk would interleave the history ring out
        # of event-time order (round-11 review). Memory is bounded by
        # one key's rows in one micro-batch — the rtvals regime is many
        # keys × few rows each.
        frames = [p.dropna(subset=["value", "ts"]) for p in pdfs]
        frames = [p for p in frames if len(p)]
        if frames:
            pdf = pd.concat(frames).sort_values("ts") if len(frames) > 1 else frames[0].sort_values("ts")
            vals = pdf["value"].astype(float)
            ts = pdf["ts"].astype(float)
            vmin = min(vmin, vals.min())
            vmax = max(vmax, vals.max())
            cnt += len(vals)
            total += float(vals.sum())
            if ts.iloc[-1] >= last_ts:
                last = float(vals.iloc[-1])
                last_ts = float(ts.iloc[-1])
            hist = (hist + list(vals))[-history_n:]
        state.update((last, vmin, vmax, cnt, total, hist, last_ts))
        full = len(hist) >= history_n
        mean = sum(hist) / len(hist) if hist else None
        stdev = None
        if full and len(hist) > 1:
            stdev = math.sqrt(sum((x - mean) ** 2 for x in hist) / (len(hist) - 1))
        yield pd.DataFrame(
            [
                {
                    "group": key[0],
                    "name": key[1],
                    "last_value": last,
                    "min_value": vmin,
                    "max_value": vmax,
                    "avg_value": round(total / cnt, 3) if cnt else None,
                    "hist_avg": round(mean, 3) if mean is not None else None,
                    "hist_stdev": stdev,
                    "n_updates": cnt,
                }
            ]
        )

    return update


def stateful_values(
    stream_df: DataFrame,
    history_n: int = 10,
    group: str = "group",
    name: str = "name",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """Streaming DataFrame → per-key running aggregates, state in the
    Spark state store. Emits one row per updated key per micro-batch
    (update semantics, like the reference's per-record rtvals push).
    NULL values/timestamps are ignored (not counted, not stored).

    history_n must be ≥ 1: it bounds the per-key ring buffer, which is
    what keeps state-store size O(#keys) instead of O(#rows)."""
    from pyspark.sql import functions as F

    if history_n < 1:
        raise ValueError(
            f"history_n must be >= 1 (got {history_n}): a non-positive ring "
            "size would make per-key state grow unboundedly"
        )

    keyed = stream_df.select(
        F.col(group).alias("group"),
        F.col(name).alias("name"),
        F.col(value).cast("double").alias("value"),
        F.col(ts).cast("double").alias("ts"),
    )
    return keyed.groupBy("group", "name").applyInPandasWithState(
        _update_fn(history_n),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
