"""As-of and range joins — time-series ops Spark lacks natively.

The reference has no joins at all (SURVEY §2.8); its closest analogue
is "current value of X when this record arrived" (rtval refs,
`src/io/forward/MathForward.java:619-701`) — which IS an as-of
lookup. These operators generalize that to table scale.

**as-of join** (backward): for each left row, the single most recent
right row with `right_ts <= left_ts` for the same key. Implemented
with the union trick: tag both sides, union, and take
`last_value(payload, ignorenulls) OVER (PARTITION BY key ORDER BY ts,
side ROWS UNBOUNDED PRECEDING)` — one shuffle + one sort per side,
exactly the cost of a sort-merge join, with NO range cross-product
and no per-key driver loops. Skew behaves like any sort-merge join
(AQE skew handling applies).

**range join** (point-in-interval): join points to [start, end]
intervals. With an equi-key the range is a residual filter on the
equi-join. Without one, intervals are replicated to fixed time bins
and points join on their bin — turning an O(n·m) theta join into an
equi-join with bounded per-bin fan-out (the standard interval-binning
strategy; bin width should be ~the median interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join; right columns come back null when no right
    row precedes the left row. Equal timestamps match (<=).

    `tolerance` (same unit as the ts columns) nulls the match when the
    matched right row is older than `left_ts - tolerance` — the
    pandas `merge_asof(tolerance=...)` semantic.

    All right payloads plus the matched right timestamp ride in ONE
    struct column filled by a single `last(ignorenulls)` window — the
    matched row's values and its timestamp are taken atomically, so a
    NULL payload value in the matched row stays NULL (row semantics,
    matching pandas merge_asof) instead of resurrecting an older
    non-null value. One shuffle, one sort, one window fill total."""
    from pyspark.sql.types import StructField, StructType

    payload_cols = payload_cols or [c for c in right.columns if c not in (on, right_ts)]
    pstruct_type = StructType(
        [StructField("_rts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        F.lit(None).cast(pstruct_type).alias("_pstruct"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on,)],
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload_cols]
        ).cast(pstruct_type).alias("_pstruct"),
    )
    # right sorts BEFORE left at equal _t (desc side) so ties match <=;
    # the payload struct is the final tiebreak — without it, two RIGHT
    # rows sharing (key, ts) would match in shuffle order, flapping
    # between runs/engines (the winner is then the max payload struct,
    # deterministic and engine-portable)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").desc(), F.col("_pstruct").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "_pstruct", F.last("_pstruct", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        stale = F.col("_pstruct").isNull() | (F.col("_t") - F.col("_pstruct._rts") > tolerance)
        merged = merged.withColumn(
            "_pstruct", F.when(stale, F.lit(None).cast(pstruct_type)).otherwise(F.col("_pstruct"))
        )
    out_cols = (
        [F.col("_k").alias(on)]
        + [F.col(c) for c in left.columns if c not in (on,)]
        + [F.col(f"_pstruct.{c}").alias(f"asof_{c}") for c in payload_cols]
    )
    return merged.filter(F.col("_side") == 0).select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    on: str | None = None,
    bin_width: int | None = None,
) -> DataFrame:
    """points ⋈ intervals where start <= point_ts <= end.

    With `on`, the equi-key carries the join and the range is a
    residual predicate. Without, intervals replicate to time bins of
    `bin_width` (same units as the timestamps) and points equi-join
    their bin — never a broadcast-nested-loop over the full corpus.
    """
    if on is not None:
        cond = (
            (points[point_ts] >= intervals[start])
            & (points[point_ts] <= intervals[end])
            & (points[on] == intervals[on])
        )
        return points.join(intervals, cond).drop(intervals[on])
    if bin_width is None:
        raise ValueError("need `on` or `bin_width`")
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start) / bin_width).cast("long"), (F.col(end) / bin_width).cast("long")
            )
        ),
    )
    binned_pt = points.withColumn("_bin", (F.col(point_ts) / bin_width).cast("long"))
    return (
        binned_pt.join(binned_iv, "_bin")
        .filter((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end)))
        .drop("_bin")
    )
