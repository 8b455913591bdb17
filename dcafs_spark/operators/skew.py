"""Skew-resilient aggregation: salted two-phase groupBy.

At 100 TB a hot key (one sensor spamming, one document template
duplicated millions of times) turns a groupBy into a straggler task.
AQE's skew handling splits skewed JOIN partitions but a skewed
AGGREGATE still funnels each key through one reducer for the final
merge. The classic fix: salt the key for a partial aggregate (fan the
hot key across `salt_buckets` reducers), then merge the partials in a
second, tiny aggregation over #keys × salt rows.

Only algebraic aggregates decompose this way — sum/count/min/max (and
avg = sum/count) are provided. For a plain narrow distribution the
extra stage costs one cheap shuffle of pre-reduced rows, so this is a
safe default for unknown key distributions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """groupBy(keys) with salting.

    aggs: output_name -> (fn, column) with fn in sum|count|min|max|avg.
    avg expands to exact sum+count partials (never average of averages).
    """
    expanded: dict[str, tuple[str, str]] = {}
    avg_outputs: list[tuple[str, str]] = []  # (out_name, col)
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            expanded[f"_{out}_sum"] = ("sum", col)
            expanded[f"_{out}_cnt"] = ("count", col)
            avg_outputs.append((out, col))
        else:
            expanded[out] = (fn, col)

    # deterministic salt from the full row content, NOT F.rand():
    # rand is an indeterminate expression feeding a shuffle, so a map
    # stage recomputed after a fetch failure would re-salt rows while
    # some reducers already consumed the old layout (the classic
    # duplicated/lost-partial hazard). xxhash64 of the row spreads a
    # hot key just as well (duplicate rows co-bucket, which only
    # concentrates when one exact row dominates) and is retry-stable.
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*df.columns), F.lit(13)), F.lit(salt_buckets))
    )
    partial_exprs: list[Column] = []
    for out, (fn, col) in expanded.items():
        agg_fn = F.count if fn == "count" else getattr(F, fn)
        partial_exprs.append(agg_fn(col).alias(out))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)

    final_exprs = [_MERGE[fn](out).alias(out) for out, (fn, _col) in expanded.items()]
    out_df = partial.groupBy(*keys).agg(*final_exprs)

    for out, _col in avg_outputs:
        out_df = out_df.withColumn(
            out, F.col(f"_{out}_sum") / F.col(f"_{out}_cnt")
        ).drop(f"_{out}_sum", f"_{out}_cnt")
    return out_df
