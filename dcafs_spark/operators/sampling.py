"""Deterministic sampling for training-data pipelines.

A large-scale corpus pipeline needs samples that are (a) reproducible
across runs and engines, (b) stable under repartitioning, and (c)
computed without a shuffle. Spark's `df.sample` is none of these (it
draws per-partition from a seeded RNG, so results change with the
split layout). These operators hash a key column instead: a row is in
the sample iff `md5_60bit(key ∥ seed) mod 1e6 < fraction·1e6` — a pure
narrow map, identical on any engine that can md5 (the same portable
hashing trick as operators/dedup.minhash_signature), so the DuckDB
correctness oracle replays it bit-for-bit.

At 100 TB: sampling is a scan-side filter — no shuffle, no state, and
Catalyst pushes the surviving-row projection into the scan. Stratified
fractions become one CASE expression on the stratum column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Uniform bucket in [0, 1e6) from a 60-bit md5 prefix — portable
    integer arithmetic (no engine-specific hash)."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long") % _BUCKETS


def hash_sample(df: DataFrame, fraction: float, key_col: str, seed: int = 0) -> DataFrame:
    """Keep ~fraction of rows, deterministically by key hash."""
    return df.filter(hash_bucket(F.col(key_col), seed) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame, fractions: dict[str, float], strata_col: str, key_col: str, seed: int = 0
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample dominant languages, keep
    rare ones whole). Strata absent from ``fractions`` are dropped —
    matching Spark's own sampleBy contract."""
    bucket = hash_bucket(F.col(key_col), seed)
    threshold = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        thr = F.lit(int(frac * _BUCKETS))
        threshold = F.when(cond, thr) if threshold is None else threshold.when(cond, thr)
    threshold = F.lit(0) if threshold is None else threshold.otherwise(F.lit(0))
    return df.filter(bucket < threshold)


def train_test_split(
    df: DataFrame, test_fraction: float, key_col: str, seed: int = 0, split_col: str = "split"
) -> DataFrame:
    """Label each row train/test by key hash — the split survives
    reshuffles, re-runs, and incremental corpus growth (a key keeps its
    assignment forever, so no train/test leakage as data accretes)."""
    bucket = hash_bucket(F.col(key_col), seed)
    return df.withColumn(
        split_col,
        F.when(bucket < int(test_fraction * _BUCKETS), F.lit("test")).otherwise(F.lit("train")),
    )


def capped_stratified_sample(
    df: DataFrame, strata_col: str, cap: int, key_col: str, seed: int = 0
) -> DataFrame:
    """At most `cap` rows per stratum (corpus balancing: cap the
    dominant languages/sources so one stratum can't swamp a training
    mix), chosen deterministically — rank rows inside each stratum by
    key hash and keep the first `cap`.

    One shuffle on the stratum key; with few strata and huge rows the
    window would hotspot, so real 100 TB runs pre-filter with
    `hash_sample` at ~cap/|stratum| before ranking — the window then
    sees ~cap rows per stratum instead of the whole corpus. The hash
    order makes the selection stable under repartitioning and corpus
    growth restricted to new keys."""
    from pyspark.sql import Window

    bucket = hash_bucket(F.col(key_col), seed)
    win = Window.partitionBy(strata_col).orderBy(bucket.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
