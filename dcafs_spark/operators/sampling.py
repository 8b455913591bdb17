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

from dcafs_spark.runtime import checkpoint

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


def dsir_importance(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — public method): score every document by how much its
    hashed-unigram distribution looks like a TARGET subset (rows where
    ``target`` is true, e.g. a trusted high-quality slice) versus the
    raw corpus. Documents with positive log-weight are
    target-distribution-like; selection then keeps the top mass.

    Per hashed feature bucket b:  lw(b) = ln p̂_tgt(b) − ln p̂_raw(b)
    with add-``alpha`` smoothing; per document: Σ_tokens lw(bucket(tok)).
    The per-bucket log-ratio is computed once from exact integer counts
    and QUANTIZED to int64 micro-nats, so the per-doc rollup is pure
    integer arithmetic — order-independent, bit-identical on any engine
    (same trick as the surprisal/embedding-stats queries).

    Scale shape (100 TB): one tokenize pass feeds a checkpointed
    (doc, bucket, count) pre-agg; bucket statistics are a
    map-side-combinable groupBy on ≤ n_buckets keys, and the scoring
    join broadcasts the FIXED-size bucket table (n_buckets rows —
    unlike a vocabulary join, this cannot outgrow executor memory at
    any corpus size). Document bodies are read once and never shuffle;
    the only doc-keyed shuffle carries (id, bucket, count) triples.

    Returns (id_col, n_tokens, logw_micro) for EVERY input document:
    logw_micro > 0 ⇒ closer to the target distribution than to the raw
    corpus; zero-token docs (NULL/empty/whitespace-only text) score
    (0, 0) rather than vanishing — they ride through as a NULL-bucket
    row from explode_outer, excluded from the bucket statistics and
    zeroed in the rollup, so a downstream join never silently drops
    them from the corpus."""
    from dcafs_spark.operators.textan import words

    toks = df.select(
        F.col(id_col).alias("id"),
        # coalesce: a NULL predicate (e.g. NULL lang) means NOT target,
        # matching the oracle's CASE WHEN ... THEN 1 ELSE 0 exactly
        F.coalesce(target.cast("int"), F.lit(0)).alias("tgt"),
        F.explode_outer(
            F.filter(words(F.col(text_col)), lambda x: x != "")
        ).alias("t"),
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long") % n_buckets
    ).alias("b")
    # checkpointed: consumed by the bucket-stats rollup AND the per-doc
    # scoring rollup — one tokenize/scan under a write
    pre = (
        toks.select("id", "tgt", bucket)
        .groupBy("id", "tgt", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(checkpoint)
    )
    bs = pre.filter(F.col("b").isNotNull()).groupBy("b").agg(
        F.sum("cnt").cast("long").alias("raw"),
        F.sum(F.col("cnt") * F.col("tgt")).cast("long").alias("tgtc"),
    )
    tot = bs.agg(
        F.sum("raw").cast("long").alias("t_raw"), F.sum("tgtc").cast("long").alias("t_tgt")
    )
    ab = float(alpha) * n_buckets
    lw = bs.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("tgtc") + F.lit(float(alpha))) / (F.col("t_tgt") + F.lit(ab)))
                - F.log((F.col("raw") + F.lit(float(alpha))) / (F.col("t_raw") + F.lit(ab)))
            )
            * 1e6
        )
        .cast("long")
        .alias("lw_micro"),
    )
    # left join: every real bucket matches lw (built from the same
    # pre); only a zero-token doc's NULL-bucket row misses, and its
    # aggregates coalesce to (0, 0)
    return (
        pre.join(F.broadcast(lw), "b", "left")
        .groupBy("id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("b").isNotNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("n_tokens"),
            F.coalesce(F.sum(F.col("cnt") * F.col("lw_micro")), F.lit(0))
            .cast("long")
            .alias("logw_micro"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "logw_micro")
    )


def weighted_priority_sample(
    df: DataFrame, weight_col: str, k: int, key_col: str, seed: int = 0
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of k rows — the
    Efraimidis–Spirakis exponential-clock method: each row draws
    priority −ln(u)/w from a deterministic hash-uniform u ∈ (0, 1];
    the k smallest priorities are exactly a weighted sample (inclusion
    probability ∝ weight, conditioned without replacement).

    Deterministic and engine-portable: u comes from the FULL 60-bit md5
    prefix of the key (never an RNG — granularity 2^-60, so priority
    collisions are measure-zero even at 10^10 rows; a coarser 1e-6
    uniform would round the top hash slice's priorities to 0 for every
    weight, silently ignoring weights at corpus scale), and the
    priority is quantized to int64 femto-units BEFORE the top-k so both
    engines rank identical integers (ties broken by key). Rows with
    weight ≤ 0 are excluded, matching the math (zero weight ⇒ never
    sampled). Weights are expected ≥ ~1 (max priority ln(2^60)/w·1e15 ≈
    4e16/w must fit int64); only weight RATIOS matter to the sample, so
    rescale tiny weights up rather than losing quantization headroom.

    Platform note: the quantized prio_femto VALUE depends on the exact
    ln() bits — priorities reach ~4e16 at femto quantization, so a
    1-ulp libm difference between engines can flip the int64. Sample
    MEMBERSHIP is robust (it flips only when two rows' priorities
    collide within that ulp — measure-zero), so cross-engine
    comparisons should check membership, not priorities (the oracle
    gate does exactly that).

    Scale shape: priority is a narrow map; the top-k is
    orderBy().limit(k) — Spark's TakeOrderedAndProject, a per-partition
    heap + driver merge of k rows, NOT a global sort. No shuffle of the
    corpus, driver traffic bounded at k rows."""
    h60 = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h60 + 1).cast("double") / float(1 << 60)
    prio = (
        F.round(-F.log(u) / F.col(weight_col).cast("double") * 1e15)
        .cast("long")
        .alias("prio_femto")
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(key_col), F.col(weight_col), prio)
        .orderBy(F.col("prio_femto").asc(), F.col(key_col).asc())
        .limit(k)
    )


def compute_stratum_counts(df: DataFrame, strata_col: str) -> list[tuple]:
    """Exact per-stratum row counts, the ``stratum_counts=`` input to
    :func:`capped_stratified_sample`.

    NOT memoized here: unlike dedup's distinct-ratio probe (where both
    plan shapes emit identical rows, so a stale ratio is
    performance-only), a stale stratum count would parameterize the
    prefilter THRESHOLD — an undercount keeps too few rows and silently
    breaks the "first cap per stratum" contract. Callers who KNOW their
    input is immutable (e.g. a fixed parquet snapshot, like the gated
    queries' per-sf_dir tables) may cache the result themselves and
    pass ``stratum_counts=`` — that is the supported amortization seam,
    chosen over an operator-internal memo precisely because only the
    caller can vouch for immutability. O(#strata) driver rows."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    return [(r[0], r[1]) for r in counts.collect()]



def capped_stratified_sample(
    df: DataFrame,
    strata_col: str,
    cap: int,
    key_col: str,
    seed: int = 0,
    prefilter_margin: int = 4,
    stratum_counts: list[tuple] | None = None,
) -> DataFrame:
    """At most `cap` rows per stratum (corpus balancing: cap the
    dominant languages/sources so one stratum can't swamp a training
    mix), chosen deterministically — rank rows inside each stratum by
    key hash and keep the first `cap`.

    Dominant-stratum hotspot mitigation (AUTOMATIC): the rank window
    shuffles every row of a stratum through one task, so a dominant
    stratum (90% of a 100 TB corpus in one language) is a straggler.
    One map-side stratum count — paid EAGERLY at plan build unless the
    caller supplies ``stratum_counts`` or disables with
    prefilter_margin=0 — decides, per stratum, whether to pre-filter
    by the SAME hash-bucket order the window ranks by: a stratum with
    n rows keeps only buckets below ~(margin·cap+32)/n of the range,
    so the window sees ~margin·cap rows instead of n. Because the
    prefilter keeps a PREFIX of the rank order (NULL-bucket rows,
    which rank first under NULLS FIRST, are always retained), the kept
    top-`cap` is unchanged as long as ≥cap rows survive — expected
    survivors are margin·cap+32, so P[fewer than cap] is a Chernoff
    tail below e^-20 for any cap (the +32 floors the expectation for
    tiny caps). Only strata with ≥4× the target survive the cutoff
    (smaller ones gain nothing), and at most the 256 largest dominant
    strata ride the literal CASE threshold (bounded plan size; the
    257th-largest stratum is ranked un-prefiltered, correct either
    way). NULL strata are never prefiltered.

    Plan shape: scan → Filter(bucket < CASE stratum) → window. The
    filter is a row-level predicate evaluated in the scan stage —
    dominant-stratum rows die before the exchange, which is the point.
    Selection stays stable under repartitioning and corpus growth
    restricted to new keys."""
    from pyspark.sql import Window

    bucket = hash_bucket(F.col(key_col), seed)
    pre = df
    if prefilter_margin > 0:
        target = prefilter_margin * cap + 32  # expected survivors per stratum
        if stratum_counts is None:
            stratum_counts = compute_stratum_counts(df, strata_col)
        dominant = [(s, n) for s, n in stratum_counts if s is not None and n > 4 * target]
        if dominant:
            dominant = sorted(dominant, key=lambda x: -x[1])[:256]
            thr = None
            for sval, n in dominant:
                t = F.lit(int(target * _BUCKETS / n) + 1)
                cond = F.col(strata_col) == F.lit(sval)
                thr = F.when(cond, t) if thr is None else thr.when(cond, t)
            # bucket IS NULL (NULL sampling key) ranks FIRST in the
            # window's NULLS FIRST order — always in the kept prefix,
            # so the prefilter must retain it (bucket < thr is NULL,
            # not true, for those rows)
            pre = df.filter(bucket.isNull() | (bucket < thr.otherwise(F.lit(_BUCKETS))))
    win = Window.partitionBy(strata_col).orderBy(bucket.asc(), F.col(key_col).asc())
    return (
        pre.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
