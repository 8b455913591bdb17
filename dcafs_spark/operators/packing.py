"""Sequence packing: assign documents to fixed token-budget packs —
the batching step of an LLM pretraining pipeline (docs are concatenated
into budget-sized training sequences; a doc may straddle two packs).

Semantics (deterministic, engine-portable):
  * rows are sharded by key hash (`shards` buckets) — packing is
    per-shard, so the ordered cumulative sum never becomes a global
    single-task bottleneck: each shard packs independently and in
    parallel, exactly like a real corpus pass that packs per worker;
  * within a shard, docs are ordered by (key hash, key) — stable under
    repartitioning and reruns PROVIDED key_col values are unique (the
    corpus-id contract; duplicate keys tie on both sort terms and
    their relative order — hence their cum_tokens — is layout-defined);
  * contiguous fill: pack boundaries fall every `budget` tokens of the
    shard's running total; `pack_first`/`pack_last` report the packs a
    doc lands in (straddles when its tokens cross a boundary).

At 100 TB: one shuffle on the shard id (uniform by construction), one
window pass per shard partition. No driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dcafs_spark.operators.sampling import hash_bucket


def sequence_packing(
    df: DataFrame,
    tokens_col: str,
    key_col: str,
    budget: int = 2048,
    shards: int = 32,
    seed: int = 0,
) -> DataFrame:
    """Add (shard, cum_tokens, pack_first, pack_last) to each row.

    `pack_first` = pack holding the doc's first token within its
    shard; `pack_last` = pack holding its final token. Docs with more
    tokens than `budget` span multiple packs — callers split those
    downstream (the split offsets are derivable from cum_tokens).
    """
    # both are interpolated into F.expr SQL below: quote the column so
    # names needing backticks parse, and reject a float/str budget that
    # would silently change (or kill) the integer DIV semantics.
    # Dots stay field-access separators (tokens_col='meta.tok_count'
    # must keep resolving the struct field, matching F.col semantics);
    # each segment is backtick-quoted with embedded backticks doubled.
    if not isinstance(budget, int) or isinstance(budget, bool) or budget <= 0:
        raise ValueError(f"budget must be a positive int, got {budget!r}")
    toks_sql = ".".join("`" + seg.replace("`", "``") + "`" for seg in tokens_col.split("."))
    bucket = hash_bucket(F.col(key_col), seed)
    win = (
        Window.partitionBy("shard")
        .orderBy(F.col("_bkt").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = F.col(tokens_col).cast("long")
    out = (
        df.withColumn("_bkt", bucket)
        .withColumn("shard", (F.col("_bkt") % shards).cast("long"))
        .withColumn("cum_tokens", F.sum(toks).over(win))
        # DIV = exact integer floor-division, matching the oracle's
        # `//`: a double `/` under floor() drifts one pack at
        # cum_tokens beyond 2^52, where ulp exceeds 1/budget
        .withColumn(
            "pack_first",
            F.expr(f"CAST((cum_tokens - CAST({toks_sql} AS BIGINT)) DIV {budget} AS BIGINT)"),
        )
        .withColumn(
            "pack_last",
            # greatest() guards the zero-token edge (cum-1 falls in the
            # previous pack when a boundary was just crossed)
            F.greatest(
                F.expr(f"CAST((cum_tokens - 1) DIV {budget} AS BIGINT)"),
                F.col("pack_first"),
            ),
        )
        .drop("_bkt")
    )
    return out
