"""Similarity search over embedding columns (array<float>).

Two paths, both partition-parallel:

* brute-force cosine top-k — the correctness baseline. Queries are
  broadcast (they're small by definition); the corpus streams through
  one narrow map computing dot/norms with `zip_with`+`aggregate`
  (JVM-side, codegen), then per-query top-k via window rank. On a
  cluster this is one corpus scan, no corpus shuffle: the only shuffle
  is (n_queries × k) candidate rows into the final rank.

* LSH-bucketed (random hyperplanes) — the 100 TB path. A deterministic
  seeded set of H hyperplanes maps each vector to an H-bit bucket;
  probing compares only same-bucket (or neighboring-bucket) vectors.
  Bucketing is a narrow map; the per-bucket join key is uniform.

An IVF variant (k-means coarse quantizer) would slot in the same shape:
assign → equi-join on centroid id → rerank. Centroid training uses
sampled data; kept out of round 1.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Brute-force cosine top-k of corpus rows per query row.

    `queries` is broadcast — never do this with a large query set;
    split it and union instead."""
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(query_vec_col)))
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (pure-python RNG → reproducible
    across engines; embedded as plan literals, broadcast implicitly)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """H-bit bucket id: bit j = sign(dot(vec, plane_j)) ≥ 0."""
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec.cast("array<double>"), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's LSH
    bucket. Recall improves with multi-probe (neighboring buckets at
    hamming 1) — round-2 extension."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(query_vec_col), lsh_bucket(F.col(query_vec_col), planes).alias("bucket")
        )
    )
    scored = c.join(q, "bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
