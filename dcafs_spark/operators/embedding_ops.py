"""Embedding-column transforms for training-data pipelines: JL random
projection (dimensionality reduction) and per-vector int8 quantization.

Both are pure narrow maps — no shuffle, no Python in the row path:
the projection planes ride as one flat literal array (implicit
broadcast) and every per-component reduction is a Catalyst
`aggregate` fold, so the whole operator stays inside whole-stage
codegen and scales embarrassingly with the corpus. At 100 TB these
run at scan speed; the only wide ops downstream (if any) are what the
caller adds.

Reference scope note: the reference engine (vlizBE/dcafs) has no
vector surface at all — these extend the engine for the LLM-curation
workload the brief adds on top of SURVEY §2.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dcafs_spark.operators.similarity import dlit_array


def projection_planes(dim: int, k: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian projection planes scaled by 1/sqrt(k)
    (Johnson-Lindenstrauss: E[||Px||^2] = ||x||^2). Pure-python RNG so
    the identical literals can be embedded in the DuckDB oracle."""
    rng = random.Random(seed)
    s = 1.0 / math.sqrt(k)
    return [[rng.gauss(0.0, 1.0) * s for _ in range(dim)] for _ in range(k)]


def project(vec: Column, planes: list[list[float]]) -> list[Column]:
    """k dot products against a shared flat plane literal; one
    sequential fold per output dim (same accumulation order as
    DuckDB's list_dot_product, so 6dp-rounded values match)."""
    k, dim = len(planes), len(planes[0])
    flat = dlit_array([x for p in planes for x in p])
    didx = F.sequence(F.lit(0), F.lit(dim - 1))

    def dot(j: int) -> Column:
        return F.aggregate(
            didx,
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(vec, i + 1).cast("double") * F.element_at(flat, j * dim + i + 1),
        )

    return [dot(j) for j in range(k)]


def random_projection(
    df: DataFrame, vec_col: str = "embedding", k: int = 8, seed: int = 7, dim: int = 64
) -> DataFrame:
    """Reduce `vec_col` to k dims; appends p0..p{k-1} (6dp-rounded)."""
    planes = projection_planes(dim, k, seed)
    cols = project(F.col(vec_col), planes)
    return df.select(
        *[c for c in df.columns if c != vec_col],
        *[F.round(c, 6).alias(f"p{j}") for j, c in enumerate(cols)],
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127/max|x|,
    q_i = round(x_i * scale). Emits only INTEGER summaries (q_sum,
    q_min, q_max, q_nnz, q_sq_sum) so the result is bit-exact across
    engines — double multiply and HALF_UP/away-from-zero round are
    IEEE-identical in Spark and DuckDB, and integer folds can't drift.
    In production the codes themselves would be packed to binary; the
    summaries are what a quality gate (clip rate, sparsity, energy)
    consumes."""
    vec = F.col(vec_col)
    didx = F.sequence(F.lit(1), F.size(vec))
    maxabs = F.aggregate(
        didx, F.lit(0.0), lambda acc, i: F.greatest(acc, F.abs(F.element_at(vec, i).cast("double")))
    )
    scale = F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(1.0))
    q = F.transform(didx, lambda i: F.round(F.element_at(vec, i).cast("double") * scale).cast("long"))

    def fold(init, fn):
        return F.aggregate(q, init, fn)

    return df.select(
        *[c for c in df.columns if c != vec_col],
        fold(F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        fold(F.lit(127).cast("long"), lambda a, x: F.least(a, x)).alias("q_min"),
        fold(F.lit(-127).cast("long"), lambda a, x: F.greatest(a, x)).alias("q_max"),
        fold(F.lit(0).cast("long"), lambda a, x: a + F.when(x != 0, 1).otherwise(0)).alias("q_nnz"),
        fold(F.lit(0).cast("long"), lambda a, x: a + x * x).alias("q_sq_sum"),
    )
