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
        # try_element_at: a ragged vector (shorter than dim) yields NULL
        # components → NULL projection for THAT row, instead of an
        # ANSI INVALID_ARRAY_INDEX error killing the whole corpus scan
        # (DuckDB's v[i] indexing is NULL OOB too, so engines agree)
        return F.aggregate(
            didx,
            F.lit(0.0),
            lambda acc, i: acc
            + F.try_element_at(vec, (i + 1).cast("int")).cast("double")
            * F.element_at(flat, j * dim + i + 1),
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
    consumes.

    Degenerate inputs yield NULL summaries instead of garbage or a
    job abort: a non-finite component (NaN/Inf from a bad upstream
    normalization) makes the quantized code NULL via try_cast (under
    ANSI mode a plain cast would kill the whole corpus pass); an empty
    or NULL vector returns NULL summaries. The NULL-code case is
    detected through q_sum (addition propagates NULL) and then ALL
    summaries are nulled together — least/greatest SKIP NULL
    arguments, so without that gate a NaN vector would emit the fold's
    impossible (q_min=127, q_max=-127) sentinel range and a partial
    q_nnz as if they were real statistics."""
    vec = F.col(vec_col)
    maxabs = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.when(maxabs > 0, F.lit(127.0) / maxabs).otherwise(F.lit(1.0))
    # ONE fold: higher-order functions run interpreted (no codegen CSE),
    # so naive per-stat folds re-evaluate the scale fold per ELEMENT —
    # O(dim^2) work per row (measured 11.6 s vs 0.8 s at sf0.1). The
    # scale lives in the aggregate's zero, which Catalyst evaluates
    # once per row; the merge then touches each component once.
    zero = F.struct(
        scale.alias("s"),
        F.lit(0).cast("long").alias("q_sum"),
        F.lit(127).cast("long").alias("q_min"),
        F.lit(-127).cast("long").alias("q_max"),
        F.lit(0).cast("long").alias("q_nnz"),
        F.lit(0).cast("long").alias("q_sq"),
    )

    def merge(acc, x):
        q = F.round(x.cast("double") * acc.getField("s")).try_cast("long")
        return F.struct(
            acc.getField("s").alias("s"),
            (acc.getField("q_sum") + q).alias("q_sum"),
            F.least(acc.getField("q_min"), q).alias("q_min"),
            F.greatest(acc.getField("q_max"), q).alias("q_max"),
            (acc.getField("q_nnz") + F.when(q != 0, 1).otherwise(0)).alias("q_nnz"),
            (acc.getField("q_sq") + q * q).alias("q_sq"),
        )

    st = F.aggregate(vec, zero, merge)
    nonempty = F.size(vec) > 0  # NULL vec → NULL size → NULL outputs
    # q_sum NULL ⟺ some quantized code was NULL (a non-finite
    # component): null every summary together, not just the sums
    valid = nonempty & st.getField("q_sum").isNotNull()

    def out(field: str) -> Column:
        return F.when(valid, st.getField(field))

    return df.select(
        *[c for c in df.columns if c != vec_col],
        out("q_sum").alias("q_sum"),
        out("q_min").alias("q_min"),
        out("q_max").alias("q_max"),
        out("q_nnz").alias("q_nnz"),
        out("q_sq").alias("q_sq_sum"),
    )
