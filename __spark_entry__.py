"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query at sf0.001 (smoke check).
queries()     — name → callable(spark, sf_dir) -> DataFrame, one per
                implemented operator family (SURVEY.md §2 + LLM-data
                extensions).
oracle_sql()  — name → equivalent DuckDB SQL on the same parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dcafs_spark.queries import QUERIES, q_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
