"""dcafs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vlizBE/dcafs (streaming sensor ETL:
collect → alter → forward → store), re-expressed Spark-first.

Architecture (see SURVEY.md):
  * everything compiles to DataFrame / Column expressions so Catalyst
    optimizes (pushdown, pruning, codegen); Python UDFs only where the
    semantics genuinely can't be expressed (exotic date patterns, CRC16
    over binary), and then always Arrow-batched pandas UDFs;
  * dcafs "paths" (filter → math → editor chains over delimited text
    lines) become composed DataFrame transformations (plans.dsl);
  * the realtime value store (rtvals) becomes a groupBy aggregation /
    stateful streaming query (store.rtvals);
  * LLM-data-pipeline extensions (dedup, similarity search, multimodal
    columns, text analysis) live in operators.* and are designed
    partition-parallel for 100 TB (no driver-side state, no collect).
"""

from dcafs_spark.session import ensure_parallelism, get_spark, load_tables


def engine(*args, **kwargs):
    """Convenience: build an Engine (lazy import keeps `import
    dcafs_spark` light for bench/test startup)."""
    from dcafs_spark.engine import Engine

    return Engine(*args, **kwargs)

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
