"""Layout-optimized batch writes: range-cluster + sort-within-files so
downstream scans can prune aggressively.

At 100 TB the dominant cost of a curated-corpus store is not the write
but every later scan. Writing with `repartitionByRange(cluster_keys)`
+ `sortWithinPartitions(sort_keys)` gives each parquet file a tight
min/max envelope on the cluster keys, so predicate pushdown skips
whole files (parquet row-group stats) and partition pruning skips
whole directories when `partition_by` is set. This is the Spark-native
equivalent of a clustered table — no custom format needed.

Reference scope: the reference's closest notion is the SQLite rollover
(src/util/database/SQLiteDB.java:306-335 — time-partitioned files);
this generalizes it to arbitrary cluster keys for the analytics store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    n_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write `df` range-clustered on `cluster_by`.

    - `cluster_by`: keys whose ranges should not overlap across files
      (range shuffle — one pass; sampled boundaries, so skew in the
      key does not skew file sizes the way hash-mod would).
    - `sort_by`: extra within-file ordering appended after the cluster
      keys (e.g. a timestamp for time-locality inside a key range).
    - `partition_by`: hive-style directory partitioning on LOW
      cardinality columns only (each value is a directory).
    - `n_files`: target file count; default leaves
      spark.sql.shuffle.partitions in charge (AQE coalesces).
    """
    out = (
        df.repartitionByRange(n_files, *cluster_by)
        if n_files
        else df.repartitionByRange(*cluster_by)
    )
    out = out.sortWithinPartitions(*cluster_by, *(sort_by or []))
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
