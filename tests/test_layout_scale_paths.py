"""Scale-path utilities: clustered writes (file skipping) and sketch
approximations standing in for exact aggregates at 100 TB."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from dcafs_spark.sinks.layout import write_clustered


class TestClusteredWrite:
    def test_files_have_disjoint_key_ranges(self, spark, sf_dir, tmp_path):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = str(tmp_path / "clustered")
        write_clustered(
            ev, out, cluster_by=["user_id"], sort_by=["event_id"], n_files=4
        )
        files = sorted(glob.glob(out + "/part-*.parquet"))
        assert len(files) >= 2
        spans = []
        for f in files:
            mm = (
                spark.read.parquet(f)
                .agg(F.min("user_id"), F.max("user_id"))
                .first()
            )
            if mm[0] is not None:
                spans.append((mm[0], mm[1]))
        spans.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, "cluster key ranges overlap across files"

    def test_within_file_sorted(self, spark, sf_dir, tmp_path):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = str(tmp_path / "sorted")
        write_clustered(ev, out, cluster_by=["user_id"], sort_by=["event_id"], n_files=2)
        for f in sorted(glob.glob(out + "/part-*.parquet")):
            rows = spark.read.parquet(f).select("user_id", "event_id").collect()
            keys = [(r[0], r[1]) for r in rows]
            assert keys == sorted(keys), "rows not sorted within file"

    def test_scan_prunes_files(self, spark, sf_dir, tmp_path):
        """A selective key predicate over the clustered layout must not
        read every file: parquet row-group stats + file skipping."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = str(tmp_path / "pruned")
        write_clustered(ev, out, cluster_by=["user_id"], n_files=4)
        lo = ev.agg(F.min("user_id")).first()[0]
        q = spark.read.parquet(out).filter(F.col("user_id") == lo)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id" in plan
        assert q.count() == ev.filter(F.col("user_id") == lo).count()

    def test_hive_partitioning(self, spark, sf_dir, tmp_path):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = str(tmp_path / "hive")
        write_clustered(
            ev, out, cluster_by=["user_id"], partition_by=["event_type"], n_files=2
        )
        dirs = glob.glob(out + "/event_type=*")
        assert len(dirs) >= 2
        back = spark.read.parquet(out)
        assert back.count() == ev.count()


class TestApproxSketches:
    def test_approx_distinct_within_rsd(self, spark, sf_dir):
        """The scale path for distinct_counts: HLL++ at rsd=2% must land
        within 3x rsd of the exact per-type user counts."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
        }
        approx = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
            .collect()
        }
        for k, n in exact.items():
            assert abs(approx[k] - n) <= max(3, 0.06 * n), (k, n, approx[k])

    def test_approx_percentile_brackets_exact(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ex, ap = docs.agg(
            F.expr("percentile(n_chars, 0.9)").alias("ex"),
            F.expr("approx_percentile(n_chars, 0.9, 10000)").alias("ap"),
        ).first()
        assert abs(ap - ex) <= 0.05 * max(ex, 1)
