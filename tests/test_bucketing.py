"""Bucketed co-located joins: the shuffle-elimination technique for
repeated large-fact joins at 100 TB.

Writing both fact tables bucketed+sorted on the join key lets Spark
sort-merge-join them with ZERO Exchange — each bucket pair joins in
place. At scale this converts the dominant cost of a fact-fact join
(shuffling both sides) into a scan-local merge, amortized across every
downstream query that joins on the same key.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li_b"))
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord_b"))
        .mode("overwrite")
        .saveAsTable("ord_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path so the bucket co-location is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # buckets align: no shuffle either side
        # and the result is still correct
        n = joined.count()
        expect = (
            spark.table("li_b")
            .join(F.broadcast(spark.table("ord_b")), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert n == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


def test_bucketed_aggregate_skips_exchange(spark, bucketed_tables):
    # groupBy on the bucket key: partial+final agg without a shuffle
    df = spark.table("li_b").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() > 0
