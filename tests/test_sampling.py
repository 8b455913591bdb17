"""Deterministic hash sampling (operators/sampling.py)."""

from pyspark.sql import functions as F

from dcafs_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_sample,
    train_test_split,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")), (F.col("id") % 3 + 1).cast("int")).alias("lang"),
    )


def test_hash_sample_fraction_and_determinism(spark):
    df = _docs(spark)
    a = hash_sample(df, 0.3, "doc_id", seed=1)
    ids1 = {r["doc_id"] for r in a.collect()}
    # deterministic: same result after a repartition
    ids2 = {r["doc_id"] for r in hash_sample(df.repartition(13), 0.3, "doc_id", seed=1).collect()}
    assert ids1 == ids2
    assert 0.25 < len(ids1) / 2000 < 0.35
    # different seed → different (but overlapping) sample
    ids3 = {r["doc_id"] for r in hash_sample(df, 0.3, "doc_id", seed=2).collect()}
    assert ids3 != ids1


def test_stratified_fractions(spark):
    df = _docs(spark, 3000)
    out = stratified_sample(df, {"en": 0.5, "de": 0.1}, "lang", "doc_id").groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in out.collect()}
    assert "fr" not in counts  # absent stratum dropped
    assert 0.4 < counts["en"] / 1000 < 0.6
    assert 0.05 < counts["de"] / 1000 < 0.16


def test_train_test_split_stable_under_growth(spark):
    small = _docs(spark, 500)
    big = _docs(spark, 2000)
    s = {r["doc_id"]: r["split"] for r in train_test_split(small, 0.2, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in train_test_split(big, 0.2, "doc_id").collect()}
    assert all(b[k] == v for k, v in s.items())  # old keys keep their split
    frac = sum(1 for v in b.values() if v == "test") / 2000
    assert 0.15 < frac < 0.25


def test_bucket_matches_duckdb(spark):
    """The md5 bucket is engine-portable: DuckDB computes identical values."""
    import duckdb

    df = spark.range(100).select(F.col("id").alias("k"), hash_bucket(F.col("id"), 5).alias("b"))
    got = {r["k"]: r["b"] for r in df.collect()}
    con = duckdb.connect()
    sql = (
        "SELECT k, CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '#5'), 1, 15)) AS BIGINT)"
        " % 1000000 AS b FROM range(100) t(k)"
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
