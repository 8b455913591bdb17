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


def _corpus(spark):
    """Two-dialect corpus: target docs speak 'alpha...' vocabulary,
    off-target docs 'zeta...' — and one off-target doc written in the
    target dialect, which DSIR must score target-like."""
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta " * 5, "en"))
    for i in range(40, 80):
        rows.append((i, "zeta eta theta iota " * 5, "de"))
    rows.append((80, "alpha beta gamma delta " * 5, "de"))  # ringer
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_importance_separates_distributions(spark):
    from dcafs_spark.operators.sampling import dsir_importance

    df = _corpus(spark)
    out = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_importance(df, F.col("lang") == "en").collect()
    }
    assert len(out) == 81
    assert all(out[i] > 0 for i in range(40))  # target-vocab docs score up
    assert all(out[i] < 0 for i in range(40, 80))  # off-target score down
    # the ringer is judged by its TOKENS, not its label: target-like
    assert out[80] > 0
    # deterministic under repartitioning (integer micro-nat rollup)
    again = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_importance(df.repartition(7), F.col("lang") == "en").collect()
    }
    assert again == out


def test_weighted_priority_sample_props(spark):
    from dcafs_spark.operators.sampling import weighted_priority_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        # ids < 100 carry 50x the weight of the rest; id 999 weight 0
        F.when(F.col("id") < 100, 500).when(F.col("id") == 999, 0).otherwise(10).alias("w"),
    )
    got = weighted_priority_sample(df, "w", 50, key_col="doc_id", seed=3).collect()
    assert len(got) == 50
    ids = {r["doc_id"] for r in got}
    assert 999 not in ids  # zero weight never sampled
    # heavy rows (10% of rows, ~85% of mass) dominate the sample
    heavy = sum(1 for i in ids if i < 100)
    assert heavy > 25
    # deterministic: same rows after repartition, priorities identical
    again = weighted_priority_sample(df.repartition(11), "w", 50, key_col="doc_id", seed=3)
    assert {r["doc_id"] for r in again.collect()} == ids
    # scale shape: top-k must be TakeOrdered, not a global sort
    out = weighted_priority_sample(df, "w", 50, key_col="doc_id", seed=3)
    assert "TakeOrderedAndProject" in out._jdf.queryExecution().executedPlan().toString()


def test_temperature_mix_flattens(spark, sf_dir):
    from dcafs_spark.queries import QUERIES

    rows = {
        r["lang"]: r for r in QUERIES["temperature_mix"][0](spark, sf_dir).collect()
    }
    n = {k: r["n_docs"] for k, r in rows.items()}
    hi, lo = max(n, key=n.get), min(n, key=n.get)
    # τ<1 flattens: dominant language downweighted, rare upweighted
    assert rows[hi]["weight_ppm"] < 1_000_000 < rows[lo]["weight_ppm"]
    # shares are a distribution up to floor truncation + presence floor
    assert sum(r["q_ppm"] for r in rows.values()) <= 1_000_000 + len(rows)
    # and preserve the ordering of the raw shares
    assert rows[hi]["q_ppm"] == max(r["q_ppm"] for r in rows.values())


def test_dsir_zero_token_docs_score_zero(spark):
    """NULL/empty/whitespace-only docs must come back as (0, 0), not
    vanish — a downstream inner join would otherwise silently drop
    them from the corpus (neither kept nor rejected)."""
    from dcafs_spark.operators.sampling import dsir_importance

    rows = [
        (0, "alpha beta gamma", "en"),
        (1, "", "de"),
        (2, "   ", "de"),
        (3, None, "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logw_micro"])
        for r in dsir_importance(df, F.col("lang") == "en").collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for i in (1, 2, 3):
        assert got[i] == (0, 0)
    assert got[0][0] == 3


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
