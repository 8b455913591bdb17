"""Runtime-portability gate for the events TIMESTAMP(NANOS) column.

Spark changed how it loads INT64 TIMESTAMP(NANOS) parquet across minor
versions (bigint via legacy ``nanosAsLong`` conf on <=4.0, TIMESTAMP_NTZ
on 4.1+). ``ts_to_ns`` must normalize every variant to the exact raw-ns
bigint + µs timestamp pair. This test loads the real events.parquet under
the *installed* Spark and asserts exact values against DuckDB, so a Spark
upgrade that changes the read type fails loudly here instead of zeroing
every events-based query (the round-3 failure mode).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from dcafs_spark.queries import _events, ts_to_ns

SF_DIR = "/root/testdata/sf0.001"


def test_events_ts_ns_exact_vs_duckdb(spark):
    ev = _events(spark, SF_DIR)
    dt = dict(ev.dtypes)
    assert dt["ts_ns"] == "bigint"
    assert dt["ts"] == "timestamp"
    r = ev.selectExpr(
        "min(ts_ns) AS mn",
        "max(ts_ns) AS mx",
        "sum(cast(ts_ns % 1000 != 0 AS int)) AS sub_us_residue",
        "count(*) AS n",
    ).collect()[0]
    mn, mx, n = duckdb.sql(
        f"SELECT min(epoch_ns(ts)), max(epoch_ns(ts)), count(*) "
        f"FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    assert r.sub_us_residue == 0  # generator data has no sub-µs component
    assert (r.mn, r.mx, r.n) == (mn, mx, n)


def test_events_ts_matches_ts_ns(spark):
    # ts (µs timestamp) must be exactly ts_ns truncated to µs, row by row.
    ev = _events(spark, SF_DIR)
    bad = ev.filter(F.unix_micros("ts") != F.expr("ts_ns DIV 1000")).count()
    assert bad == 0


@pytest.mark.parametrize("kind", ["bigint", "timestamp_ntz", "timestamp"])
def test_ts_to_ns_all_runtime_shapes(spark, kind):
    """Synthesize each dtype Spark has ever produced for this column and
    check ts_to_ns normalizes all three identically."""
    ns = 1704067798778549000  # first-row-magnitude instant, µs-aligned
    base = spark.range(1).select(F.lit(ns).alias("raw"))
    if kind == "bigint":
        df = base.select(F.col("raw").alias("ts"))
    elif kind == "timestamp_ntz":
        df = base.select(
            F.expr(
                "timestampadd(MICROSECOND, raw DIV 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00') AS ts"
            )
        )
    else:
        df = base.select(F.timestamp_micros(F.expr("raw DIV 1000")).alias("ts"))
    out = ts_to_ns(df)
    row = out.select("ts_ns", F.unix_micros("ts").alias("us")).collect()[0]
    assert row.ts_ns == ns
    assert row.us == ns // 1000


def test_ntz_branch_is_session_tz_independent(spark):
    """The NTZ normalization must not depend on spark.sql.session.timeZone
    (the driver's harness session may not pin UTC)."""
    ns = 1704067798778549000
    orig = spark.conf.get("spark.sql.session.timeZone")
    vals = {}
    try:
        for tz in ("UTC", "Asia/Tokyo", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.range(1).select(
                F.expr(
                    f"timestampadd(MICROSECOND, {ns} DIV 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00') AS ts"
                )
            )
            row = ts_to_ns(df).select("ts_ns", F.unix_micros("ts").alias("us")).collect()[0]
            vals[tz] = (row.ts_ns, row.us)
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    assert set(vals.values()) == {(ns, ns // 1000)}
