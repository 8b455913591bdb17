"""Does AQE exchange reuse fire under a noop WRITE on Spark 4.1.2?

Round-8 recorded "no" (Spark 3.x-era) and the scan-budget gate counted
initial-plan FileScans on that basis. This probe re-measures on 4.1.2
by reading each write's executed plan graph from the UI REST API and
counting scan nodes that actually produced rows:

  control      two different filters over one scan  -> 2 scans execute
  same-prune   one aggregate consumed twice, same
               pruned columns                        -> 1 scan executes
  diff-prune   one aggregate, consumers prune
               different columns                     -> 2 scans execute

Conclusion (measured 2026-08-17, Spark 4.1.2): reuse fires under
writes exactly as under collect — for subtrees identical after column
pruning. dcafs_spark/plans/inspect.py therefore counts scans in the
write's FINAL executed plan (captured via QueryExecutionListener), not
the initial plan.

Usage: python scripts/r14_write_reuse_probe.py
"""

from __future__ import annotations

import json
import time
import urllib.request

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    spark = (
        SparkSession.builder.appName("r14_write_reuse_probe")
        .master("local[8]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    def run(tag, df):
        spark.sparkContext.setJobDescription(tag)
        df.write.format("noop").mode("overwrite").save()

    a = docs.where("n_chars > 0").groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    b = docs.where("n_chars >= 0").groupBy("lang").agg(F.avg("n_chars").alias("m"))
    run("control", a.join(b, "lang"))

    agg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    run("same-prune", agg.crossJoin(agg.agg(F.sum("c").alias("t"))))

    agg2 = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("c"), F.avg("n_chars").alias("m")
    )
    run("diff-prune", agg2.select("lang", "c").join(agg2.select("lang", "m"), "lang"))

    time.sleep(2)
    appid = spark.sparkContext.applicationId
    url = (
        f"http://localhost:4049/api/v1/applications/{appid}/sql"
        "?details=true&planDescription=false&length=100"
    )
    for ex in json.load(urllib.request.urlopen(url)):
        nodes = ex.get("nodes", [])
        scans = [n for n in nodes if n["nodeName"].startswith("Scan parquet")]
        executed = 0
        for n in scans:
            m = {mm["name"]: mm["value"] for mm in n.get("metrics", [])}
            if m.get("number of output rows") not in (None, "0", ""):
                executed += 1
        print(
            f"id={ex['id']} desc={ex.get('description', '')[:40]!r} "
            f"scan_nodes={len(scans)} scans_executed={executed}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
