"""Scale rungs for the round-13 URL tier (domain_profile /
domain_capped_sample / url_filter) — SCALE.md evidence that each op's
wall time is linear in corpus size.

Inflation: shifted-doc_id union of the sf0.01 documents table (the
scale_probe convention). The domain-flavored synthetic URLs ride
doc_id arithmetic, so the registered-domain population (55 eTLD+1s)
and per-domain dup density stay constant with factor — the rungs
stress row volume through the narrow canonicalize/eTLD+1 maps, the
domain rollup, and the bounded_topk quota prune (whose stage-1 state
grows with rows-per-domain-per-partition, the documented bound).

Run isolated: python scripts/round13_tier_probe.py [factors...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dcafs_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [4, 16, 64, 256]
    spark = get_spark("round13_tier_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = base.count()

    from dcafs_spark.operators.urls import (
        domain_capped_sample,
        domain_profile,
        url_filter,
    )
    from dcafs_spark.queries import _synth_url_domains_spark

    def inflate(f: int):
        parts = [
            base.select((F.col("doc_id") + F.lit(i * n0)).alias("doc_id"))
            for i in range(f)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return (
            out.select("doc_id", _synth_url_domains_spark().alias("url"))
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint()
        )

    ops = {
        "domain_profile": lambda d: domain_profile(d, "url", "doc_id"),
        # k=100 so the quota does real pruning at every factor
        "domain_capped_sample": lambda d: domain_capped_sample(
            d, "url", "doc_id", k=100
        ),
        "url_filter": lambda d: url_filter(
            d,
            "url",
            blocked_domains=["brand3.co.uk", "brand7.com", "brand1.net"],
            blocked_path_rules=[r"^/p/3$"],
        ),
    }

    small = inflate(1)
    for fn in ops.values():
        fn(small).write.format("noop").mode("overwrite").save()

    results: dict = {}
    for f in factors:
        d = inflate(f)
        d.count()
        row = {}
        for name, fn in ops.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 2)
        results[f"{f}x ({f * n0})"] = row
        print(f, json.dumps(row), flush=True)
        d.unpersist()
    print(json.dumps({"base_docs": n0, "rungs": results}))


if __name__ == "__main__":
    main()
