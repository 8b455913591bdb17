"""Scale rungs for the round-12 catalog tier (url_dedup /
quality_classifier / paragraph_dedup) — SCALE.md evidence that each
op's wall time is linear in corpus size.

Inflation: the sf0.01 documents table unioned with itself with shifted
doc_ids (the scale_probe convention). Shifted ids extend the synthetic
URL population at a constant ~50%-duplicate density (the dup structure
rides doc_id arithmetic, so density does not degenerate with factor);
texts replicate verbatim, so at ≥4× every paragraph is corpus-frequent
— the boilerplate-flood worst case for paragraph_dedup, which its
per-(doc,chash) rollup must absorb linearly (nothing in the op is
pairwise).

Run: python scripts/round12_tier_probe.py [factors...]
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
    spark = get_spark("round12_tier_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = base.count()

    from dcafs_spark.operators.dedup import paragraph_dedup_stats
    from dcafs_spark.operators.textan import linear_quality_score
    from dcafs_spark.operators.urls import url_dedup
    from dcafs_spark.queries import _quality_weights, _synth_url_spark

    def inflate(f: int):
        parts = [
            base.select((F.col("doc_id") + F.lit(i * n0)).alias("doc_id"), "text", "source")
            for i in range(f)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.repartition(spark.sparkContext.defaultParallelism).localCheckpoint()

    ops = {
        "url_dedup": lambda d: url_dedup(
            d.select("doc_id", _synth_url_spark().alias("url")), "url", "doc_id"
        ),
        "quality_classifier": lambda d: linear_quality_score(
            d.select("doc_id", "source", "text"), _quality_weights(), bias=0.25, threshold=0.7492
        ).select("doc_id", "score", "kept"),
        "paragraph_dedup": lambda d: paragraph_dedup_stats(
            d.select("doc_id", "text"), chunk_words=20, min_docs=3
        ),
    }

    # codegen warmup at 1x
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
