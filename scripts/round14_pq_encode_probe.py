"""PQ-encode throughput probe: Catalyst expression vs Arrow/numpy
(r13 verdict ask #3).

The ivfpq rungs showed `pq_code`'s interpreted-HOF argmin is the one
linear stage (~19k vectors/s on 32 threads at the 256×/128k rung) —
fine for query-side codes, not for a 100 TB ingest-side encode. This
probe measures both engines of `pq_encode` (identity-pinned byte-equal
by tests/test_dedup_similarity.py) on perturbed-copy inflations of the
fixture embeddings, noop write, best-of-2.

Run isolated:
    python scripts/round14_pq_encode_probe.py 4 16 64 256
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from dcafs_spark import get_spark
    from dcafs_spark.operators.similarity import pq_codebooks_fixed, pq_encode

    factors = [int(a) for a in sys.argv[1:]] or [4, 16, 64, 256]
    spark = get_spark("pq_encode_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("v")
    )
    n_base = base.count()
    books = pq_codebooks_fixed(64, 8, 16, seed=7)

    print("factor    vecs  expr_s  arrow_s  expr_v/s  arrow_v/s  speedup")
    for factor in factors:
        df = (
            base.crossJoin(spark.range(factor).select(F.col("id").alias("rep")))
            .select(
                (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
                F.transform(
                    "v", lambda x: x + F.col("rep").cast("double") * 1e-3
                ).alias("v"),
            )
            .repartition(32)
        )
        # materialize the inflation to parquet so BOTH engines time the
        # encode against a plain scan, not the crossJoin lineage
        tmp = f"/tmp/pq_encode_probe_{factor}"
        df.write.mode("overwrite").parquet(tmp)
        df = spark.read.parquet(tmp)
        n = n_base * factor
        res = {}
        for eng in ("expr", "arrow"):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                pq_encode(df, "v", books, quantize_micro=True, engine=eng).select(
                    "vec_id", "code"
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            res[eng] = best
        print(
            f"{factor:6d}  {n:6d}  {res['expr']:6.2f}  {res['arrow']:7.2f}"
            f"  {n/res['expr']:8.0f}  {n/res['arrow']:9.0f}"
            f"  {res['expr']/res['arrow']:6.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
