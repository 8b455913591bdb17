"""SCALE rungs for the round-14 gates: dup_span_stats (ExactSubstr
span coalescing) and lm_ppl_filter (CCNet held-out perplexity).

Perturbed-copy inflation of the sf0.01 documents (the
scale_probe.inflate_perturbed convention): salting every 3rd word per
copy kills cross-copy 8-token window identity (every window contains
>=1 salted word) and grows the token vocabulary ~linearly — more
DISTINCT documents at constant intra-corpus dup density, the
realistic growth mode. The doc_id shift is 1,000,000·copy, a multiple
of 10, so the lm_ppl train slice (doc_id % 10 == 0) keeps a constant
10% share across factors.

Run isolated:  python scripts/round14_spans_ppl_probe.py 4 16 64 256
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_N = 500  # sf0.01 documents row count


def main() -> None:
    from pyspark.sql import functions as F

    from dcafs_spark import get_spark
    from dcafs_spark.operators.dedup import dup_span_stats
    from dcafs_spark.queries import _lm_ppl_frame

    factors = [int(a) for a in sys.argv[1:]] or [4, 16, 64, 256]
    spark = get_spark("spans_ppl_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )

    def build(factor: int):
        """Fresh frame per call so lazy checkpoints are rebuilt inside
        every timed rep (the round14_curation_probe convention)."""
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        words = F.split(F.col("text"), " ")
        salted = F.array_join(
            F.transform(
                words,
                lambda w, i: F.when(
                    (i % 3 == F.lit(0)) & (F.col("copy") > 0),
                    F.concat(w, F.lit("~"), F.col("copy").cast("string")),
                ).otherwise(w),
            ),
            " ",
        )
        return (
            base.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
                salted.alias("text"),
            )
            .repartition(32)
        )

    probes = {
        "dup_span_stats": lambda d: dup_span_stats(d, window_words=8),
        "lm_ppl_filter": lambda d: _lm_ppl_frame(d),
    }
    print("probe            factor    docs  wall_s  out_rows")
    for name, fn in probes.items():
        for factor in factors:
            rows = fn(build(factor)).count()  # untimed warm/JIT pass
            best = float("inf")
            for _ in range(2):
                out = fn(build(factor))
                t0 = time.perf_counter()
                out.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(
                f"{name:16s} {factor:6d}  {BASE_N * factor:6d}  {best:6.2f}  {rows:8d}",
                flush=True,
            )


if __name__ == "__main__":
    main()
