"""corpus_curation SCALE rungs (r13 verdict ask #4's scale evidence).

Shifted-id inflation of the sf0.01 documents (the crawl_curation rung
convention): each copy shifts doc_id by 1,000,000·copy, so the
synthetic URLs, damage pattern, and quality scores redistribute while
TEXT repeats across copies — paragraph boilerplate frequency grows
with the factor, which is exactly the corpus-repetition stress the
paragraph stage must absorb (the measured flood contract).

Run isolated:  python scripts/round14_curation_probe.py 4 16 64 256
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
    from dcafs_spark.queries import _corpus_curation_frame, _synth_url_domains_spark

    factors = [int(a) for a in sys.argv[1:]] or [4, 16, 64, 256]
    spark = get_spark("curation_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )

    def build(factor: int):
        """Perturbed-copy inflation (the content-sensitive convention
        from scale_probe.inflate_perturbed): salting every 3rd word per
        copy kills cross-copy paragraph identity — more DISTINCT
        documents at constant intra-corpus dup density, the realistic
        growth mode. A fresh frame per call so the lazy checkpoint is
        NOT reused between timed reps (the full scan-stage chain is
        inside every measurement)."""
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
        d = F.col("doc_id")
        docs = (
            base.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
                salted.alias("text"),
            )
            .repartition(32)
            .select(
                "doc_id",
                _synth_url_domains_spark().alias("url"),
                F.concat(
                    F.col("text"),
                    F.when(d % 7 == 0, F.lit(" b�d")).otherwise(F.lit("")),
                    F.when(d % 11 == 0, F.lit(" x\x01")).otherwise(F.lit("")),
                ).alias("text"),
            )
        )
        return _corpus_curation_frame(docs)

    print("factor    docs  wall_s  out_rows")
    for factor in factors:
        rows = build(factor).count()  # untimed warm/JIT pass
        best = float("inf")
        for _ in range(2):
            out = build(factor)  # fresh checkpoint every rep
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{factor:6d}  {BASE_N * factor:6d}  {best:6.2f}  {rows:8d}", flush=True)


if __name__ == "__main__":
    main()
