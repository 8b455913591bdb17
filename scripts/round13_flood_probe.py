"""Boilerplate-flood probe for paragraph_dedup (r12 verdict ask #6).

The round-12 rung table inflated by REPLICATION (every paragraph
corpus-frequent — the all-boilerplate extreme). The case that rung
does not cover is the crawl's template-header corpus: ONE paragraph
present in ~50% of documents while everything else is unique. That
makes the corpus-frequency join's chash a single hot key — after
`per`(doc, chash) shuffles on chash, half the corpus's rollup rows
land in one partition.

This probe synthesizes exactly that corpus at increasing scale and
measures `paragraph_dedup_stats` wall time (noop write, best-of-2)
flood vs no-flood, so the SCALE.md table gets a flood rung like
minhash's. Factors are multiples of the sf0.01 doc count (500).

Run isolated (no co-resident Spark JVM):
    python scripts/round13_flood_probe.py 4 16 64 256
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
    from dcafs_spark.operators.dedup import paragraph_dedup_stats

    factors = [int(a) for a in sys.argv[1:]] or [4, 16]
    spark = get_spark("flood_probe")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = " ".join(f"boil{i}" for i in range(20))

    def corpus(n_docs: int, flood: bool):
        """3 unique 20-word paragraphs per doc; with `flood`, every
        even doc_id is prefixed with THE one boilerplate paragraph
        (50% incidence → one hot chash)."""
        uniq = (
            "concat_ws(' ', "
            + ", ".join(
                f"concat_ws(' ', transform(sequence(0, 19),"
                f" i -> concat('d', id, 'p{p}w', i)))"
                for p in range(3)
            )
            + ")"
        )
        df = spark.range(n_docs).select(
            F.col("id").alias("doc_id"), F.expr(uniq).alias("body")
        )
        if flood:
            df = df.select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(F.lit(boiler + " "), F.col("body")),
                )
                .otherwise(F.col("body"))
                .alias("text"),
            )
        else:
            df = df.select("doc_id", F.col("body").alias("text"))
        return df.repartition(32)

    print("factor  n_docs   no_flood_s  flood_s  ratio")
    for f in factors:
        n = BASE_N * f
        row = [f, n]
        for flood in (False, True):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                paragraph_dedup_stats(
                    corpus(n, flood), chunk_words=20, min_docs=3
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row.append(round(best, 2))
            spark.sparkContext._jvm.System.gc()
        ratio = round(row[3] / row[2], 2) if row[2] else float("nan")
        print(f"{row[0]:>6} {row[1]:>7}   {row[2]:>9} {row[3]:>8}  {ratio:>5}")
    spark.stop()


if __name__ == "__main__":
    main()
