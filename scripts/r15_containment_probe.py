"""Round-15 containment_pairs probe (r14 verdict item 5): measure
(a) sketch-key skew on the self-join key `bk` — occupancy histogram,
    top buckets, and each bucket's candidate-pair contribution
    c·(c−1)/2 — to decide whether hot-bucket handling is warranted;
(b) where the query's wall time goes: sketch+candidates vs the exact
    array_intersect verify, via staged noop writes;
(c) whether broadcasting the (16-byte/row) candidate pair set into the
    two verify joins beats the SMJ the planner picks off unknown
    LogicalRDD stats.

Usage: python scripts/r15_containment_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from dcafs_spark import get_spark
    from dcafs_spark.operators.dedup import (
        COLLAPSE_RATIO,
        approx_distinct_ratio,
        _qcol,
        _sql_word_shingles,
        normalize_text,
        shingle_hashes,
    )
    from dcafs_spark.queries import _near_dup_corpus
    from dcafs_spark.runtime import checkpoint

    spark = get_spark("r15_containment_probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = _near_dup_corpus(spark, SF_DIR)
    collapse = (
        approx_distinct_ratio(df, F.md5(normalize_text(F.col("text")))) < COLLAPSE_RATIO
    )
    print("collapse mode:", collapse, flush=True)
    sketch_k, threshold = 16, 0.9
    base = df.select(
        F.col("doc_id").alias("id"),
        F.md5(normalize_text(F.col("text"))).alias("chash"),
        shingle_hashes(_sql_word_shingles(_qcol("text"), 3)).alias("sh"),
    ).transform(checkpoint)
    key = "chash" if collapse else "id"
    rep = (
        base.groupBy("chash").agg(F.first("sh").alias("sh"))
        .select("chash", "sh", F.slice(F.array_sort("sh"), 1, sketch_k).alias("_bk"))
        .transform(checkpoint, eager=True)
        if collapse
        else base.select("id", "sh", F.slice(F.array_sort("sh"), 1, sketch_k).alias("_bk"))
        .transform(checkpoint, eager=True)
    )
    n_docs = rep.count()
    sk = rep.select(key, F.explode("_bk").alias("bk"))
    occ = sk.groupBy("bk").agg(F.count(F.lit(1)).alias("c"))
    stats = occ.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("c").alias("max_occ"),
        F.expr("percentile(c, 0.5)").alias("p50"),
        F.expr("percentile(c, 0.99)").alias("p99"),
        F.sum(F.expr("c * (c - 1) / 2")).alias("cand_pairs_with_dups"),
    ).first()
    print(
        f"docs(sketched)={n_docs} buckets={stats['n_buckets']} max_occ={stats['max_occ']} "
        f"p50={stats['p50']} p99={stats['p99']} sum c(c-1)/2={int(stats['cand_pairs_with_dups'])}",
        flush=True,
    )
    top = occ.orderBy(F.desc("c")).limit(10).collect()
    print("top-10 buckets:", [(r["bk"], r["c"]) for r in top], flush=True)

    # stage timings
    def t(fn, label, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:34s} {best:6.3f}s", flush=True)
        return best

    def cand_frame():
        s = rep.select(key, F.explode("_bk").alias("bk"))
        return (
            s.alias("l")
            .join(
                s.alias("r"),
                (F.col("l.bk") == F.col("r.bk")) & (F.col(f"l.{key}") < F.col(f"r.{key}")),
            )
            .select(F.col(f"l.{key}").alias("a"), F.col(f"r.{key}").alias("b"))
            .distinct()
        )

    ov = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.least(F.size("sh_a"), F.size("sh_b")),
        4,
    )

    def verify(cand):
        j = cand.join(
            rep.select(F.col(key).alias("a"), F.col("sh").alias("sh_a")), "a"
        ).join(rep.select(F.col(key).alias("b"), F.col("sh").alias("sh_b")), "b")
        return j.select("a", "b", ov.alias("overlap")).filter(F.col("overlap") >= threshold)

    t(cand_frame, "candidates (sketch self-join)")
    cand_ck = cand_frame().transform(checkpoint, eager=True)
    print("n candidates:", cand_ck.count(), flush=True)
    t(lambda: verify(cand_ck), "verify from ckpt cand (SMJ)")
    t(lambda: verify(F.broadcast(cand_ck)), "verify from ckpt cand (BC cand)")
    t(lambda: verify(cand_frame()), "cand+verify fused")
    spark.stop()


if __name__ == "__main__":
    main()
