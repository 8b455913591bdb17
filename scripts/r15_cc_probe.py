"""Round-15 CC probe: measure the connected_components round's
build-side job count and wall time on the real dedup_clusters pairs at
sf0.1, comparing the r14 form (lazy per-round checkpoint + separate
convergence count job, checkpointed initial labels) against the r15
candidates:

  A. r14 form (committed baseline)
  B. observe-fused convergence: per-round eager checkpoint carries an
     Observation that sums the chg flags — the convergence test rides
     the SAME action that materializes the round (no count job)
  C. B + initial-labels checkpoint dropped (its two round-1 consumers
     share the aggregate via AQE stage reuse instead)

Prints per-variant: wall seconds (min of N), Spark job count, result
row/cluster parity against variant A.

Usage: python scripts/r15_cc_probe.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Observation, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cc_a(pairs, checkpoint):
    """r14 committed form (copy of operators.dedup.connected_components)."""
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(checkpoint)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.first("src"), F.min("dst")).alias("label"))
        .withColumnRenamed("src", "node")
        .transform(checkpoint)
    )
    rounds = 0
    for _ in range(20):
        combined = edges.withColumn("_self", F.lit(None).cast("long")).unionByName(
            labels.select(
                F.col("node").alias("src"),
                F.col("label").alias("dst"),
                F.col("label").alias("_self"),
            )
        )
        stepped = (
            combined.join(
                labels.withColumnRenamed("label", "dlabel"), combined.dst == F.col("node")
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("new_label"), F.min("_self").alias("_old"))
            .select(
                F.col("src").alias("node"),
                "new_label",
                (F.col("new_label") < F.col("_old")).alias("chg"),
            )
            .transform(checkpoint, require_cut=True)
        )
        changed = stepped.filter("chg").count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        rounds += 1
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster")), rounds


def cc_bc(pairs, checkpoint, ckpt_labels0: bool):
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(checkpoint)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.first("src"), F.min("dst")).alias("label"))
        .withColumnRenamed("src", "node")
    )
    if ckpt_labels0:
        labels = labels.transform(checkpoint)
    rounds = 0
    for _ in range(20):
        combined = edges.withColumn("_self", F.lit(None).cast("long")).unionByName(
            labels.select(
                F.col("node").alias("src"),
                F.col("label").alias("dst"),
                F.col("label").alias("_self"),
            )
        )
        obs = Observation()
        stepped = (
            combined.join(
                labels.withColumnRenamed("label", "dlabel"), combined.dst == F.col("node")
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("new_label"), F.min("_self").alias("_old"))
            .select(
                F.col("src").alias("node"),
                "new_label",
                (F.col("new_label") < F.col("_old")).alias("chg"),
            )
            .observe(obs, F.sum(F.col("chg").cast("long")).alias("chg"))
            .transform(checkpoint, require_cut=True, eager=True)
        )
        changed = int(obs.get["chg"] or 0)
        labels = stepped.select("node", F.col("new_label").alias("label"))
        rounds += 1
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster")), rounds


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from dcafs_spark import get_spark
    from dcafs_spark.operators.dedup import minhash_lsh_pairs
    from dcafs_spark.queries import _near_dup_corpus
    from dcafs_spark.runtime import checkpoint

    spark = get_spark("r15_cc_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def fresh_pairs():
        corpus = _near_dup_corpus(spark, SF_DIR)
        return minhash_lsh_pairs(
            corpus, shingle_n=3, num_hashes=16, bands=4, threshold=0.5
        )

    # warm everything once (codegen + page cache + the pairs pipeline)
    base_rows = sorted(
        tuple(r) for r in cc_a(fresh_pairs(), checkpoint)[0].collect()
    )
    variants = {
        "A_r14": lambda p: cc_a(p, checkpoint),
        "B_observe": lambda p: cc_bc(p, checkpoint, ckpt_labels0=True),
        "C_obs_nolbl0": lambda p: cc_bc(p, checkpoint, ckpt_labels0=False),
    }
    for name, fn in variants.items():
        best, jobs_best, rounds = float("inf"), None, None
        for _ in range(reps):
            pairs = fresh_pairs()  # pairs build excluded from the timed region
            pairs = pairs.transform(checkpoint, eager=True)
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            out, rounds = fn(pairs)
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            after = set(tracker.getJobIdsForGroup(None) or [])
            if dt < best:
                best, jobs_best = dt, len(after - before)
        rows = sorted(tuple(r) for r in fn(fresh_pairs())[0].collect())
        ok = rows == base_rows
        print(
            f"{name:14s} wall {best:6.3f}s  jobs {jobs_best}  rounds {rounds}  "
            f"rows==A: {ok}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
