"""Round-15 suite-pressure probe (r14 verdict item 4): bm25_score reads
0.47 s isolated but 1.85 s in-suite, source_boilerplate 0.93 vs 2.23 —
the warm-suite gap is the largest unexplained term in the catalog
total. This probe attributes it: measure the victim queries in a fresh
JVM, then run the first N catalog queries to accumulate suite state,
then re-measure the victims — sampling, around every timed rep:

  - JIT code cache occupancy (CodeHeap pools, used vs max) — a full
    code cache stops/starves compilation and hot paths run interpreted
  - metaspace / heap usage
  - cumulative GC time and count (collection time charged INSIDE the
    rep is the victim's GC tax)
  - JIT total compilation time (rising during a rep = recompiles)

Usage: python scripts/r15_suite_pressure_probe.py [n_suite_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VICTIMS = ("bm25_score", "source_boilerplate", "part_supplier_variety", "text_repetition")


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out: dict[str, float] = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or name in ("Metaspace", "Compressed Class Space"):
            u = p.getUsage()
            out[f"pool:{name}:used_mb"] = round(u.getUsed() / 1048576.0, 1)
            out[f"pool:{name}:max_mb"] = round(u.getMax() / 1048576.0, 1)
    gcs = mf.getGarbageCollectorMXBeans().iterator()
    t, n = 0, 0
    while gcs.hasNext():
        g = gcs.next()
        t += g.getCollectionTime()
        n += g.getCollectionCount()
    out["gc_ms_total"] = t
    out["gc_count"] = n
    out["jit_ms_total"] = mf.getCompilationMXBean().getTotalCompilationTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = round(heap.getUsed() / 1048576.0, 1)
    return out


def time_victims(spark, QUERIES, label: str, reps: int = 3):
    for name in VICTIMS:
        fn = QUERIES[name][0]
        best, best_delta = float("inf"), {}
        for _ in range(reps):
            s0 = jvm_stats(spark)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            s1 = jvm_stats(spark)
            if dt < best:
                best = dt
                best_delta = {
                    "gc_ms": s1["gc_ms_total"] - s0["gc_ms_total"],
                    "gc_n": s1["gc_count"] - s0["gc_count"],
                    "jit_ms": s1["jit_ms_total"] - s0["jit_ms_total"],
                }
        s = jvm_stats(spark)
        code_used = sum(v for k, v in s.items() if "CodeHeap" in k and "used" in k)
        code_max = sum(v for k, v in s.items() if "CodeHeap" in k and "max" in k)
        print(
            f"[{label}] {name:22s} best {best:6.3f}s  gc {best_delta.get('gc_ms', 0)}ms/"
            f"{best_delta.get('gc_n', 0)}  jit +{best_delta.get('jit_ms', 0)}ms  "
            f"codecache {code_used:.0f}/{code_max:.0f}MB  "
            f"meta {s.get('pool:Metaspace:used_mb')}MB  heap {s['heap_used_mb']}MB",
            flush=True,
        )


def main():
    n_suite = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from dcafs_spark import get_spark
    from dcafs_spark.queries import QUERIES

    spark = get_spark("r15_pressure_probe")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    for name in VICTIMS:  # codegen warmup, as the bench does
        QUERIES[name][0](spark, warm).write.format("noop").mode("overwrite").save()
    print("baseline (fresh JVM, victims only):", flush=True)
    time_victims(spark, QUERIES, "fresh")
    names = [n for n in QUERIES if n not in VICTIMS][:n_suite]
    print(f"running {len(names)} suite queries to accumulate state...", flush=True)
    t0 = time.perf_counter()
    for name in names:
        QUERIES[name][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.sparkContext._jvm.System.gc()
    print(f"suite pass done in {time.perf_counter() - t0:.0f}s", flush=True)
    time_victims(spark, QUERIES, f"after{len(names)}")
    spark.stop()


if __name__ == "__main__":
    main()
