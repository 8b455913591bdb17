"""dedup_simhash bimodality probe (r13 verdict ask #5).

The gate is a PURE narrow projection (simhash32's 32-term interpreted
fold over sf0.1 documents) — no join, no shuffle past the scan, so the
0.34 <-> 1.25 s in-suite flip on unchanged code cannot be a plan/AQE
flip. Candidates are process-state: GC pauses landing in the timed
window (accumulated suite state) or JIT deopt of the interpreted-HOF
hot path.

This probe replays the bench's late-suite conditions: every catalog
query once at sf0.1 in registry order, measuring dedup_simhash
(min-of-2, the bench convention) every 20 queries WITH JVM GC-time and
JIT-compilation-time deltas captured around each measurement, so a
slow reading is attributable in the same line that reports it.

Run isolated:  python scripts/round14_simhash_bimodal_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from dcafs_spark import get_spark

    spark = get_spark("simhash_probe")
    spark.sparkContext.setLogLevel("ERROR")
    from dcafs_spark.queries import QUERIES

    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def gc_ms():
        return sum(
            b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans()
        )

    def jit_ms():
        return mf.getCompilationMXBean().getTotalCompilationTime()

    def heap_mb():
        return mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() // (1 << 20)

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = QUERIES["dedup_simhash"][0]

    def measure(tag):
        best, worst = float("inf"), 0.0
        g0, j0 = gc_ms(), jit_ms()
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best, worst = min(best, dt), max(worst, dt)
        print(
            f"[{tag:>22}] best {best:6.3f}s worst {worst:6.3f}s  "
            f"gc +{gc_ms() - g0:5d}ms  jit +{jit_ms() - j0:5d}ms  heap {heap_mb()}MB",
            flush=True,
        )
        return best

    measure("fresh")
    names = [n for n in QUERIES if n != "dedup_simhash"]
    for i, name in enumerate(names):
        try:
            QUERIES[name][0](spark, sf).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"  !! {name}: {type(exc).__name__}", flush=True)
        if (i + 1) % 20 == 0:
            measure(f"after {i + 1} queries")
    measure("end of suite")
    measure("end of suite (again)")


if __name__ == "__main__":
    main()
