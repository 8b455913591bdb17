"""Round-14 optimization profiler: split each query's bench second into
driver-side plan-BUILD time (the ``fn(spark, sf_dir)`` call — py4j
traffic, index-build collects, literal assembly) and EXECUTION time
(noop write of the built frame), over 3 reps after an sf0.001 warmup.

Usage: python scripts/r14_profile.py [query ...]   (default: top names)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from dcafs_spark import get_spark
    from dcafs_spark.queries import QUERIES

    names = sys.argv[1:]
    spark = get_spark("r14_profile")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        fn = QUERIES[n][0]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    out: dict[str, dict] = {}
    for n in names:
        fn = QUERIES[n][0]
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            reps.append((round(t1 - t0, 3), round(t2 - t1, 3)))
            spark.sparkContext._jvm.System.gc()
        out[n] = {
            "build": [r[0] for r in reps],
            "exec": [r[1] for r in reps],
            "best_total": round(min(b + e for b, e in reps), 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
