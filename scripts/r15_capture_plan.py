"""Capture `.explain("formatted")` for the named queries into
plans/r15/<query>_<tag>.txt.

Usage: python scripts/r14_capture_plan.py <repo_root> <tag> <query> ...
(run with repo_root=/tmp/r14_before for the baseline tree, /root/repo
for the optimized tree; output always lands in /root/repo/plans/r15/)
"""

from __future__ import annotations

import os
import sys

root, tag = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, root)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r15"


def main() -> None:
    from dcafs_spark import get_spark
    from dcafs_spark.queries import QUERIES

    spark = get_spark("r15_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for n in names:
        fn = QUERIES[n][0]
        df = fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{n}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(n, "->", f"{n}_{tag}.txt")


if __name__ == "__main__":
    main()
