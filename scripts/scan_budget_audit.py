"""Measure executed-write-plan FileScan counts per base table for EVERY
registered query → /tmp/scan_budget_audit.json.

This is the generator for the full-catalog scan-budget gate in
tests/test_plans_engine.py: the committed budget table is this audit's
output, reviewed by hand (every >1 count carries a reason or gets
fixed). Gate and audit IMPORT the same measurement
(dcafs_spark/plans/inspect.py) — they cannot drift apart.

Usage: python scripts/scan_budget_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dcafs_spark import get_spark
    from dcafs_spark.queries import QUERIES

    spark = get_spark("scan_budget_audit")
    spark.sparkContext.setLogLevel("ERROR")
    from dcafs_spark.plans.inspect import executed_write_plan, table_scan_counts

    out: dict[str, dict[str, int]] = {}
    for name, (fn, _sql) in QUERIES.items():
        counts = table_scan_counts(executed_write_plan(fn(spark, sf_dir)))
        out[name] = {t: c for t, c in counts.items() if c > 0}
        print(name, out[name], flush=True)
    with open("/tmp/scan_budget_audit.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    multi = {n: c for n, c in out.items() if any(v > 1 for v in c.values())}
    print(f"\n{len(out)} queries audited; {len(multi)} with a >1 scan count:")
    for n, c in sorted(multi.items()):
        print(" ", n, c)


if __name__ == "__main__":
    main()
