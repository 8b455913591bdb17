"""PSL-scale registered-domain probe (r13 verdict ask #2).

Two questions, measured:

1. Where does the literal CASE chain (`registered_domain`, one
   anchored regexp_extract + When per rule) actually break? The
   documented unrolling hazard says fully-unrolled expression trees
   past ~1000 terms fall out of whole-stage codegen; the real Mozilla
   public-suffix list is ~9k rules. We time the chain at growing rule
   counts on a FIXED row count — plan-build + execution both inflate.

2. Does the broadcast-join path (`with_registered_domain(mode=
   'broadcast')` — last-1..4-label candidates against the rule table)
   stay flat at 9k rules while rows scale 4×→256×?

Run isolated (no co-resident Spark JVM):
    python scripts/round14_psl_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_N = 500  # sf0.01 documents row count


def synth_rules(n: int) -> list[str]:
    """~Mozilla-shaped synthetic PSL: 1/6 single-label, ~72% 2-label,
    the rest 3-label."""
    n1 = n // 6
    n3 = n // 9
    n2 = n - n1 - n3
    return (
        [f"tld{i}" for i in range(n1)]
        + [f"co{i}.ztld{i % 40}" for i in range(n2)]
        + [f"a{i}.b{i}.ztri{i % 10}" for i in range(n3)]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from dcafs_spark import get_spark
    from dcafs_spark.operators.urls import with_registered_domain

    spark = get_spark("psl_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def hosts(n_rows: int, rules: list[str]):
        """Every 3rd host hits a 2-label rule, every 3rd a 1-label
        rule, the rest miss — forcing all chain arms to evaluate."""
        n2 = sum(1 for r in rules if r.count(".") == 1) or 1
        n1 = sum(1 for r in rules if "." not in r) or 1
        return spark.range(n_rows).select(
            F.expr(
                f"CASE id % 3 WHEN 0 THEN concat('www.site', id, '.co', id % {n2}, '.ztld', (id % {n2}) % 40) "
                f"WHEN 1 THEN concat('site', id, '.tld', id % {n1}) "
                f"ELSE concat('site', id, '.example') END"
            ).alias("host")
        )

    def bench(df, mode, rules):
        t0 = time.perf_counter()
        out = with_registered_domain(df, "host", suffixes=rules, mode=mode)
        t_build = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return t_build, best

    print("== leg 1: CASE chain vs rule count (fixed 8,000 rows) ==")
    print("rules  build_s  exec_s")
    for n_rules in (5, 128, 256, 384, 512, 1024):
        rules = synth_rules(n_rules) if n_rules > 5 else None
        from dcafs_spark.operators.urls import PUBLIC_SUFFIXES_SAMPLE

        r = rules or PUBLIC_SUFFIXES_SAMPLE
        try:
            tb, te = bench(hosts(8000, r), "case", r)
            print(f"{n_rules:5d}  {tb:7.2f}  {te:6.2f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — the failure IS the result
            print(f"{n_rules:5d}  FAILED: {type(exc).__name__}: {str(exc)[:120]}", flush=True)

    print("== leg 2: broadcast path, 9,000 rules, rows 4x..256x ==")
    rules9k = synth_rules(9000)
    print("factor   rows  build_s  exec_s")
    for factor in (4, 16, 64, 256):
        n = BASE_N * factor
        tb, te = bench(hosts(n, rules9k), "broadcast", rules9k)
        print(f"{factor:6d}  {n:5d}  {tb:7.2f}  {te:6.2f}", flush=True)

    print("== leg 3: CASE chain at 9,000 rules (the infeasibility check, 8,000 rows) ==")
    try:
        tb, te = bench(hosts(8000, rules9k), "case", rules9k)
        print(f" 9000  {tb:7.2f}  {te:6.2f}")
    except Exception as exc:  # noqa: BLE001 — the failure IS the result
        print(f" 9000  FAILED: {type(exc).__name__}: {str(exc)[:200]}")


if __name__ == "__main__":
    main()
