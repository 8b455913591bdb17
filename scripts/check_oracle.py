"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count / column names / order-insensitive values.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_ORACLE_SF", "/root/testdata/sf0.01")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return repr(float(v)) if False else str(v)
    return str(v)


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main():
    import duckdb

    from dcafs_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    failures = []
    t_start = time.perf_counter()
    for name in wanted:
        t_q = time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                print(f"{name:24s} rows={len(srows)} (no oracle — rows-only)")
                continue
            # Materialize the oracle through Arrow like the driver does —
            # fetchall() hides type coercions the driver sees (DuckDB
            # HUGEINT -> float64, the round-3..5 sessionize red), while
            # pandas .df() over-coerces (nullable int64 -> float64, which
            # the driver does NOT do). Arrow matches the driver: HUGEINT
            # downcasts, nullable ints stay ints.
            dtab = con.execute(oracles[name]).fetch_arrow_table()
            dcols = list(dtab.column_names)
            drows = [tuple(r[c] for c in dcols) for r in dtab.to_pylist()]
            sh, slines = table_digest(scols, [[r[c] for c in scols] for r in srows])
            dh, dlines = table_digest(dcols, drows)
            ok_cols = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            ok_hash = sh == dh
            status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
            dt = time.perf_counter() - t_q
            print(
                f"{name:24s} {status}  rows {len(srows)}/{len(drows)} cols={'=' if ok_cols else f'{scols} vs {dcols}'} hash={'=' if ok_hash else '≠'}  {dt:6.2f}s"
            )
            if status == "FAIL":
                failures.append(name)
                sset, dset = set(slines), set(dlines)
                only_s = sorted(sset - dset)[:3]
                only_d = sorted(dset - sset)[:3]
                for ln in only_s:
                    print(f"   spark-only: {ln[:160]}")
                for ln in only_d:
                    print(f"   duck-only : {ln[:160]}")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:300]}")
    total = time.perf_counter() - t_start
    print(f"\n{len(wanted) - len(failures)}/{len(wanted)} matched  ({total:.1f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
