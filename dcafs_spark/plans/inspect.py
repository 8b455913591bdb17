"""Executed-plan inspection shared by the scan-budget gate
(tests/test_plans_engine.py::test_write_path_scan_budget) and its
budget generator (scripts/scan_budget_audit.py).

One measurement, two consumers: run the query through a noop WRITE
(AQE exchange reuse does not fire under writes, unlike collect — the
round-8 finding the gate exists for), take the FINAL post-AQE plan
text, and count FileScans per base table. Keeping this in one place is
what makes the committed budget table and the enforcing test
measure the same thing by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BASE_TABLES = (
    "lineitem", "orders", "customer", "supplier", "part",
    "nation", "region", "events", "documents", "embeddings",
)


def executed_write_plan(df: DataFrame) -> str:
    """Noop-write the frame and return the final (post-AQE) plan text."""
    df.write.format("noop").mode("overwrite").save()
    return (
        df._jdf.queryExecution().executedPlan().toString().split("+- == Initial Plan ==")[0]
    )


def table_scan_counts(plan: str) -> dict[str, int]:
    """FileScan count per base table in a plan text (0s included)."""
    return {t: plan.count(f"{t}.parquet") for t in BASE_TABLES}
