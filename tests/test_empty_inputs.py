"""Degenerate-input robustness: every registered query must run (not
crash) on fully EMPTY tables. Empty partitions are routine at scale —
a filter that matches nothing upstream, a new hive partition, a
just-bootstrapped store — and window/fold/explode plans have
empty-input edge paths (array_max of [], percentile of no rows,
broadcast of an empty dim) that only this shape exercises."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcafs_spark.queries import QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}),
            str(out / f"{t}.parquet"),
        )
    return str(out)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as exc:  # collect all, report once
            failures.append(f"{name}: {str(exc).splitlines()[0][:160]}")
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)
