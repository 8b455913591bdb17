"""Differential tests: every declared query hash-matches its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01).

Driver-faithful in two ways that plain `fetchall()` is not:

* The oracle materializes through **Arrow** (`fetch_arrow_table`), the
  same path the driver uses. `fetchall()` silently coerces DuckDB's
  HUGEINT (int128, e.g. `sum(BIGINT)`) to a Python int that hashes like
  an int, while the driver's Arrow path downcasts it to float64 — the
  exact divergence that kept sessionize locally green but driver-red in
  rounds 3–5. (pandas `.df()` over-coerces the other way: nullable
  int64 → float64, which the driver does NOT do.)
* A **type-parity guard** runs for every oracle entry before the value
  hash: no HUGEINT/UHUGEINT/unparameterized-DECIMAL oracle output
  column (those reach Arrow as int128/float64 surprises), and each
  column's DuckDB type class must pair with the Spark dtype class
  (int↔int, float↔float, decimal↔decimal, …) — an int64-vs-float64
  pair hashes differently even when the values are numerically equal.
"""

import hashlib
import math
import re

import duckdb
import pytest

from dcafs_spark.queries import QUERIES
from dcafs_spark.session import TABLES

# ---------------------------------------------------------------- type guard

_FORBIDDEN_DUCK = ("HUGEINT", "UHUGEINT")

_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "BOOLEAN": "bool", "VARCHAR": "str",
    "DATE": "date", "TIME": "time",
}

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "boolean": "bool", "string": "str",
    "date": "date",
}


def _duck_class(t: str) -> str:
    t = str(t).upper()
    if t in _FORBIDDEN_DUCK:
        return "forbidden"
    if t.startswith("DECIMAL"):
        return "decimal" if "(" in t else "forbidden"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if "[" in t or t.startswith(("LIST", "STRUCT", "MAP")):
        return "nested"
    return _DUCK_CLASS.get(t, f"other:{t}")


def _spark_class(t: str) -> str:
    t = str(t).lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith(("array", "struct", "map")):
        return "nested"
    return _SPARK_CLASS.get(t, f"other:{t}")


def assert_type_parity(spark_dtypes, duck_cols, duck_types):
    """Fail if the oracle emits a driver-coercing type or if any column's
    type class differs between engines (value-hash poison either way)."""
    duck_by_col = dict(zip(duck_cols, [str(t) for t in duck_types]))
    spark_by_col = dict(spark_dtypes)
    for col, dt in duck_by_col.items():
        dc = _duck_class(dt)
        assert dc != "forbidden", (
            f"oracle column {col!r} has driver-coercing type {dt} — "
            f"CAST it (e.g. sum(int) AS BIGINT) in the oracle SQL"
        )
        if col in spark_by_col:
            sc = _spark_class(spark_by_col[col])
            assert sc == dc, (
                f"type-class mismatch on {col!r}: spark "
                f"{spark_by_col[col]} ({sc}) vs duckdb {dt} ({dc})"
            )


# ---------------------------------------------------------------- comparison


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
    # type parity first: a class mismatch explains any later hash diff
    rel = duck.sql(sql)
    assert_type_parity(sdf.dtypes, list(rel.columns), list(rel.types))
    # materialize through Arrow — the driver's path (see module docstring)
    dtab = duck.execute(sql).fetch_arrow_table()
    dcols = list(dtab.column_names)
    drows = [[rec[c] for c in dcols] for rec in dtab.to_pylist()]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _digest(scols, srows) == _digest(dcols, drows)


def test_guard_catches_uncast_hugeint(duck):
    """An uncast sum(BIGINT) produces HUGEINT — the exact class of oracle
    bug that stayed locally green while driver-red in rounds 3–5. The
    guard must reject it before any value comparison runs."""
    rel = duck.sql("SELECT sum(o_orderkey) AS s FROM orders")
    assert str(rel.types[0]).upper() == "HUGEINT"  # DuckDB contract
    with pytest.raises(AssertionError, match="driver-coercing"):
        assert_type_parity([("s", "bigint")], list(rel.columns), list(rel.types))


def test_guard_catches_int_float_pairing(duck):
    """int64 on one engine vs float64 on the other hashes differently
    even for equal values; the guard must flag the pairing."""
    rel = duck.sql("SELECT CAST(1 AS BIGINT) AS x")
    with pytest.raises(AssertionError, match="type-class mismatch"):
        assert_type_parity([("x", "double")], list(rel.columns), list(rel.types))


def test_registry_sql_has_no_bare_integer_sum():
    """Static sweep: every oracle SQL that sums an integer-looking column
    must wrap it (CAST ... AS BIGINT / sum over an expression). This is a
    lint, not the real guard (the typed guard above runs per query) —
    it exists so a new bare sum(int_col) fails fast with a message
    naming the query, without needing the differential run."""
    bare = re.compile(r"(?<![a-z_])sum\(\s*[a-z_]*(?:key|count|id)\s*\)", re.I)
    offenders = []
    for name, (_fn, sql) in QUERIES.items():
        if not sql:
            continue
        for m in bare.finditer(sql):
            prefix = sql[max(0, m.start() - 5) : m.start()].upper()
            if not prefix.endswith("CAST("):
                offenders.append((name, m.group(0)))
    assert offenders == [], f"bare integer sum in oracle SQL: {offenders}"
