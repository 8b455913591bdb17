"""Math-expression compiler vs the reference's embedded self-test
constants (MathFab.test, MathFab.java:251-268) and operator semantics."""

import pytest
from pyspark.sql import functions as F

from dcafs_spark.functions.mathfab import compile_math


def _solve(spark, formula: str, fields: list[float]):
    expr = compile_math(formula)
    df = spark.range(1)
    col = expr.column(fields=lambda k: F.lit(fields[k]))
    return df.select(col.alias("r")).first()["r"]


def test_mathfab_golden_1(spark):
    # MathFab.java:252 — expects 12.80769231 (8-dp rounded)
    assert round(_solve(spark, "(15*i0)/65+3*i1", [10.0, 3.5]), 8) == 12.80769231


def test_mathfab_golden_2(spark):
    # MathFab.java:257
    assert _solve(spark, "(15+i0)^2-16*i1+16+25+36+58+i2/5", [5.0, 65.0, 86.0]) == pytest.approx(-487.8)


def test_mathfab_golden_3(spark):
    # MathFab.java:262 — unary minus after operator
    assert _solve(spark, "i0*-5", [5.0]) == -25


def test_precedence_and_functions(spark):
    assert _solve(spark, "2+3*4", []) == 14
    assert _solve(spark, "(2+3)*4", []) == 20
    assert _solve(spark, "2^3^2", []) == 512  # right-assoc
    assert _solve(spark, "10%3", []) == 1
    assert _solve(spark, "2~5", []) == 3  # absolute difference
    assert _solve(spark, "abs(0-4)", []) == 4
    assert _solve(spark, "cosd(60)", []) == pytest.approx(0.5)
    assert _solve(spark, "sind(30)", []) == pytest.approx(0.5)
    assert _solve(spark, "ln(1)", []) == 0
    assert _solve(spark, "sqrt(16)", []) == 4


def test_logic_ops(spark):
    assert _solve(spark, "i0 < 10 && i1 > 2", [5.0, 3.0]) is True
    assert _solve(spark, "i0 < 10 && i1 > 2", [5.0, 1.0]) is False
    assert _solve(spark, "i0 < 1 || i1 > 2", [5.0, 3.0]) is True
    assert _solve(spark, "(i0 < 1) !| (i1 > 2)", [0.0, 3.0]) is False  # xor


def test_constants_and_named_columns(spark):
    expr = compile_math("offset + i0 * gain")
    col = expr.column(fields=lambda k: F.lit(2.0), consts={"offset": 1.0, "gain": 10.0})
    assert spark.range(1).select(col.alias("r")).first()["r"] == 21.0


def test_max_field():
    assert compile_math("i0 + i5*i2").max_field == 5
    assert compile_math("1+2").max_field == -1


def test_scientific_notation_positive_exponent(spark):
    """'2e+3' must lex as one number (previously '2','e','+','3' — the
    'e' silently became a column ref or a parse error)."""
    from dcafs_spark.functions.mathfab import compile_math

    df = spark.createDataFrame([(1.0,)], "x double")

    def fields(i):
        return F.col("x")

    for formula, expect in [("i0+2e+3", 2001.0), ("i0*1.5e+2", 150.0), ("i0+2e-3", 1.002)]:
        got = df.select(compile_math(formula).column(fields).alias("r")).first()["r"]
        assert got == expect, (formula, got)
