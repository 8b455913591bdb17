"""Comparison-grammar compiler vs the reference's documented semantics
(MathUtils.parseSingleCompareFunction, MathUtils.java:244-329)."""

import pytest
from pyspark.sql import functions as F

from dcafs_spark.functions.compare import compile_compare

CASES = [
    ("<50", [(42.0, True), (50.0, False), (55.0, False)]),
    (">30", [(42.0, True), (30.0, False)]),
    ("<=125.2", [(125.2, True), (125.3, False)]),
    ("==65", [(65.0, True), (64.0, False)]),
    ("!=5", [(5.0, False), (6.0, True)]),
    ("1<x<10", [(5.0, True), (1.0, False), (10.0, False)]),
    ("15<x<=25", [(25.0, True), (15.0, False), (26.0, False)]),
    ("above 1, below 10", [(5.0, True), (0.5, False), (12.0, False)]),
    ("above 1; below 10", [(5.0, True), (12.0, False)]),
    ("not below 5", [(5.0, True), (4.9, False)]),
    ("not above 10", [(10.0, True), (10.1, False)]),
    ("at least 7", [(7.0, True), (6.9, False)]),
    ("equals 10", [(10.0, True), (9.0, False)]),
    ("not 5", [(5.0, False), (4.0, True)]),
    ("between 20 and 50", [(30.0, True), (20.0, False), (50.0, False)]),
    ("not between 20 and 50", [(30.0, False), (20.0, True), (55.0, True)]),
    ("from 1 to 10", [(1.0, True), (9.99, True), (10.0, False)]),
    ("1 through 10", [(1.0, True), (10.0, True), (10.1, False)]),
    ("1-10", [(1.0, True), (10.0, True), (0.9, False)]),
    ("-5->15", [(-5.0, True), (15.0, True), (-6.0, False)]),
]


@pytest.mark.parametrize("spec,expectations", CASES)
def test_compare(spark, spec, expectations):
    pred = compile_compare(spec)
    vals = [v for v, _ in expectations]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["r"] for r in df.select(pred(F.col("x")).alias("r")).collect()]
    assert got == [e for _, e in expectations], f"{spec}: {got}"


def test_unparseable_raises():
    with pytest.raises(ValueError):
        compile_compare("wibble wobble")


def test_signed_exponent_and_leading_plus():
    """Round-11 review: the number token must accept sign-tolerant
    exponents and a leading + (same lexing as mathfab's r10 `2e+3`
    fix) — `<1.5e+4` previously failed to parse."""
    from dcafs_spark.functions.compare import compile_compare_py

    assert compile_compare_py("<1.5e+4")(14999.0)
    assert not compile_compare_py("<1.5e+4")(15001.0)
    assert compile_compare_py("at least +5")(5.0)
    assert compile_compare_py(">=-1e-2")(-0.005)
    assert compile_compare_py("between -1e+1 and 1e+1")(0.0)
    # bare ranges still parse with signed bounds
    assert compile_compare_py("-5--1")(-3.0)
    assert compile_compare_py("1-10")(10.0)
