from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dcafs_spark import get_spark

    s = get_spark("dcafs_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def lines_df(spark):
    """Raw sensor-line fixture (FIXTURES.md A1/A2 shapes)."""
    rows = [
        ("$CTD01,16:25:12,12.941,38.45,1017.3,8", "ctd", 1),
        ("$CTD01,16:25:13,13.102,38.41,1017.1,8", "ctd", 2),
        ("$CTD01,16:25:14,,38.45,1017.3,8", "ctd", 3),  # empty field
        ("$CTD01,16:25:15,junk,38.45,1017.3,8", "ctd", 4),  # bad number
        ("$CTD01,16:25:16,12.5", "ctd", 5),  # too few fields
        ("$GPS01,16:25:12,51.2,3.4", "gps", 6),
        ("noise", "ctd", 7),
    ]
    return spark.createDataFrame(rows, "value string, origin string, event_id int")
