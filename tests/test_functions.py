"""Domain function library: ocean goldens, checksums, geo, bits, time."""

import math

import pytest
from pyspark.sql import functions as F

from dcafs_spark.functions.bits import bcd_to_int, hex_to_int, int_to_bcd, signed_nbit
from dcafs_spark.functions.checksum import crc16_modbus, nmea_checksum, nmea_checksum_ok
from dcafs_spark.functions.geo import bearing_deg, haversine_km, nmea_degrees, utm_from_gdc
from dcafs_spark.functions.ocean import salinity, sound_velocity, true_wind_dir, true_wind_speed
from dcafs_spark.functions.timefn import millisdate, redate


def one(spark, col, alias="r"):
    return spark.range(1).select(col.alias(alias)).first()[alias]


def test_salinity_standard_seawater(spark):
    # PSS-78 definition point: R=1 (C=4.2914 S/m), T=15 °C IPTS-68, P=0 → 35 PSU
    got = one(spark, salinity(F.lit(4.2914), F.lit(15.0 / 1.00024), F.lit(0.0)))
    assert got == pytest.approx(35.0, abs=1e-6)


def test_salinity_zero_conductivity(spark):
    assert one(spark, salinity(F.lit(0.0), F.lit(10.0), F.lit(0.0))) == 0.0


def test_sound_velocity_chen_millero(spark):
    # Chen & Millero check value: S=35, T=10 (ITS-68 10.0024/1.00024), P=100 dbar
    got = one(spark, sound_velocity(F.lit(35.0), F.lit(10.0 / 1.00024), F.lit(100.0)))
    assert got == pytest.approx(1490.55, abs=1.0)


def test_true_wind_zero_motion(spark):
    # stationary ship: true wind == apparent wind
    spd = one(spark, true_wind_speed(F.lit(10.0), F.lit(45.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)))
    assert spd == pytest.approx(10.0, abs=1e-4)
    d = one(spark, true_wind_dir(F.lit(10.0), F.lit(45.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)))
    assert d == pytest.approx(45.0, abs=0.1)


def test_nmea_checksum(spark):
    s = "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"
    assert one(spark, nmea_checksum(F.lit(s))) == "47"
    assert one(spark, nmea_checksum_ok(F.lit(s))) is True
    assert one(spark, nmea_checksum_ok(F.lit(s.replace("*47", "*48")))) is False


def test_crc16_modbus(spark):
    # classic modbus example frame 01 04 02 FF FF → CRC B8 80 (0x80B8)
    df = spark.createDataFrame([(bytearray([0x01, 0x04, 0x02, 0xFF, 0xFF]),)], "data binary")
    got = df.select(crc16_modbus(F.col("data")).alias("c")).first()["c"]
    assert got == 0x80B8


def test_crc16_catalyst_matches_pandas_udf(spark):
    """The Catalyst table-fold and the pandas-UDF oracle agree on
    random frames, and the plan contains no Python eval."""
    from dcafs_spark.functions.checksum import crc16_modbus_pandas

    import random

    rnd = random.Random(7)
    frames = [bytearray(rnd.randrange(256) for _ in range(rnd.randrange(1, 40))) for _ in range(50)]
    frames.append(bytearray())  # empty frame → init value 0xFFFF
    df = spark.createDataFrame([(f,) for f in frames], "data binary")
    out = df.select(
        crc16_modbus(F.col("data")).alias("native"),
        crc16_modbus_pandas(F.col("data")).alias("oracle"),
    ).collect()
    assert all(r["native"] == r["oracle"] for r in out)
    plan = df.select(crc16_modbus(F.col("data")))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_haversine_bearing(spark):
    # Paris → London ≈ 344 km, initial bearing ≈ 330°
    d = one(spark, haversine_km(F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)))
    assert d == pytest.approx(344, abs=3)
    b = one(spark, bearing_deg(F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)))
    assert b == pytest.approx(330, abs=2)


def test_nmea_degrees(spark):
    got = one(spark, nmea_degrees(F.lit(4807.038), F.lit("N")))
    assert got == pytest.approx(48.1173, abs=1e-4)
    got = one(spark, nmea_degrees(F.lit(4807.038), F.lit("S")))
    assert got == pytest.approx(-48.1173, abs=1e-4)


def test_utm_known_point(spark):
    # Ghent ≈ 51.05N, 3.73E → zone 31U, E≈551k N≈5655k
    st = one(spark, utm_from_gdc(F.lit(51.05), F.lit(3.7303)))
    assert st["zone"] == 31
    assert st["easting"] == pytest.approx(551000, abs=2000)
    assert st["northing"] == pytest.approx(5656000, abs=2000)


def test_signed_bits(spark):
    assert one(spark, signed_nbit(F.lit(0xFF), 8)) == -1
    assert one(spark, signed_nbit(F.lit(0x7F), 8)) == 127
    assert one(spark, signed_nbit(F.lit(0x800), 12)) == -2048
    assert one(spark, signed_nbit(F.lit(0x3FF), 10)) == -1


def test_bcd_hex(spark):
    assert one(spark, bcd_to_int(F.lit(0x25))) == 25
    assert one(spark, int_to_bcd(F.lit(25))) == 0x25
    assert one(spark, hex_to_int(F.lit("0x1A2B"))) == 0x1A2B
    assert one(spark, hex_to_int(F.lit("ff"))) == 255


def test_redate_millisdate(spark):
    got = one(spark, redate(F.lit("16:25:12"), "HH:mm:ss", "HH.mm"))
    assert got == "16.25"
    got = one(spark, redate(F.lit("2024-01-02"), "yyyy-MM-dd", "dd/MM/yyyy"))
    assert got == "02/01/2024"
    got = one(spark, millisdate(F.lit("1704153600000"), "yyyy-MM-dd"))
    assert got == "2024-01-02"


class TestBinaryRegisters:
    def test_byte_and_word_decode(self, spark):
        from dcafs_spark.functions.bits import byte_at, s16_be, u16_be, u16_le

        df = spark.createDataFrame([(bytes([0x12, 0xFF, 0x80, 0x01]),)], "b binary")
        row = df.select(
            byte_at(F.col("b"), 1).alias("b1"),
            u16_be(F.col("b"), 1).alias("ube"),
            s16_be(F.col("b"), 3).alias("sbe"),
            u16_le(F.col("b"), 1).alias("ule"),
        ).first()
        assert row["b1"] == 0x12
        assert row["ube"] == 0x12FF
        assert row["sbe"] == -(0x10000 - 0x8001)  # 0x8001 signed
        assert row["ule"] == 0x12 + 0xFF * 256


class TestSqliteUpsert:
    def test_upsert_idempotent_retry(self, spark, tmp_path):
        import sqlite3

        from dcafs_spark.sinks.db import SqliteSink

        db = str(tmp_path / "u.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v REAL)")
        con.commit(); con.close()
        sink = SqliteSink(db, "t", create=False, key_cols=["id"])
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double")
        sink.write_batch(df)
        sink.write_batch(df)  # replayed micro-batch: no dupes, no errors
        df2 = spark.createDataFrame([(2, 9.0)], "id int, v double")
        sink.write_batch(df2)  # update wins
        con = sqlite3.connect(db)
        assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 2
        assert con.execute("SELECT v FROM t WHERE id=2").fetchone()[0] == 9.0
        assert sink.dead_letter == []
        con.close()


def test_lrc_checksum(spark):
    from dcafs_spark.functions.checksum import lrc_checksum

    # sum('010300000002') % 256 = 0x46 → two's complement BA
    assert one(spark, lrc_checksum(F.lit("010300000002"))) == "BA"
    assert one(spark, lrc_checksum(F.lit(""))) == "00"
    # python replica on arbitrary text
    s = "$CTD01,16:25:12,12.9"
    exp = f"{(256 - sum(ord(c) for c in s) % 256) % 256:02X}"
    assert one(spark, lrc_checksum(F.lit(s))) == exp


def test_file_md5(spark, tmp_path):
    import hashlib

    from dcafs_spark.functions.checksum import file_md5

    (tmp_path / "a.bin").write_bytes(b"hello dcafs")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01\x02")
    out = {r["path"].split("/")[-1]: (r["length"], r["md5"]) for r in file_md5(spark, str(tmp_path)).collect()}
    assert out["a.bin"] == (11, hashlib.md5(b"hello dcafs").hexdigest())
    assert out["b.bin"] == (3, hashlib.md5(b"\x00\x01\x02").hexdigest())


def test_haversine_antipodal_clamped(spark):
    """FP error near antipodes pushes the haversine term past 1.0 —
    asin must see a clamped value, not return NaN (round-10 review:
    reproduced NaN at a ~20015 km pair)."""
    d = one(
        spark,
        haversine_km(
            F.lit(61.89854752150677), F.lit(97.0020683850554),
            F.lit(-61.89854752141772), F.lit(-82.99793161523547),
        ),
    )
    assert not math.isnan(d)
    assert abs(d - math.pi * 6371.0088) < 1.0  # antipodal distance = pi * R


def test_utm_zone_antimeridian_wraps(spark):
    from dcafs_spark.functions.geo import utm_zone

    assert one(spark, utm_zone(F.lit(180.0))) == 1  # not the invalid 61
    assert one(spark, utm_zone(F.lit(179.9))) == 60
    assert one(spark, utm_zone(F.lit(-180.0))) == 1


def test_geofence_state_null_propagates(spark):
    from dcafs_spark.functions.geo import geofence_state

    df = spark.createDataFrame([(1.0,), (30.0,), (None,)], "d double")
    got = [r["s"] for r in df.select(geofence_state(F.col("d"), 25.0).alias("s")).collect()]
    assert got == ["INSIDE", "OUTSIDE", None]  # NULL fix ≠ OUTSIDE
