"""Checksum column functions.

NMEA XOR checksum is a pure Catalyst expression (fold over the char
array — stays in codegen). CRC16/modbus needs byte-level loops, so it
ships as an Arrow-batched pandas UDF computed with a precomputed
256-entry table (vectorized per byte, not per bit).

Parity targets in the reference: `src/util/math/MathUtils.java:
1206-1235` (NMEA), `:1258-1297` (CRC16 modbus, poly 0xA001 reflected).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _xor_fold(body: Column) -> Column:
    # XOR-fold char codes; aggregate() keeps this inside Catalyst.
    chars = F.split(body, "")
    return F.aggregate(
        chars,
        F.lit(0),
        lambda acc, ch: F.when(F.length(ch) > 0, acc.bitwiseXOR(F.ascii(ch))).otherwise(acc),
    )


def nmea_checksum(sentence: Column) -> Column:
    """Two-hex-digit XOR checksum of everything between '$' and '*'
    (exclusive). If no '*' present, checksums everything after '$'."""
    body = F.regexp_extract(sentence, r"^\$?([^*]*)", 1)
    return F.lpad(F.upper(F.hex(_xor_fold(body))), 2, "0")


def nmea_checksum_ok(sentence: Column) -> Column:
    """True when the sentence's trailing *HH matches its computed
    checksum (reference rejects rows failing this in FilterForward's
    `nmea` rule, FilterForward.java:347)."""
    claimed = F.upper(F.regexp_extract(sentence, r"\*([0-9a-fA-F]{2})\s*$", 1))
    return (claimed != "") & (claimed == nmea_checksum(sentence))


def file_md5(spark, path: str):
    """MD5 per file (reference computes file digests for update
    verification, `src/util/tools/FileTools.java` / MathUtils MD5).
    Spark-first: the binaryFile source reads each file as one row —
    digests compute in parallel across executors, no driver I/O.
    Returns (path, length, md5)."""
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.col("path"),
            F.col("length"),
            F.lower(F.md5(F.col("content"))).alias("md5"),
        )
    )


def lrc_checksum(body: Column) -> Column:
    """LRC: two's complement of the byte sum, as two uppercase hex
    digits (Calculations.java:425-436) — pure Catalyst fold."""
    chars = F.split(body, "")
    s = F.aggregate(
        chars,
        F.lit(0),
        lambda acc, ch: F.when(F.length(ch) > 0, acc + F.ascii(ch)).otherwise(acc),
    )
    val = (F.lit(256) - (s % 256)) % 256
    return F.lpad(F.upper(F.hex(val)), 2, "0")


_CRC16_TABLE: list[int] | None = None


def _crc16_table() -> list[int]:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        table = []
        for byte in range(256):
            crc = byte
            for _ in range(8):
                crc = (crc >> 1) ^ 0xA001 if crc & 1 else crc >> 1
            table.append(crc)
        _CRC16_TABLE = table
    return _CRC16_TABLE


def crc16_modbus(data: Column) -> Column:
    """CRC16 (modbus poly 0xA001, init 0xFFFF) of a binary column,
    returned as an int — pure Catalyst, no Python in the path.

    Table-driven fold entirely in expressions: hex() renders the bytes,
    regexp_extract_all splits hex pairs, and aggregate() threads
    crc = (crc >> 8) XOR table[(crc XOR byte) & 0xFF] per byte with the
    256-entry table as a constant-folded literal array. The reference
    treats CRC16 as a first-class stream op (ModbusStream.java;
    MathUtils.java:1258-1297) — here it rides whole-stage codegen like
    any other column function."""
    # one py4j call for the 256-entry literal (per-element F.lit costs a
    # roundtrip each — ~150 ms of driver-side plan build per query)
    table = F.expr("array(" + ",".join(str(x) for x in _crc16_table()) + ")")
    hex_pairs = F.regexp_extract_all(F.hex(data), F.lit(".."), 0)
    bytes_arr = F.transform(hex_pairs, lambda h: F.conv(h, 16, 10).cast("int"))
    return F.aggregate(
        bytes_arr,
        F.lit(0xFFFF),
        lambda crc, b: F.shiftright(crc, 8).bitwiseXOR(
            F.element_at(table, crc.bitwiseXOR(b).bitwiseAND(F.lit(0xFF)) + 1)
        ),
    )


def crc16_modbus_pandas(data: Column) -> Column:
    """Arrow-batched pandas-UDF variant of :func:`crc16_modbus` — kept
    as the cross-check oracle for the Catalyst fold (tests assert both
    agree) and as the pattern for checksums that genuinely need Python."""
    import pandas
    from pyspark.sql.functions import pandas_udf

    def _crc(col: "pandas.Series") -> "pandas.Series":
        table = _crc16_table()

        def one(buf) -> int:
            if buf is None:
                return 0
            crc = 0xFFFF
            for b in bytes(buf):
                crc = (crc >> 8) ^ table[(crc ^ b) & 0xFF]
            return crc

        return col.map(one)

    _crc.__annotations__ = {"col": pandas.Series, "return": pandas.Series}
    return pandas_udf(_crc, "int")(data)
