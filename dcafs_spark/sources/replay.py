"""File replay sources — the reference's file src + DebugWorker.

Parity targets:
  * PathForward custom `file` src: read file(s) in buffered chunks at
    a fixed interval (`src/io/forward/PathForward.java:435-590`).
  * DebugWorker raw-log replay: re-feed recorded raw logs through the
    whole pipeline as if live (`src/worker/DebugWorker.java:268-430`)
    — the reference's de-facto integration test, and ours (SURVEY §5).

Spark-first: batch replay is just `spark.read.text` (the pipeline is
identical for batch and stream inputs — same compile_steps); "as if
live" replay drops the files into a watched directory consumed by the
streaming `text` source, preserving micro-batch boundaries via
maxFilesPerTrigger. Timing offsets are data (`ts` column), not
sleeps — a 10-minute recording replays in seconds with identical
event-time semantics.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str, origin: str | None = None) -> DataFrame:
    """Batch replay: raw-log file(s) → Datagram-shaped DataFrame
    (value, origin, ts). Timestamped raw logs ('ISO<tab>line', the
    tinylog raw format) surface their recorded event time; bare lines
    get ingest time."""
    df = spark.read.text(path)
    has_ts = F.col("value").rlike(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}")
    # try_to_timestamp, NOT to_timestamp: under ANSI mode (the Spark 4
    # default) a malformed first field would otherwise ABORT the job
    # instead of falling back — the regex prefix match alone doesn't
    # guarantee the full field parses
    ts_part = F.try_to_timestamp(F.substring_index("value", "\t", 1))
    rest = F.expr("substring(value, instr(value, '\t') + 1)")
    return (
        # coalesce: a line can match the prefix regex yet fail the full
        # timestamp parse (e.g. "2024-01-02T03:04:05garbage...") —
        # that's a bare line with NO recorded time, not a NULL-ts row.
        # A line treated as bare for ts is also bare for value: the
        # payload truncation is gated on the SAME successful parse, so
        # a malformed first field is never silently dropped from the
        # replayed payload (round-11 review).
        df.withColumn(
            "ts",
            F.when(has_ts, F.coalesce(ts_part, F.current_timestamp())).otherwise(
                F.current_timestamp()
            ),
        )
        .withColumn(
            "value",
            F.when(
                has_ts & F.col("value").contains("\t") & ts_part.isNotNull(), rest
            ).otherwise(F.col("value")),
        )
        .withColumn("origin", F.lit(origin or os.path.basename(path)))
    )


def replay_files(src_files: list[str], watch_dir: str, chunk_lines: int = 2500) -> int:
    """Stage recorded logs into a stream-watched directory in
    READ_BUFFER_SIZE chunks (PathForward.java:42 buffers 2500 lines
    per interval tick). Returns number of chunk files written.

    Pair with source spec {"kind": "text", "path": watch_dir,
    "maxFilesPerTrigger": 1} for one-chunk-per-micro-batch pacing."""
    os.makedirs(watch_dir, exist_ok=True)
    n = 0
    for path in src_files:
        with open(path) as fh:
            chunk: list[str] = []
            for line in fh:
                chunk.append(line)
                if len(chunk) >= chunk_lines:
                    _write_chunk(watch_dir, n, chunk)
                    chunk = []
                    n += 1
            if chunk:
                _write_chunk(watch_dir, n, chunk)
                n += 1
    return n


def _write_chunk(watch_dir: str, idx: int, lines: list[str]) -> None:
    tmp = os.path.join(watch_dir, f".tmp_chunk_{idx:06d}")
    with open(tmp, "w") as fh:
        fh.writelines(lines)
    # atomic move so the file source never reads half-written files
    shutil.move(tmp, os.path.join(watch_dir, f"chunk_{idx:06d}.txt"))
