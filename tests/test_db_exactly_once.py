"""Exactly-once JDBC/SQLite sink under failure injection (r13 verdict
ask #7): the foreachBatch + idempotent-keys contract from SURVEY
§4.2.3. Spark's micro-batch replay is AT-LEAST-once — a sink crash (or
a crash between sink success and checkpoint commit) re-delivers the
whole batch; the sink's natural-key upsert must absorb the replay with
exact row parity.

Reference parity: the reference's SQLDB keeps failed batches for
retry (`src/util/database/SQLDB.java:481-552`); the Spark-side
equivalent safety property is idempotent replay, tested here by
killing a batch write partway (monkeypatched failure AFTER a partial
commit — the torn-write worst case) and re-running.
"""

from __future__ import annotations

import sqlite3
import time

import pytest

from dcafs_spark.sinks.db import SqliteSink


def _rows(con_path: str, table: str = "t"):
    con = sqlite3.connect(con_path)
    try:
        return sorted(con.execute(f'SELECT * FROM "{table}"').fetchall())
    finally:
        con.close()


class TestExactlyOnceBatch:
    def test_midwrite_crash_then_replay_exact_parity(self, spark, tmp_path, monkeypatch):
        """Kill the write after the FIRST chunk is durably committed
        (the torn-write worst case: a crash that leaves partial rows),
        then replay the whole batch — the key upsert must converge to
        exact parity, no duplicates, no missing rows."""
        db = str(tmp_path / "eo.db")
        sink = SqliteSink(db, "t", key_cols=["doc_id"])
        df = spark.range(25000).selectExpr(
            "id AS doc_id", "concat('payload', id) AS body"
        )

        real_flush = SqliteSink._flush
        calls = {"n": 0}

        def torn_flush(self, cur, insert, rows):
            n = real_flush(self, cur, insert, rows)
            calls["n"] += 1
            if calls["n"] == 1:
                # make the partial chunk DURABLE, then die — the crash
                # window write_batch's end-commit cannot protect
                cur.connection.commit()
                raise RuntimeError("injected mid-batch crash")
            return n

        monkeypatch.setattr(SqliteSink, "_flush", torn_flush)
        with pytest.raises(RuntimeError, match="injected"):
            sink.write_batch(df)  # 25k rows = 3 chunks; dies after #1
        monkeypatch.setattr(SqliteSink, "_flush", real_flush)

        partial = _rows(db)
        assert 0 < len(partial) < 25000  # the torn state is real

        n = sink.write_batch(df)  # the engine's replay of the SAME batch
        assert n == 25000
        got = _rows(db)
        assert len(got) == 25000
        assert got == sorted((i, f"payload{i}") for i in range(25000))
        assert not sink.dead_letter

    def test_without_keys_replay_duplicates(self, spark, tmp_path, monkeypatch):
        """The negative control: the SAME torn-write replay WITHOUT
        key_cols double-inserts — documenting why the contract names
        idempotent keys, not just retry."""
        db = str(tmp_path / "nokeys.db")
        sink = SqliteSink(db, "t")  # no key_cols → plain INSERT
        df = spark.range(15000).selectExpr("id AS doc_id", "'x' AS body")

        real_flush = SqliteSink._flush
        calls = {"n": 0}

        def torn_flush(self, cur, insert, rows):
            n = real_flush(self, cur, insert, rows)
            calls["n"] += 1
            if calls["n"] == 1:
                cur.connection.commit()
                raise RuntimeError("injected")
            return n

        monkeypatch.setattr(SqliteSink, "_flush", torn_flush)
        with pytest.raises(RuntimeError):
            sink.write_batch(df)
        monkeypatch.setattr(SqliteSink, "_flush", real_flush)
        sink.write_batch(df)
        assert len(_rows(db)) > 15000  # duplicated — the hazard is real


class TestExactlyOnceStreaming:
    def test_stream_restart_replays_batch_idempotently(self, spark, tmp_path):
        """The full engine-level contract: a foreachBatch sink crash
        fails the streaming query AFTER rows were durably committed;
        restarting from the same checkpoint replays the batch (Spark
        at-least-once) and the keyed upsert converges to exact parity."""
        src = tmp_path / "src"
        src.mkdir()
        (src / "batch0.csv").write_text(
            "".join(f"{i},row{i}\n" for i in range(500))
        )
        db = str(tmp_path / "stream.db")
        ckpt = str(tmp_path / "ckpt")
        sink = SqliteSink(db, "t", key_cols=["doc_id"])

        crash_once = {"armed": True}

        def failing_sink(batch_df, batch_id):
            sink.write_batch(batch_df, batch_id)  # rows are DURABLE...
            if crash_once["armed"]:
                crash_once["armed"] = False
                raise RuntimeError("injected post-commit crash")
                # ...but the checkpoint never records the batch

        def start(fn):
            reader = (
                spark.readStream.schema("doc_id long, body string")
                .csv(str(src))
            )
            return (
                reader.writeStream.foreachBatch(fn)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        q = start(failing_sink)
        try:
            q.awaitTermination(60)
        except Exception:
            pass
        assert q.exception() is not None  # the injected crash failed the query
        assert len(_rows(db)) == 500  # durable pre-crash

        # restart from the SAME checkpoint → batch 0 replays
        q2 = start(lambda df, bid: sink.write_batch(df, bid))
        assert q2.awaitTermination(60)
        got = _rows(db)
        assert len(got) == 500
        assert got == sorted((i, f"row{i}") for i in range(500))
        assert not sink.dead_letter
