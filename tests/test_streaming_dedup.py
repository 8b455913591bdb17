"""Streaming ingest dedup (state-store dropDuplicates tiers).

Covers: exact content-hash dedup across micro-batches, watermark-bounded
state (dropDuplicatesWithinWatermark), the banded-signature near-dup
pre-filter, and batch/stream bucket-identity agreement.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dcafs_spark.operators.dedup import banded_signature, minhash_lsh_pairs
from dcafs_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_minhash_bucket_dedup,
)


def _drain(q, predicate, timeout_s=60):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        q.processAllAvailable()
        if predicate():
            return True
        time.sleep(0.2)
    return False


def _run_stream(spark, watch, transform, rows):
    raw = spark.readStream.option("maxFilesPerTrigger", 1).text(str(watch))
    out = transform(raw)
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .start()
    )
    return q


class TestStreamingExactDedup:
    def test_dedup_across_microbatches(self, spark, tmp_path):
        """A duplicate arriving in a LATER micro-batch must be dropped:
        the membership state persists in the state store between
        batches (unlike a per-batch dropDuplicates in foreachBatch)."""
        watch = tmp_path / "w"
        watch.mkdir()
        (watch / "b1.txt").write_text("alpha beta gamma\nsecond doc\n")
        rows: list = []
        q = _run_stream(
            spark, watch, lambda df: streaming_exact_dedup(df, text_col="value"), rows
        )
        try:
            assert _drain(q, lambda: len(rows) >= 2)
            # batch 2: one exact repeat (normalized: case/whitespace
            # folded) + one new doc
            (watch / "b2.txt").write_text("ALPHA   beta GAMMA\nthird doc\n")
            assert _drain(q, lambda: len(rows) >= 3)
            time.sleep(0.3)
            q.processAllAvailable()
        finally:
            q.stop()
        texts = sorted(r["value"] for r in rows)
        assert len(rows) == 3, texts  # the re-arrival was suppressed
        assert "ALPHA   beta GAMMA" not in texts

    def test_watermark_variant_builds_and_dedups(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark path: same-batch duplicates are
        suppressed and the query runs with bounded (evictable) state.
        Event times ride in the lines; the watermark horizon covers the
        test data so behavior matches the unbounded tier here."""
        watch = tmp_path / "w2"
        watch.mkdir()
        (watch / "b1.txt").write_text(
            "2024-01-01 10:00:00|doc one\n"
            "2024-01-01 10:00:05|doc one\n"
            "2024-01-01 10:00:09|doc two\n"
        )
        rows: list = []

        def transform(df):
            parts = F.split("value", r"\|")
            parsed = df.select(
                F.to_timestamp(parts[0]).alias("ts"), parts[1].alias("text")
            )
            return streaming_exact_dedup(
                parsed, text_col="text", ts_col="ts", watermark="10 minutes"
            )

        q = _run_stream(spark, watch, transform, rows)
        try:
            assert _drain(q, lambda: len(rows) >= 2)
        finally:
            q.stop()
        assert sorted(r["text"] for r in rows) == ["doc one", "doc two"]

    def test_requires_ts_for_watermark(self, spark):
        import pytest

        df = spark.readStream.format("rate").load().withColumn("text", F.lit("x"))
        with pytest.raises(ValueError, match="ts_col"):
            streaming_exact_dedup(df, watermark="1 hour")


class TestStreamingMinhashBucketDedup:
    def test_mirror_pages_collapse_variants_pass(self, spark, tmp_path):
        """Exact mirrors (identical shingle sets → identical banded
        signature) collapse to first-wins; a genuinely different doc
        passes. A lightly-edited variant may or may not collide in all
        bands — it must NEVER be dropped unless its full signature
        matches, so the distinct signature count is the floor."""
        base = "the quick brown fox jumps over the lazy dog again and again"
        other = "completely different content about oceanographic sensors"
        watch = tmp_path / "w3"
        watch.mkdir()
        (watch / "b1.txt").write_text(f"{base}\n{other}\n")
        rows: list = []
        q = _run_stream(
            spark,
            watch,
            lambda df: streaming_minhash_bucket_dedup(df, text_col="value"),
            rows,
        )
        try:
            assert _drain(q, lambda: len(rows) >= 2)
            # mirror arrives later (same words → same shingles/signature)
            (watch / "b2.txt").write_text(f"{base}\n")
            time.sleep(0.3)
            q.processAllAvailable()
        finally:
            q.stop()
        assert sorted(r["value"] for r in rows) == sorted([base, other])

    def test_bucket_identity_matches_batch_operator(self, spark):
        """Stream and batch must agree on bucket identity: two docs the
        BATCH operator pairs in all 4 bands (est_jaccard == 1.0 at 16
        hashes) have equal banded signatures, and a non-pair doc does
        not."""
        a = "alpha beta gamma delta epsilon zeta eta theta"
        c = "nothing in common with those shingle sets at all here"
        df = spark.createDataFrame([(1, a), (2, a), (3, c)], ["doc_id", "text"])
        sigs = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", banded_signature(F.col("text")).alias("s")
            ).collect()
        }
        assert sigs[1] == sigs[2] != sigs[3]
        pairs = minhash_lsh_pairs(df).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


class TestStreamingEmbeddingBucketDedup:
    def test_reencoded_mirrors_collapse_distinct_pass(self, spark, tmp_path):
        """Near-identical vectors (re-encoded mirrors) share every sign
        bit and collapse first-wins across micro-batches; a genuinely
        different vector survives."""
        import json

        from dcafs_spark.operators.similarity import hyperplanes
        from dcafs_spark.streaming.dedup import streaming_embedding_bucket_dedup

        planes = hyperplanes(4, 8, 42)
        v = [0.9, 0.2, -0.4, 0.1]
        near = [x * 1.0005 + 0.0001 for x in v]
        other = [-0.7, 0.6, 0.3, -0.5]
        watch = tmp_path / "we"
        watch.mkdir()
        (watch / "b1.txt").write_text(json.dumps(v) + "\n" + json.dumps(other) + "\n")
        rows: list = []
        q = _run_stream(
            spark,
            watch,
            lambda df: streaming_embedding_bucket_dedup(
                df.withColumn("embedding", F.from_json("value", "array<double>")),
                planes,
            ),
            rows,
        )
        try:
            assert _drain(q, lambda: len(rows) >= 2)
            (watch / "b2.txt").write_text(json.dumps(near) + "\n")  # later mirror
            time.sleep(0.3)
            q.processAllAvailable()
        finally:
            q.stop()
        assert sorted(r["value"] for r in rows) == sorted(
            [json.dumps(v), json.dumps(other)]
        )

    def test_bucket_identity_matches_batch_operator(self, spark):
        """Stream and batch agree on bucket identity: the stream tier
        keys on the SAME lsh_bucket expression the batch pair operator
        buckets with."""
        from dcafs_spark.operators.similarity import hyperplanes, lsh_bucket

        planes = hyperplanes(4, 8, 42)
        v = [0.9, 0.2, -0.4, 0.1]
        near = [x * 1.0005 + 0.0001 for x in v]
        other = [-0.7, 0.6, 0.3, -0.5]
        df = spark.createDataFrame(
            [(1, v), (2, near), (3, other)], "vec_id long, embedding array<double>"
        )
        b = {
            r["vec_id"]: r["b"]
            for r in df.select(
                "vec_id", lsh_bucket(F.col("embedding"), planes).alias("b")
            ).collect()
        }
        assert b[1] == b[2] != b[3]


class TestStreamingUrlDedup:
    def test_refetch_variants_collapse_across_batches(self, spark, tmp_path):
        """Re-fetches of one page under different raw spellings (case,
        www, default port, utm params, fragment) collapse first-wins
        across micro-batches; a different page passes."""
        from dcafs_spark.streaming.dedup import streaming_url_dedup

        watch = tmp_path / "wu"
        watch.mkdir()
        (watch / "b1.txt").write_text(
            "https://a.com/x?id=1\nhttps://b.com/y\n"
        )
        rows: list = []
        q = _run_stream(
            spark,
            watch,
            lambda df: streaming_url_dedup(df, url_col="value"),
            rows,
        )
        try:
            assert _drain(q, lambda: len(rows) >= 2)
            (watch / "b2.txt").write_text(
                "HTTPS://WWW.A.com:443/x/?utm_source=t&id=1#frag\n"
                "https://c.com/z\n"
            )
            assert _drain(q, lambda: len(rows) >= 3)
            time.sleep(0.3)
            q.processAllAvailable()
        finally:
            q.stop()
        assert sorted(r["value"] for r in rows) == [
            "https://a.com/x?id=1",
            "https://b.com/y",
            "https://c.com/z",
        ]

    def test_url_identity_matches_batch_operator(self, spark):
        """Stream and batch agree on URL identity: the stream tier keys
        on md5 of the SAME url_parts canonical form the batch url_dedup
        groups by."""
        from dcafs_spark.operators.urls import url_dedup, url_parts

        df = spark.createDataFrame(
            [
                (1, "HTTPS://WWW.A.com:443/x/?utm_source=t&id=1#frag"),
                (2, "https://a.com/x?id=1"),
                (3, "https://a.com/x?id=2"),
            ],
            "doc_id long, url string",
        )
        canon = {
            r["doc_id"]: r["c"]
            for r in df.select(
                "doc_id", url_parts(F.col("url")).getField("canon").alias("c")
            ).collect()
        }
        assert canon[1] == canon[2] != canon[3]
        batch = {r["doc_id"]: r for r in url_dedup(df, "url", "doc_id").collect()}
        assert batch[1]["kept"] and not batch[2]["kept"] and batch[3]["kept"]


class TestStreamingParagraphDedup:
    def test_template_flood_survives_once(self, spark, tmp_path):
        """A template paragraph arriving in every doc of a flood is
        emitted exactly once; novel paragraphs all pass; a later
        re-arrival of the template is suppressed by state."""
        from dcafs_spark.streaming.dedup import streaming_paragraph_dedup

        boiler = " ".join(f"b{i}" for i in range(20))
        uniq1 = " ".join(f"u{i}" for i in range(20))
        uniq2 = " ".join(f"v{i}" for i in range(20))
        watch = tmp_path / "wp"
        watch.mkdir()
        (watch / "b1.txt").write_text(f"{boiler} {uniq1}\n")
        rows: list = []
        q = _run_stream(
            spark,
            watch,
            lambda df: streaming_paragraph_dedup(
                df, text_col="value", chunk_words=20
            ),
            rows,
        )
        try:
            assert _drain(q, lambda: len(rows) >= 2)
            (watch / "b2.txt").write_text(f"{boiler} {uniq2}\n")
            assert _drain(q, lambda: len(rows) >= 3)
            time.sleep(0.3)
            q.processAllAvailable()
        finally:
            q.stop()
        paras = sorted(r["para"] for r in rows)
        assert paras == sorted([boiler, uniq1, uniq2])
        # the emitted row carries position + word count, body column gone
        assert {r["para_words"] for r in rows} == {20}
        assert "value" not in rows[0].asDict()

    def test_paragraph_identity_matches_batch_operator(self, spark):
        """Stream and batch agree on paragraph identity: both build on
        paragraph_chunks, so the stream tier's state key equals the
        batch operator's chash for the same text, chunk size, and
        normalization."""
        from dcafs_spark.operators.dedup import paragraph_chunks

        boiler = " ".join(f"b{i}" for i in range(20))
        uniq = " ".join(f"u{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, f"{boiler} {uniq}"), (2, f"{boiler.upper()}  extra words here")],
            "doc_id long, text string",
        )
        plain = {
            (r["doc_id"], r["i"]): r["c"]["chash"]
            for r in df.select(
                "doc_id",
                F.posexplode(paragraph_chunks(F.col("text"), 20)).alias("i", "c"),
            ).collect()
        }
        withtext = {
            (r["doc_id"], r["i"]): r["c"]["chash"]
            for r in df.select(
                "doc_id",
                F.posexplode(
                    paragraph_chunks(F.col("text"), 20, with_text=True)
                ).alias("i", "c"),
            ).collect()
        }
        assert plain == withtext  # with_text never changes the hash
        # normalization folds case/whitespace: doc 2's first chunk is
        # the SAME boilerplate paragraph as doc 1's
        assert plain[(1, 0)] == plain[(2, 0)]
        assert plain[(1, 1)] != plain[(2, 1)]


class TestIngestComposition:
    def test_url_filter_then_streaming_dedup(self, spark, tmp_path):
        """The realistic crawl ingest chain: url_filter verdicts stream
        through (narrow map on a stream is legal), blocked rows drop,
        survivors dedup first-wins on the canonical URL — all in ONE
        streaming query."""
        from dcafs_spark.operators.urls import url_filter
        from dcafs_spark.streaming.dedup import streaming_url_dedup

        watch = tmp_path / "wc"
        watch.mkdir()
        (watch / "b1.txt").write_text(
            "https://ok.com/a\n"
            "https://spam.com/x\n"            # blocked domain
            "HTTPS://WWW.OK.com:443/a/\n"     # canonical dup of row 1
            "https://ok.com/login\n"          # blocked path
            "https://ok.com/b\n"
        )
        rows: list = []

        def transform(df):
            filtered = url_filter(
                df, "value", blocked_domains=["spam.com"],
                blocked_path_rules=[r"^/login$"],
            ).filter("kept").drop("canon_url", "domain", "kept")
            return streaming_url_dedup(filtered, url_col="value")

        q = _run_stream(spark, watch, transform, rows)
        try:
            assert _drain(q, lambda: len(rows) >= 2)
        finally:
            q.stop()
        assert sorted(r["value"] for r in rows) == [
            "https://ok.com/a",
            "https://ok.com/b",
        ]
