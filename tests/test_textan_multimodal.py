"""Text analysis + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from dcafs_spark.operators.multimodal import extract_features, resize_meta, sample_frames, synth_media
from dcafs_spark.operators.textan import (
    fingerprint,
    lang_id,
    quality_features,
    token_count_bpe,
    token_count_ws,
)


def test_lang_id(spark):
    rows = [
        (1, "the cat is on the mat and the dog is here"),
        (2, "le chat est sur la table et les chiens"),
        (3, "der hund und die katze ist nicht hier"),
        (4, "el perro y los gatos una casa por que"),
        (5, "你好世界这是一个中文句子的测试文本内容"),
        (6, "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "zh", 6: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42 times")], "doc_id long, text string")
    row = df.select(
        token_count_ws(F.col("text")).alias("ws"), token_count_bpe(F.col("text")).alias("bpe")
    ).first()
    assert row["ws"] == 4
    # Hello , world ! 42 times → 6
    assert row["bpe"] == 6


def test_quality_score_ordering(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then some more text of normal quality"),
        (2, "!!! ??? ### $$$ %%%"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["quality_score"] for r in quality_features(df).collect()}
    assert got[1] > got[2]


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a  b c   d e f g h i j"), (3, "totally different words here now ok yes no maybe")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_multimodal_features(spark):
    media = synth_media(spark, 12)
    feats = extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert r["n_bytes"] >= 32 and len(r["feature"]) == 4


def test_multimodal_frame_sampling(spark):
    media = synth_media(spark, 12)
    frames = sample_frames(media, every_ms=250)
    rows = frames.collect()
    assert all(r["frame_idx"] >= 0 for r in rows)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids


def test_multimodal_resize_meta(spark):
    media = synth_media(spark, 3)
    out = resize_meta(media, 128, 96).first()
    assert out["meta"]["width"] == 128 and out["meta"]["height"] == 96


def test_decode_stub_raises_on_empty():
    from dcafs_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"")
