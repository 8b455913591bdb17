"""Degenerate-input robustness: every registered query must run (not
crash) on fully EMPTY tables. Empty partitions are routine at scale —
a filter that matches nothing upstream, a new hive partition, a
just-bootstrapped store — and window/fold/explode plans have
empty-input edge paths (array_max of [], percentile of no rows,
broadcast of an empty dim) that only this shape exercises."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcafs_spark.queries import QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}),
            str(out / f"{t}.parquet"),
        )
    return str(out)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            fn(spark, empty_sf_dir).count()
        except Exception as exc:  # collect all, report once
            failures.append(f"{name}: {str(exc).splitlines()[0][:160]}")
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)


@pytest.fixture(scope="module")
def patho_sf_dir(tmp_path_factory, sf_dir):
    """All tables normal except documents: pathological rows — empty,
    whitespace-only, NULL text, 1-char, CJK, and a 10k-char doc."""
    import shutil

    out = tmp_path_factory.mktemp("patho_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_dir}/{t}.parquet", str(out / f"{t}.parquet"))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(
                ["", "   ", None, "a", "你好 世界 你好 世界 你好", "x " * 5000], pa.string()
            ),
            "lang": pa.array(["en", "en", None, "de", "zh", "en"]),
            "source": pa.array(["web", "web", "web", None, "book", "web"]),
            "n_chars": pa.array([0, 3, 0, 1, 14, 10000], pa.int64()),
        }
    )
    pq.write_table(docs, str(out / "documents.parquet"))
    return str(out)


DOC_FAMILIES = (
    "dedup", "text", "token", "lang", "corpus", "doc", "fingerprint", "pii",
    "gopher", "quality", "ngram", "line", "chunk", "decontaminate", "oov",
    "code", "sequence", "inverted", "stratified", "train",
    "gram", "pmi", "surprisal", "zipf", "tfidf", "entropy", "mixture",
    "sample", "packing", "dup", "confusion", "bpe", "drift",
)


def test_doc_queries_survive_pathological_text(spark, patho_sf_dir):
    failures = []
    for name, (fn, _sql) in QUERIES.items():
        if not any(k in name for k in DOC_FAMILIES):
            continue
        try:
            fn(spark, patho_sf_dir).count()
        except Exception as exc:
            failures.append(f"{name}: {str(exc).splitlines()[0][:160]}")
    assert not failures, "queries crashed on pathological docs:\n" + "\n".join(failures)
