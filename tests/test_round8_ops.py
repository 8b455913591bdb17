"""Python-reference checks for the round-8 corpus operators:
substring windows, dup-span fractions, BPE pair counts, interpolated
bigram surprisal, embedding Mahalanobis QC — each validated against a
direct python computation on small generated corpora (independent of
the DuckDB oracle, which shares SQL-shaped blind spots)."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dcafs_spark.queries import QUERIES


def _toks(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _round_half_up(x: float, ndigits: int = 0) -> float:
    """Half-away-from-zero rounding matching Spark/DuckDB round().
    Python's built-in round() is banker's (half-to-even), so a
    quantized value landing exactly on .5 would diverge from BOTH
    engines — vanishingly rare for transcendental terms, but the
    reference must mirror the engines' semantics exactly."""
    m = 10.0 ** ndigits
    s = math.floor(abs(x) * m + 0.5) / m
    return -s if x < 0 else s


def _mk_sf(tmp_path, docs, embeddings=None):
    """Minimal sf_dir with a documents table (and optional embeddings)."""
    out = tmp_path / "sf"
    out.mkdir(exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array([d[2] if len(d) > 2 else "en" for d in docs]),
            "source": pa.array(["web"] * len(docs)),
            "n_chars": pa.array([len(d[1] or "") for d in docs], pa.int64()),
        }
    )
    pq.write_table(t, str(out / "documents.parquet"))
    if embeddings is not None:
        e = pa.table(
            {
                "vec_id": pa.array([v[0] for v in embeddings], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in embeddings], pa.list_(pa.float32())
                ),
            }
        )
        pq.write_table(e, str(out / "embeddings.parquet"))
    return str(out)


def _windows(text: str, n: int = 8) -> list[str]:
    w = _toks(text)
    return [
        hashlib.md5(" ".join(w[i : i + n]).encode()).hexdigest()
        for i in range(len(w) - n + 1)
    ]


BOILER = "all rights reserved contact us terms of service apply here"
CORPUS = [
    (1, f"unique article one about plankton {BOILER} tail text one two three"),
    (2, f"another piece on currents {BOILER} with different endings four five"),
    (3, "entirely original essay with no shared boilerplate at all in it today ok"),
    (4, "short doc"),  # < 8 tokens → zero windows
]


class TestSubstringDedup:
    def test_matches_python_reference(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, CORPUS)
        got = {
            r["h"]: (r["n_docs"], r["n_occ"], r["first_doc"])
            for r in QUERIES["substring_dedup"][0](spark, sf).collect()
        }
        per_doc: dict[str, Counter] = {}
        for doc_id, text in [(d[0], d[1]) for d in CORPUS]:
            for h in _windows(text):
                per_doc.setdefault(h, Counter())[doc_id] += 1
        want = {
            h: (len(c), sum(c.values()), min(c))
            for h, c in per_doc.items()
            if len(c) >= 2
        }
        assert got == want
        assert len(want) >= 2  # the boilerplate span yields shared windows

    def test_dup_span_fraction_reference(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, CORPUS)
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup"], r["dup_frac"])
            for r in QUERIES["dup_span_fraction"][0](spark, sf).collect()
        }
        per_doc: dict[str, Counter] = {}
        for doc_id, text in [(d[0], d[1]) for d in CORPUS]:
            for h in _windows(text):
                per_doc.setdefault(h, Counter())[doc_id] += 1
        multi = {h for h, c in per_doc.items() if len(c) >= 2}
        want = {}
        for doc_id, text in [(d[0], d[1]) for d in CORPUS]:
            ws = _windows(text)
            if not ws:
                continue  # zero-window docs are excluded by contract
            nd = sum(1 for h in ws if h in multi)
            want[doc_id] = (len(ws), nd, _round_half_up(nd / len(ws), 6))
        assert got == want
        assert 4 not in got  # the short doc has no windows
        assert got[3][1] == 0  # the original essay shares nothing


class TestBpeMergeCandidates:
    def test_pair_counts_match_python(self, spark, tmp_path):
        rng = random.Random(11)
        vocab = ["spark", "data", "scale", "ab", "a", "banana", "анна"]
        docs = [
            (i, " ".join(rng.choices(vocab, k=30))) for i in range(1, 6)
        ]
        sf = _mk_sf(tmp_path, docs)
        got = [
            (r["a"], r["b"], r["pair_count"])
            for r in QUERIES["bpe_merge_candidates"][0](spark, sf).collect()
        ]
        wc = Counter(t for _, text in [(d[0], d[1]) for d in docs] for t in _toks(text))
        pairs: Counter = Counter()
        for w, c in wc.items():
            if len(w) < 2:
                continue  # single-char words contribute no pairs
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert got == [(a, b, c) for (a, b), c in want]

    def test_single_char_words_no_phantom_pairs(self, spark, tmp_path):
        # all-1-char corpus: Spark's sequence(1,0) descends — the guard
        # must yield ZERO pairs, like DuckDB's empty generate_series
        sf = _mk_sf(tmp_path, [(1, "a b c a b"), (2, "x y z")])
        assert QUERIES["bpe_merge_candidates"][0](spark, sf).count() == 0


class TestBigramSurprisal:
    def test_matches_python_reference(self, spark, tmp_path):
        rng = random.Random(5)
        vocab = ["tide", "wave", "salt", "deep", "cold"]
        docs = [(i, " ".join(rng.choices(vocab, k=25))) for i in range(1, 5)]
        sf = _mk_sf(tmp_path, docs)
        got = {
            r["doc_id"]: (r["n_pairs"], r["bigram_xent"])
            for r in QUERIES["bigram_surprisal"][0](spark, sf).collect()
        }
        uni: Counter = Counter()
        pc: Counter = Counter()
        doc_pairs: dict[int, list] = {}
        for doc_id, text in [(d[0], d[1]) for d in docs]:
            w = _toks(text)
            uni.update(w)
            ps = list(zip(w, w[1:]))
            pc.update(ps)
            doc_pairs[doc_id] = ps
        u_total = sum(uni.values())
        want = {}
        for doc_id, ps in doc_pairs.items():
            q = [
                _round_half_up(-math.log(0.7 * (pc[p] / uni[p[0]]) + 0.3 * (uni[p[1]] / u_total)) * 1e6)
                for p in ps
            ]
            want[doc_id] = (len(ps), _round_half_up(sum(q) / (len(ps) * 1e6), 6))
        assert got == want


class TestEmbeddingOutliers:
    def test_planted_outlier_flagged(self, spark, tmp_path):
        rng = random.Random(3)
        vecs = [(i, [rng.gauss(0.0, 1.0) for _ in range(64)]) for i in range(40)]
        vecs.append((99, [25.0] * 64))  # planted gross outlier
        sf = _mk_sf(tmp_path, [(1, "x")], embeddings=vecs)
        rows = {r["vec_id"]: r for r in QUERIES["embedding_outliers"][0](spark, sf).collect()}
        assert rows[99]["is_outlier"] is True
        flagged = [v for v, r in rows.items() if r["is_outlier"]]
        assert flagged == [99]  # gaussians stay under the 2.0-avg threshold
        # md2 of the outlier dwarfs every normal vector
        assert rows[99]["md2"] > 10 * max(
            r["md2"] for v, r in rows.items() if v != 99
        )
        assert all(r["n_degenerate_dims"] == 0 for r in rows.values())

    def test_constant_dim_surfaces_as_degenerate(self, spark, tmp_path):
        """A constant dimension (sigma rounds to 0.0) must be REPORTED
        per-vector, not silently dropped from md2 via a NULL division."""
        rng = random.Random(5)
        vecs = []
        for i in range(20):
            v = [rng.gauss(0.0, 1.0) for _ in range(8)]
            v[3] = 0.25  # constant across the corpus -> sigma 0
            vecs.append((i, v))
        sf = _mk_sf(tmp_path, [(1, "x")], embeddings=vecs)
        rows = QUERIES["embedding_outliers"][0](spark, sf).collect()
        assert rows and all(r["n_degenerate_dims"] == 1 for r in rows)
        assert all(r["md2"] is not None for r in rows)  # other dims still score


class TestSourceDriftJs:
    def test_matches_python_reference(self, spark, tmp_path):
        rng = random.Random(17)
        vocab_a = ["tide", "wave", "salt", "deep"]
        vocab_b = ["spam", "click", "free", "wave"]
        docs = [(i, " ".join(rng.choices(vocab_a, k=20)), "en") for i in range(1, 6)]
        docs += [(i, " ".join(rng.choices(vocab_b, k=20)), "en") for i in range(6, 9)]
        sf = _mk_sf(tmp_path, docs)
        # source column: web for doc 1-5, spammy for 6-8
        import pyarrow.parquet as _pq

        t = _pq.read_table(sf + "/documents.parquet")
        src = pa.array(["web"] * 5 + ["spammy"] * 3)
        t = t.set_column(t.schema.get_field_index("source"), "source", src)
        _pq.write_table(t, sf + "/documents.parquet")

        got = {
            r["source"]: (r["n_tokens"], r["js_divergence"])
            for r in QUERIES["source_drift_js"][0](spark, sf).collect()
        }
        # python reference: quantized exactly like the query
        by_src: dict[str, Counter] = {}
        corpus: Counter = Counter()
        srcs = ["web"] * 5 + ["spammy"] * 3
        for (doc_id, text, _), s in zip(docs, srcs):
            w = _toks(text)
            by_src.setdefault(s, Counter()).update(w)
            corpus.update(w)
        t_all = sum(corpus.values())
        want = {}
        for s, cnt in by_src.items():
            t_s = sum(cnt.values())
            js_q = 0
            present_ct = 0
            for tok, c_st in cnt.items():
                c_t = corpus[tok]
                present_ct += c_t
                p = c_st / t_s
                q = (c_t - c_st) / (t_all - t_s)
                m = (p + q) / 2
                term = 0.5 * p * math.log(p / m) + (
                    0.5 * q * math.log(q / m) if c_t > c_st else 0.0
                )
                js_q += _round_half_up(term * 1e9)
            tail = 0.5 * math.log(2.0) * (1.0 - (present_ct - t_s) / (t_all - t_s))
            want[s] = (len(cnt), _round_half_up(js_q / 1e9 + tail, 6))
        assert got == want
        # disjoint-heavy sources diverge more than self-similar ones
        assert got["spammy"][1] > 0.1

    def test_single_source_is_null(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, [(1, "a b c"), (2, "c d e")])  # all source=web
        rows = QUERIES["source_drift_js"][0](spark, sf).collect()
        assert len(rows) == 1 and rows[0]["js_divergence"] is None


class TestAnnRecall:
    def test_method_ordering_and_ground_truth(self, spark, sf_dir):
        """Brute force must retrieve every planted source (the rotation
        keeps cosine-to-source far above random inter-vector cosines);
        the approximate tiers can only lose recall, and multiprobe must
        dominate plain LSH (it probes a superset of buckets)."""
        rows = {
            r["method"]: r
            for r in QUERIES["ann_recall"][0](spark, sf_dir).collect()
        }
        assert set(rows) == {"brute_force", "lsh", "lsh_multiprobe"}
        assert all(r["n_queries"] == 20 for r in rows.values())
        assert rows["brute_force"]["hit_rate"] == 1.0
        assert (
            rows["lsh"]["hit_rate"]
            <= rows["lsh_multiprobe"]["hit_rate"]
            <= rows["brute_force"]["hit_rate"]
        )
        # the rotation is strong enough to discriminate the tiers —
        # if lsh also scores 1.0 the eval has gone vacuous again
        assert rows["lsh"]["hit_rate"] < 1.0


class TestMinhashCalibration:
    def test_estimator_statistics_sane(self, spark, sf_dir):
        rows = QUERIES["minhash_calibration"][0](spark, sf_dir).collect()
        assert rows, "no candidate pairs — near-dup corpus broken"
        for r in rows:
            assert 0 <= r["est_decile"] <= 9
            assert 0.0 <= r["mean_est"] <= 1.0 and 0.0 <= r["mean_true"] <= 1.0
            # 16-hash minhash std is ~0.12/sqrt(n); decile means should
            # not be wildly off the exact value
            assert r["mean_abs_err"] <= 0.25
        # per-decile mean estimate must actually live in its decile
        for r in rows:
            if r["est_decile"] < 9:
                assert r["est_decile"] / 10 <= r["mean_est"] < (r["est_decile"] + 1) / 10


class TestLangConfusion:
    def test_shares_sum_to_one_per_lang(self, spark, tmp_path):
        docs = [
            (1, "the cat and the dog is a pet", "en"),
            (2, "le chat et les chiens des une", "en"),  # mislabeled fr
            (3, "der hund und die katze ist nicht", "de"),
            (4, "你好 世界 你好 世界 你好", "zh"),
        ]
        sf = _mk_sf(tmp_path, docs)
        out = QUERIES["lang_confusion"][0](spark, sf)
        sums = {
            r["lang"]: r["s"]
            for r in out.groupBy("lang").agg(F.round(F.sum("frac"), 4).alias("s")).collect()
        }
        assert all(s == pytest.approx(1.0) for s in sums.values())
        cells = {(r["lang"], r["lang_pred"]): r["n"] for r in out.collect()}
        assert cells[("en", "fr")] == 1  # the mislabel shows up
        assert cells[("zh", "zh")] == 1
