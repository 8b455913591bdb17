"""Python-reference checks for the round-14 corpus operators:
ExactSubstr span coalescing (dup_span_stats) and the CCNet-style
held-out bigram-LM perplexity filter — each validated against a
direct python computation on small crafted corpora (independent of
the DuckDB oracle, which shares SQL-shaped blind spots)."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dcafs_spark.queries import QUERIES


def _toks(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _round_half_up(x: float, ndigits: int = 0) -> float:
    m = 10.0**ndigits
    s = math.floor(abs(x) * m + 0.5) / m
    return -s if x < 0 else s


def _mk_sf(tmp_path, docs):
    out = tmp_path / "sf"
    out.mkdir(exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["web"] * len(docs)),
            "n_chars": pa.array([len(d[1] or "") for d in docs], pa.int64()),
        }
    )
    pq.write_table(t, str(out / "documents.parquet"))
    return str(out)


def _ref_dup_spans(corpus, n=8):
    """Direct reference: window census → per-doc union-interval merge."""
    census: dict[str, int] = {}
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in corpus:
        w = _toks(text)
        for i in range(max(len(w) - n + 1, 0)):
            h = hashlib.md5(" ".join(w[i : i + n]).encode()).hexdigest()
            census[h] = census.get(h, 0) + 1
            per_doc.setdefault(doc_id, []).append((i + 1, h))
    out = {}
    for doc_id, text in corpus:
        dup = sorted(p for p, h in per_doc.get(doc_id, []) if census[h] > 1)
        if not dup:
            continue
        spans, covered = 1, 0
        for j, p in enumerate(dup):
            if j + 1 < len(dup):
                covered += min(n, dup[j + 1] - p)
                if dup[j + 1] - p > n:
                    spans += 1
            else:
                covered += n
        nw = len(_toks(text))
        out[doc_id] = (
            nw,
            len(dup),
            spans,
            covered,
            _round_half_up(covered / nw, 6),
        )
    return out


RUN10 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
PHRASE8 = "kilo lima mike november oscar papa quebec romeo"
SPAN_CORPUS = [
    # 10-word run shared across 11/12, different flanks → the 3
    # fully-inside windows coalesce to ONE span of 10 covered tokens
    (11, f"leading text eleven {RUN10} closing remark eleven"),
    (12, f"different opener twelve {RUN10} other ending twelve"),
    # intra-doc repeat: the same 8-word phrase twice, far apart →
    # 2 dup windows, 2 spans, 16 covered tokens (the "any repeat
    # anywhere" rule — census counts occurrences, not distinct docs)
    (13, f"{PHRASE8} filler one two three four five six seven {PHRASE8}"),
    (14, "short doc"),  # < 8 tokens → zero windows, absent
    (15, "wholly original sentence with nothing repeated anywhere in corpus yet"),
]


class TestDupSpanStats:
    def test_matches_python_reference(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, SPAN_CORPUS)
        got = {
            r["doc_id"]: (
                r["n_words"],
                r["dup_windows"],
                r["dup_spans"],
                r["dup_tokens"],
                r["dup_frac"],
            )
            for r in QUERIES["dup_span_stats"][0](spark, sf).collect()
        }
        ref = _ref_dup_spans(SPAN_CORPUS)
        assert got == ref

    def test_coalescing_and_intra_doc_semantics(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, SPAN_CORPUS)
        got = {
            r["doc_id"]: r for r in QUERIES["dup_span_stats"][0](spark, sf).collect()
        }
        # cross-doc run: 3 overlapping windows merge into one 10-token span
        assert got[11]["dup_windows"] == 3
        assert got[11]["dup_spans"] == 1
        assert got[11]["dup_tokens"] == 10
        # intra-doc repeat: both occurrences flagged, two disjoint spans
        assert got[13]["dup_windows"] == 2
        assert got[13]["dup_spans"] == 2
        assert got[13]["dup_tokens"] == 16
        # short and unique docs emit nothing
        assert 14 not in got and 15 not in got

    def test_fixture_invariants(self, spark, sf_dir):
        rows = QUERIES["dup_span_stats"][0](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r["dup_spans"] <= r["dup_windows"]
            assert r["dup_spans"] * 8 <= r["dup_tokens"] <= r["n_words"]
            assert 0 < r["dup_frac"] <= 1.0


def _ref_lm_ppl(corpus, alpha=0.1):
    """Reference replica of the held-out additively-smoothed bigram LM."""
    pairs = []
    for doc_id, text in corpus:
        w = _toks(text)
        pairs.extend((doc_id, x, y) for x, y in zip(w, w[1:]))
    train = [(x, y) for d, x, y in pairs if d % 10 == 0]
    cx: dict[str, int] = {}
    cxy: dict[tuple[str, str], int] = {}
    vocab = set()
    for x, y in train:
        cx[x] = cx.get(x, 0) + 1
        cxy[(x, y)] = cxy.get((x, y), 0) + 1
        vocab.update((x, y))
    v = len(vocab)
    per: dict[int, tuple[int, int]] = {}
    for d, x, y in pairs:
        p = (cxy.get((x, y), 0) + alpha) / (cx.get(x, 0) + alpha * v)
        q = int(_round_half_up(-math.log(p) * 1e6))
        n, s = per.get(d, (0, 0))
        per[d] = (n + 1, s + q)
    stats = {
        d: (n, _round_half_up(s / (n * 1e6), 6)) for d, (n, s) in per.items()
    }
    order = sorted(stats, key=lambda d: (stats[d][1], d))
    k = len(order)
    # ntile(3) semantics: the first k%3 buckets get ceil(k/3) rows
    base, extra = divmod(k, 3)
    sizes = [base + (1 if i < extra else 0) for i in range(3)]
    buckets = {}
    i = 0
    for b, sz in enumerate(sizes):
        for d in order[i : i + sz]:
            buckets[d] = ("head", "middle", "tail")[b]
        i += sz
    return {d: (n, x, buckets[d]) for d, (n, x) in stats.items()}


LM_CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (10, "the quick red fox runs over the green hill near the old mill"),
    (1, "the quick brown fox jumps over the lazy dog"),  # in-domain → low xent
    (2, "the quick red fox runs over the hill"),
    (3, "zz yy xx ww vv uu tt ss"),  # fully OOV → uniform-floor xent
    (4, "near the river bank the old mill stands"),
    (5, "quantum flux harmonics destabilize the chrono lattice array"),
]


class TestLmPplFilter:
    def test_matches_python_reference(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, LM_CORPUS)
        got = {
            r["doc_id"]: (r["n_pairs"], r["lm_xent"], r["ppl_bucket"])
            for r in QUERIES["lm_ppl_filter"][0](spark, sf).collect()
        }
        assert got == _ref_lm_ppl(LM_CORPUS)

    def test_oov_doc_hits_uniform_floor_and_tail(self, spark, tmp_path):
        sf = _mk_sf(tmp_path, LM_CORPUS)
        got = {
            r["doc_id"]: r for r in QUERIES["lm_ppl_filter"][0](spark, sf).collect()
        }
        ref = _ref_lm_ppl(LM_CORPUS)
        v = len(
            {
                t
                for d, text in LM_CORPUS
                if d % 10 == 0
                for t in _toks(text)
                if True
            }
        )
        # every bigram of the all-OOV doc scores exactly ln(V):
        # p = alpha / (alpha * V) = 1/V regardless of alpha
        floor = _round_half_up(
            int(_round_half_up(math.log(v) * 1e6)) / 1e6, 6
        )
        assert got[3]["lm_xent"] == floor == ref[3][1]
        assert got[3]["ppl_bucket"] == "tail"
        # the held-out in-domain doc sits in head
        assert got[1]["ppl_bucket"] == "head"

    def test_fixture_bucket_shape(self, spark, sf_dir):
        rows = QUERIES["lm_ppl_filter"][0](spark, sf_dir).collect()
        assert len(rows) == 500
        by_bucket: dict[str, list] = {}
        for r in rows:
            by_bucket.setdefault(r["ppl_bucket"], []).append(r["lm_xent"])
        sizes = sorted(len(v) for v in by_bucket.values())
        assert sizes == [166, 167, 167]
        # bucket boundaries respect the xent order (ties may straddle,
        # so the comparison is non-strict)
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def _mk_emb_sf(tmp_path, vecs):
    out = tmp_path / "sfe"
    out.mkdir(exist_ok=True)
    t = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, str(out / "embeddings.parquet"))
    return str(out)


def _cluster_fixture():
    """8 one-hot centroids (ids 0-7); cluster 0 oversized (15 members,
    quota 10), cluster 1 small (3), cluster 2 singleton; members get a
    growing off-axis perturbation so centrality order is known."""
    vecs = []
    for i in range(8):
        vecs.append((i, [1.0 if d == i else 0.0 for d in range(8)]))
    sizes = {0: 15, 1: 3, 2: 1}
    vid = 100
    expect = {}
    for c, n in sizes.items():
        expect[c] = []
        for j in range(n):
            v = [0.0] * 8
            v[c] = 1.0
            v[(c + 1) % 8] = 0.02 * (j + 1)  # larger j → less central
            vecs.append((vid, v))
            expect[c].append(vid)
            vid += 1
    return vecs, sizes, expect


class TestClusterBalancedSample:
    def test_quota_centrality_and_sizes(self, spark, tmp_path):
        vecs, sizes, expect = _cluster_fixture()
        sf = _mk_emb_sf(tmp_path, vecs)
        rows = QUERIES["cluster_balanced_sample"][0](spark, sf).collect()
        by_cell: dict[int, list] = {}
        for r in rows:
            by_cell.setdefault(r["cell"], []).append(r)
        assert set(by_cell) == set(sizes)
        for c, members in by_cell.items():
            members.sort(key=lambda r: r["rank"])
            assert len(members) == min(sizes[c], 10)  # quota cap
            assert all(r["cell_size"] == sizes[c] for r in members)
            # ranks are 1..k and centrality (cq) is non-increasing;
            # lower perturbation index (earlier vec_id) ranks first
            assert [r["rank"] for r in members] == list(
                range(1, len(members) + 1)
            )
            assert all(
                members[i]["cq"] >= members[i + 1]["cq"]
                for i in range(len(members) - 1)
            )
            assert [r["vec_id"] for r in members] == expect[c][: len(members)]


def _np_lr_replica(docs, n_buckets=16, iters=30, lr=0.5, l2=1e-3):
    """Numpy replay of train_quality_lr from raw (doc_id, text) rows:
    same md5 bucket hashing, same balanced-weight batch GD."""
    import numpy as np

    feats, ys = [], []
    for doc_id, text in docs:
        toks = _toks(text)
        bids = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_buckets
            for t in toks
        ]
        nt = max(len(bids), 1)
        feats.append([bids.count(i) / nt for i in range(n_buckets)])
        ys.append(1.0 if doc_id % 10 == 0 else 0.0)
    X = np.array(feats)
    y = np.array(ys)
    n, n_pos = len(y), y.sum()
    pos_w = (n - n_pos) / n_pos
    sw = np.where(y > 0, pos_w, 1.0)
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = sw * (p - y)
        denom = sw.sum()
        b -= lr * r.sum() / denom
        w = w - lr * ((X.T @ r) / denom + l2 * w)
    return w, b


class TestQualityClassifierTrained:
    def test_numpy_third_oracle(self, spark, sf_dir):
        import numpy as np

        from dcafs_spark.operators.textan import train_quality_lr
        from dcafs_spark.queries import _docs

        docs = _docs(spark, sf_dir).select(
            "doc_id", "text", (F.col("doc_id") % 10 == 0).cast("int").alias("y")
        )
        w, b = train_quality_lr(docs, "y", memo_key=None)
        raw = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
        wn, bn = _np_lr_replica(raw)
        assert np.allclose(w, wn, rtol=1e-8, atol=1e-10)
        assert math.isclose(b, bn, rel_tol=1e-8, abs_tol=1e-10)

    def test_trained_separates_better_than_fixed(self, spark, sf_dir):
        from dcafs_spark.queries import QUERIES, _quality_weights

        rows = QUERIES["quality_classifier_trained"][0](spark, sf_dir).collect()
        assert len(rows) == 500
        pos = [r["score"] for r in rows if r["label"] == 1]
        neg = [r["score"] for r in rows if r["label"] == 0]
        assert pos and neg

        def auc(p, n):
            wins = sum(
                (1.0 if a > b else 0.5 if a == b else 0.0) for a in p for b in n
            )
            return wins / (len(p) * len(n))

        trained_auc = auc(pos, neg)
        # fixed-weight scorer on the same docs/labels as the control
        from dcafs_spark.operators.textan import linear_quality_score
        from dcafs_spark.queries import _docs

        fixed = linear_quality_score(
            _docs(spark, sf_dir).select("doc_id", "text"),
            _quality_weights(),
            bias=0.25,
        ).select("doc_id", "score").collect()
        fs = {r["doc_id"]: r["score"] for r in fixed}
        fpos = [fs[r["doc_id"]] for r in rows if r["label"] == 1]
        fneg = [fs[r["doc_id"]] for r in rows if r["label"] == 0]
        assert trained_auc >= auc(fpos, fneg)
        # and the trained model genuinely ranks positives higher than
        # chance on its training distribution
        assert trained_auc > 0.5


class TestIvfpqResidual:
    def test_residual_recall_at_least_raw(self, spark, sf_dir):
        """IVFADC fidelity: residual-quantized codes must retrieve at
        least as well as raw-vector codes against the exact cosine
        top-5 (same cells, same probe set, same codebooks)."""
        import numpy as np
        import pyarrow.parquet as papq

        t = papq.read_table(f"{sf_dir}/embeddings.parquet")
        ids = np.array(t["vec_id"].to_pylist())
        V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        qm = (ids >= 8) & (ids < 16)
        cm = ids >= 16
        Q, qids = V[qm], ids[qm]
        C, cids = V[cm], ids[cm]
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        sims = Qn @ Cn.T
        exact = {}
        for i, qid in enumerate(qids):
            order = np.lexsort((cids, -sims[i]))[:5]
            exact[int(qid)] = set(int(cids[j]) for j in order)

        def recall(name):
            rows = QUERIES[name][0](spark, sf_dir).collect()
            got: dict[int, set] = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            hits = sum(len(got.get(q, set()) & exact[q]) for q in exact)
            return hits / (5 * len(exact))

        res = recall("similarity_ivfpq_residual")
        raw = recall("similarity_ivfpq")
        assert res >= raw
        assert res > 0  # the gate actually retrieves true neighbors
