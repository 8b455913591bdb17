"""Dedup + similarity operators: planted near-dups must be found;
brute-force vs LSH agreement on self-similarity."""

from pyspark.sql import functions as F

from dcafs_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from dcafs_spark.operators.similarity import cosine_topk, lsh_topk


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base + " extra"),  # near-dup of 1
        (3, "completely different words about spark catalyst optimizer plans"),
        (4, base),  # exact dup of 1
        (5, "another unrelated document mentioning shuffles and partitions only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark))
    rows = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert rows[1] == 2  # docs 1+4 collapse, keep min id
    assert out.count() == 4


def test_minhash_lsh_finds_planted_pair(spark):
    pairs = minhash_lsh_pairs(_docs(spark), threshold=0.3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 4) in got  # exact dup: jaccard 1.0
    assert (1, 2) in got or (2, 4) in got  # near dup
    assert all(a < b for a, b in got)


def test_minhash_copy_group_expansion(spark):
    """Exact copies are pre-collapsed before banding (hot-bucket fix):
    the band join must see ONE signature per distinct content, yet the
    pair output must still contain every within-copy-group pair at
    est_jaccard exactly 1.0 — row-identical to the naive per-doc join."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text) for i in range(6)] + [
        (10, "unrelated corpus text about shuffle partitions and catalyst")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in minhash_lsh_pairs(df).collect()}
    expected = {(a, b) for a in range(6) for b in range(a + 1, 6)}
    assert set(got) == expected  # all C(6,2)=15 pairs, nothing else
    assert all(v == 1.0 for v in got.values())


def test_minhash_copy_groups_mixed_with_near_dups(spark):
    """Cross-group expansion: copies of A × copies of near-dup B all
    pair up, carrying the representatives' estimate, with id_a < id_b
    regardless of which group holds the smaller id."""
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    b = a + " extra"
    df = spark.createDataFrame(
        [(1, a), (7, a), (2, b), (9, b)], "doc_id long, text string"
    )
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in minhash_lsh_pairs(df, threshold=0.3).collect()}
    assert got[(1, 7)] == 1.0 and got[(2, 9)] == 1.0  # within groups
    cross = {(1, 2), (2, 7), (1, 9), (7, 9)}
    assert cross <= set(got)  # every member×member cross pair
    ests = {got[p] for p in cross}
    assert len(ests) == 1  # all inherit the same rep-pair estimate
    assert all(a_ < b_ for a_, b_ in got)


def test_minhash_bucket_cap_skips_hot_bucket(spark):
    """Opt-in bucket_cap bounds join fan-out: with cap=1 every bucket
    holding >1 distinct content is skipped, so near-dup pairs vanish —
    but exact-copy pairs survive (they bypass the band join)."""
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    df = spark.createDataFrame(
        [(1, a), (2, a + " extra"), (3, a)], "doc_id long, text string"
    )
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, threshold=0.3, bucket_cap=1).collect()
    }
    assert capped == {(1, 3)}  # copy-group pair only; banded pair capped away
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, threshold=0.3).collect()
    }
    assert {(1, 2), (1, 3), (2, 3)} == uncapped


def test_cross_dedup_copy_groups_both_sides(spark):
    """Cross-corpus dedup under duplicate floods on BOTH sides: every
    copy of a condemned new content is condemned, the elected ref match
    is the min id of the best-scoring ref copy-group, and a new content
    that is itself an exact copy of a ref doc scores est 1.0."""
    from dcafs_spark.operators.dedup import cross_minhash_dedup

    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    novel = "completely different words about spark catalyst optimizer plans"
    ref = spark.createDataFrame(
        [(10, a), (11, a), (12, novel)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, a), (101, a), (102, a + " extra"), (103, "entirely unrelated text about shuffles")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cross_minhash_dedup(new, ref, threshold=0.3).collect()}
    assert set(out) == {100, 101, 102}  # all copies condemned; novel survives
    assert out[100]["ref_id"] == 10 and out[101]["ref_id"] == 10  # group-min election
    assert out[100]["est_jaccard"] == 1.0  # exact copy of a ref content
    assert out[102]["ref_id"] == 10 and out[102]["est_jaccard"] < 1.0


def test_ngram_jaccard(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 4)] == 1.0
    assert (1, 3) not in got


def test_simhash_near_zero_hamming_for_dups(spark):
    pairs = simhash_pairs(_docs(spark), max_hamming=6)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 4)] == 0


def _vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_dedup_copy_group_expansion(spark):
    """Bit-identical vectors are collapsed before the sign-LSH bucket
    join and re-expanded after: every within-copy-group pair surfaces
    at cos_sim exactly 1.0, cross near-dup pairs inherit their
    representatives' cosine, orthogonal vectors never pair."""
    from dcafs_spark.operators.similarity import embedding_dedup_pairs, hyperplanes

    v = [1.0, 0.2, -0.3, 0.05]
    near = [1.0, 0.2, -0.3, 0.06]  # tiny angle from v
    ortho = [-0.2, 1.0, 0.0, 0.0]
    rows = [(0, v), (1, v), (2, v), (3, near), (4, near), (5, ortho)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dedup_pairs(
            emb, hyperplanes(4, 6, 42), threshold=0.9, center=False
        ).collect()  # center=False: the test pins UNcentered bucket geometry
    }
    for p in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        assert got[p] == 1.0  # copy groups, exactly 1.0 at 6dp
    cross = {(a, b) for a, b in got if (a < 3) != (b < 3) and 5 not in (a, b)}
    assert cross == {(0, 3), (0, 4), (1, 3), (1, 4), (2, 3), (2, 4)}
    assert len({got[p] for p in cross}) == 1  # one inherited cosine
    assert not any(5 in p for p in got)


def test_embedding_dedup_centering_rebalances_buckets(spark):
    """Anisotropic corpora (a dominant mean direction — the norm for LM
    embeddings) collapse sign-LSH buckets: most vectors agree on most
    plane signs, the self-join goes quadratic (SCALE.md round 9:
    measured 58x at 128k vectors). center=True subtracts the corpus
    mean inside the bucketing only — occupancy rebalances, the planted
    near-dups are still found, and reported cosines are computed on the
    ORIGINAL vectors."""
    from dcafs_spark.operators.similarity import (
        dlit_array,
        embedding_dedup_pairs,
        hyperplanes,
        lsh_bucket,
    )

    import random as _random

    dim, n, shift = 16, 300, 6.0
    rows = []
    for i in range(n):
        rng = _random.Random(i)
        v = [rng.gauss(0.0, 1.0) + shift for _ in range(dim)]
        rows.append((i, v))
    # planted near-identical pairs (distinct vectors, tiny angle)
    for k in range(5):
        v = [x + (0.0001 if j == 0 else 0.0) for j, x in enumerate(rows[k][1])]
        rows.append((1000 + k, v))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    planes = hyperplanes(dim, 10, 42)

    def max_occ(vec_expr):
        return (
            emb.select(lsh_bucket(vec_expr, planes).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    mu_row = emb.agg(*[F.avg(F.element_at("v", j + 1)) for j in range(dim)]).first()
    mu = dlit_array([float(x) for x in mu_row])
    raw_occ = max_occ(F.col("v"))
    centered_occ = max_occ(F.zip_with(F.col("v"), mu, lambda x, m: x - m))
    assert raw_occ > n // 3  # mean direction collapses the buckets
    assert centered_occ < raw_occ // 4  # centering rebalances

    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dedup_pairs(emb, planes, threshold=0.999, center=True).collect()
    }
    for k in range(5):
        assert (k, 1000 + k) in got  # planted pairs recovered
        # cosine computed on ORIGINAL (shifted) vectors, not centered
        assert got[(k, 1000 + k)] >= 0.999


def test_embedding_dedup_zero_vectors_excluded(spark):
    """Zero vectors have no direction: copies of the all-zero vector
    must NOT surface as cos 1.0 within-group pairs (the un-collapsed
    join dropped them via NULL cosine; ANSI mode would crash on the
    0-norm division), and nonzero pairs are unaffected."""
    from dcafs_spark.operators.similarity import embedding_dedup_pairs, hyperplanes

    v = [1.0, 0.2, -0.3, 0.05]
    rows = [(0, v), (1, v), (2, [0.0, 0.0, 0.0, 0.0]), (3, [0.0, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dedup_pairs(emb, hyperplanes(4, 6, 42), threshold=0.9).collect()
    }
    assert got == {(0, 1): 1.0}  # zero-vector copies never pair


def test_lsh_topk_centering_spreads_buckets_keeps_neighbors(spark):
    """Same anisotropy hazard on the ANN search path: a mean-shifted
    corpus piles into a handful of sign buckets, making every query
    scan most of the corpus (cost, not recall, is what collapses).
    center=True spreads the corpus across buckets and the planted
    nearest neighbor is still returned at rank 1."""
    import random as _random

    from dcafs_spark.operators.similarity import dlit_array, hyperplanes, lsh_bucket, lsh_topk

    dim, n, shift = 16, 300, 6.0
    rows = []
    for i in range(n):
        rng = _random.Random(i)
        rows.append((i, [rng.gauss(0.0, 1.0) + shift for _ in range(dim)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # queries = tiny perturbations of corpus vectors 0..2
    qrows = [(100 + i, [x + 0.0001 for x in rows[i][1]]) for i in range(3)]
    queries = spark.createDataFrame(qrows, "query_id long, query_vec array<double>")

    planes = hyperplanes(dim, 10, 42)
    mu_row = corpus.agg(*[F.avg(F.element_at("embedding", j + 1)) for j in range(dim)]).first()
    mu = dlit_array([float(x) for x in mu_row])
    n_raw = corpus.select(lsh_bucket(F.col("embedding"), planes).alias("b")).distinct().count()
    n_cen = corpus.select(
        lsh_bucket(F.zip_with(F.col("embedding"), mu, lambda x, m: x - m), planes).alias("b")
    ).distinct().count()
    assert n_cen > 4 * n_raw  # centering spreads the corpus over buckets

    got = lsh_topk(corpus, queries, k=3, n_planes=10, dim=dim, center=True).collect()
    top1 = {r["query_id"]: r["vec_id"] for r in got if r["rank"] == 1}
    for i in range(3):
        assert top1[100 + i] == i  # planted neighbor survives centering


def test_embedding_dedup_multiprobe_superset(spark):
    """Multiprobe output must contain every exact-bucket pair (offset 0
    is among the probes) and recover at least the planted pair whose
    buckets differ in exactly one sign bit."""
    import math

    from dcafs_spark.operators.similarity import (
        embedding_dedup_pairs,
        hyperplanes,
        lsh_bucket,
    )

    planes = hyperplanes(4, 6, 42)
    base = [0.7, -0.3, 0.52, 0.11]
    # reflect base across its CLOSEST hyperplane (barely crossing it):
    # flips exactly that sign bit while staying near-identical in angle
    dots = [sum(a * b for a, b in zip(base, p)) for p in planes]
    j = min(range(len(planes)), key=lambda k: abs(dots[k]))
    pj = planes[j]
    scale = 2.0 * dots[j] / sum(x * x for x in pj) * 1.0001
    flip1 = [b_ - scale * x for b_, x in zip(base, pj)]

    def bucket_of(v):
        bits = 0
        for k, p in enumerate(planes):
            if sum(a * b for a, b in zip(v, p)) >= 0:
                bits |= 1 << k
        return bits

    assert bin(bucket_of(base) ^ bucket_of(flip1)).count("1") == 1
    cos = sum(a * b for a, b in zip(base, flip1)) / math.sqrt(
        sum(a * a for a in base) * sum(a * a for a in flip1)
    )
    assert cos > 0.99  # near-identical pair the exact join still misses
    rows = [(0, base), (1, flip1)]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    plain = {
        (r["id_a"], r["id_b"])
        for r in embedding_dedup_pairs(emb, planes, threshold=0.99, center=False).collect()
    }  # center=False in both: flip1 is constructed hamming-1 in the RAW plane basis
    multi = {
        (r["id_a"], r["id_b"])
        for r in embedding_dedup_pairs(
            emb, planes, threshold=0.99, multiprobe=True, center=False
        ).collect()
    }
    assert plain <= multi
    assert (0, 1) not in plain  # buckets differ -> exact join misses it
    assert (0, 1) in multi  # hamming-1 probe recovers it


def test_cosine_topk(spark):
    emb = _vectors(spark)
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb.filter("vec_id > 0"), q, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2]  # most similar first
    assert out[0]["cos_sim"] > 0.99


def test_lsh_topk_self_bucket(spark):
    emb = _vectors(spark)
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(emb, q, k=1, n_planes=4, dim=4).collect()
    # identical vector lands in the same bucket and ranks first
    assert out[0]["vec_id"] == 0 and out[0]["cos_sim"] == 1.0


def test_lsh_multiprobe_recall_superset(spark):
    """Multi-probe candidates are a superset of single-bucket, and the
    planted near-identical vector always ranks first."""
    emb = _vectors(spark)
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    single = {r["vec_id"] for r in lsh_topk(emb, q, k=5, n_planes=4, dim=4).collect()}
    multi_rows = lsh_topk(emb, q, k=5, n_planes=4, dim=4, multiprobe=True).collect()
    multi = {r["vec_id"] for r in multi_rows}
    assert single <= multi
    best = min(multi_rows, key=lambda r: r["rank"])
    assert best["vec_id"] == 0 and best["cos_sim"] == 1.0
    # no duplicate (query, vec) pairs despite overlapping probes
    pairs = [(r["query_id"], r["vec_id"]) for r in multi_rows]
    assert len(pairs) == len(set(pairs))


def test_kmeans_train_matches_numpy_lloyds(spark, sf_dir):
    """Distributed spherical Lloyd's equals a numpy replica: same init
    (first k vectors), same assignment rule, same means."""
    import numpy as np

    from dcafs_spark.operators.similarity import kmeans_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    got = kmeans_train(emb, k=4, dim=64, iters=3)

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    cents = X[:4].copy()
    for _ in range(3):
        normed = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        dots = X @ normed.T
        # argmax with first-wins tiebreak == the Spark fold's > comparison
        assign = np.argmax(dots, axis=1)
        new = cents.copy()
        for c in range(4):
            if (assign == c).any():
                new[c] = X[assign == c].mean(axis=0)
        if np.array_equal(new, cents):
            break
        cents = new
    assert np.allclose(np.array(got), cents, atol=1e-9)


class TestConnectedComponents:
    """Min-label propagation: transitive closure of dup pairs."""

    def _cc(self, spark, edges):
        from dcafs_spark.operators.dedup import connected_components

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        rows = connected_components(df).collect()
        return {r["node"]: r["cluster"] for r in rows}

    def test_chain_converges_to_min(self, spark):
        # 1-2-3-4-5 chain: diameter 4 forces several propagation rounds
        got = self._cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}

    def test_two_components_and_star(self, spark):
        got = self._cc(spark, [(10, 11), (10, 12), (10, 13), (20, 21)])
        assert got == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}

    def test_pair_order_irrelevant(self, spark):
        # edges given high->low: min label must still win
        got = self._cc(spark, [(9, 3), (3, 7), (7, 1)])
        assert set(got.values()) == {1} and len(got) == 4

    def test_partitioning_invariance(self, spark):
        from dcafs_spark.operators.dedup import connected_components

        edges = [(i, i + 1) for i in range(1, 30)] + [(100, 101), (101, 150)]
        orig = spark.conf.get("spark.sql.shuffle.partitions")
        outs = []
        try:
            for n in ("1", "13"):
                spark.conf.set("spark.sql.shuffle.partitions", n)
                df = spark.createDataFrame(edges, "id_a long, id_b long")
                outs.append(sorted(map(tuple, connected_components(df).collect())))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        assert outs[0] == outs[1]
        assert all(c == 1 for _n, c in outs[0][:30])


class TestDecontaminate:
    def test_flags_overlapping_docs_only(self, spark):
        from dcafs_spark.operators.dedup import decontaminate

        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "completely different words about spark and shuffles here"),
                (3, "prefix then the quick brown fox jumps over the lazy dog too"),
            ],
            "doc_id long, text string",
        )
        probes = spark.createDataFrame(
            [("benchmark says the quick brown fox jumps over the lazy dog",)],
            "text string",
        )
        got = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, probes, shingle_n=8).collect()}
        # docs 1 and 3 share 8-grams of the fox sentence; doc 2 is clean
        assert set(got) == {1, 3}
        assert all(v >= 1 for v in got.values())

    def test_clean_corpus_empty_result(self, spark):
        from dcafs_spark.operators.dedup import decontaminate

        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
            "doc_id long, text string",
        )
        probes = spark.createDataFrame(
            [("one two three four five six seven eight nine ten",)], "text string"
        )
        assert decontaminate(corpus, probes, shingle_n=8).count() == 0

    def test_plan_broadcasts_probes(self, spark):
        from dcafs_spark.operators.dedup import decontaminate

        corpus = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id long, text string"
        )
        probes = spark.createDataFrame([("a b c d e f g h i j",)], "text string")
        plan = (
            decontaminate(corpus, probes, shingle_n=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan  # corpus side never shuffles for the probe join


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF ANN quality evidence: k-means cells + nprobe=2 keeps
    recall@5 high against exact cosine top-5 on the real embeddings
    table (the scale path must not silently return junk)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dcafs_spark.operators.similarity import cosine, cosine_topk, dlit_array, kmeans_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=5, vec_col="v")
    cents = kmeans_train(emb, k=4, dim=64, iters=3, vec_col="v")

    def assign(df, vcol, keep, n_probe):
        scored = None
        for cid, cv in enumerate(cents):
            d = cosine(F.col(vcol), dlit_array(cv))
            row = df.select(*keep, F.lit(cid).alias("cell"), d.alias("cdot"))
            scored = row if scored is None else scored.unionByName(row)
        w = Window.partitionBy(*keep).orderBy(F.desc("cdot"), F.asc("cell"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_probe)
            .drop("cdot", "crank")
        )

    c_cells = assign(emb, "v", ["vec_id", "v"], 1)
    q_cells = assign(queries, "query_vec", ["query_id", "query_vec"], 2)
    scored = c_cells.join(q_cells, "cell").select(
        "query_id", "vec_id", cosine(F.col("v"), F.col("query_vec")).alias("cos_sim")
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    approx = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)

    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"IVF recall@5 collapsed: {recall}"


def test_ivfpq_candidates_respect_cells_and_rank_exactly(spark, sf_dir):
    """Acceptance for the composed IVF-PQ gate: every returned
    candidate lies in one of its query's 2 probed cells (the prune is
    real), ranks are a correct ascending ordering of the reported
    relative-ADC scores, and a numpy replica of cell assignment + PQ
    encode + relative ADC reproduces the top-5 sets exactly (the
    third-oracle convention)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dcafs_spark.queries import QUERIES, q_similarity_ivfpq
    from dcafs_spark.operators.similarity import pq_codebooks_fixed

    out = q_similarity_ivfpq(spark, sf_dir).collect()
    emb = {
        int(r["vec_id"]): np.array(r["v"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    }
    cents = {cid: emb[cid] for cid in range(8)}
    books = np.array(pq_codebooks_fixed(64, 8, 16, seed=7))  # (8, 16, 8)

    # half-AWAY-FROM-ZERO micro-rounding (r13 ADVICE): Spark F.round and
    # DuckDB round are half-away, while python round()/np.round are
    # banker's — an exact .5 micro-unit would silently diverge here
    def _half(x):
        import math

        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def _half_vec(a):
        return np.floor(np.abs(a) + 0.5) * np.sign(a)

    def cells(v, n):
        q = sorted(
            (
                (-_half(
                    1e6
                    * float(np.dot(v, cv) / (np.linalg.norm(v) * np.linalg.norm(cv)))
                ), cid)
                for cid, cv in cents.items()
            ),
        )
        return [cid for _d, cid in q[:n]]

    def code(v):
        cs = []
        for s in range(8):
            sub = v[s * 8 : (s + 1) * 8]
            d = (books[s] ** 2).sum(axis=1) - 2.0 * (books[s] @ sub)
            cs.append(int(np.argmin(_half_vec(d * 1e6))))
        return cs

    def adc_rel(qv, cs):
        t = 0.0
        for s, j in enumerate(cs):
            t += (books[s][j] ** 2).sum() - 2.0 * float(np.dot(qv[s * 8 : (s + 1) * 8], books[s][j]))
        return _half(t * 1e6)

    corpus_cell = {vid: cells(v, 1)[0] for vid, v in emb.items() if vid >= 16}
    corpus_code = {vid: code(v) for vid, v in emb.items() if vid >= 16}
    by_q: dict = {}
    for r in out:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    assert set(by_q) == set(range(8, 16))
    for qid, rows in by_q.items():
        probed = set(cells(emb[qid], 2))
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["adc_rel_micro"] for r in rows]
        assert scores == sorted(scores)
        for r in rows:
            assert corpus_cell[int(r["vec_id"])] in probed
        # numpy replica of the full top-5
        cands = [
            (adc_rel(emb[qid], corpus_code[vid]), vid)
            for vid, c in corpus_cell.items()
            if c in probed
        ]
        want = [vid for _d, vid in sorted(cands)[:5]]
        assert [int(r["vec_id"]) for r in rows] == want


def test_ivfpq_trained_numpy_oracle_and_recall(spark, sf_dir):
    """Acceptance for the fully-trained IVF-PQ gate (r13 verdict ask
    #6, rows-only by design): a numpy replica built from the
    Spark-returned trained centroids/codebooks reproduces the top-5
    sets EXACTLY (cell assignment + encode + relative ADC + rank, all
    with ordered accumulation and half-away micro-rounding), and
    trained recall@5 against exact-L2 ground truth is >= the
    fixed-codebook gate's."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from dcafs_spark.queries import (
        _trained_ivf_cents,
        _trained_pq_books,
        q_similarity_ivfpq,
        q_similarity_ivfpq_trained,
    )
    from dcafs_spark.runtime import checkpoint

    out = q_similarity_ivfpq_trained(spark, sf_dir).collect()
    emb_df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .transform(checkpoint)
    )
    # the memos hand back the IDENTICAL python floats the gate used
    cents = _trained_ivf_cents(emb_df, sf_dir, k=8)
    books = np.array(_trained_pq_books(emb_df, sf_dir, m=8, kk=16))
    cn2 = [[sum(x * x for x in c) for c in book] for book in books.tolist()]
    emb = {
        int(r["vec_id"]): np.array(r["v"], dtype=np.float64)
        for r in emb_df.collect()
    }

    def _half(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    def dot_seq(v, c):
        acc = 0.0
        for t in range(len(c)):
            acc = acc + v[t] * c[t]
        return acc

    def norm_seq(v):
        acc = 0.0
        for t in range(len(v)):
            acc = acc + v[t] * v[t]
        return math.sqrt(acc)

    def cells(v, n):
        q = sorted(
            (-_half(1e6 * (dot_seq(v, cv) / (norm_seq(v) * norm_seq(cv)))), cid)
            for cid, cv in enumerate(cents)
        )
        return [cid for _d, cid in q[:n]]

    def code(v):
        cs = []
        for s in range(8):
            sub = v[s * 8 : (s + 1) * 8]
            best = None
            for j in range(16):
                d = cn2[s][j] - 2.0 * dot_seq(sub, books[s][j])
                dm = _half(d * 1e6)
                if best is None or dm < best[0]:
                    best = (dm, j)
            cs.append(best[1])
        return cs

    def adc_rel(qv, cs):
        t = None
        for s, j in enumerate(cs):
            term = cn2[s][j] - 2.0 * dot_seq(qv[s * 8 : (s + 1) * 8], books[s][j])
            t = term if t is None else t + term
        return _half(t * 1e6)

    corpus_ids = [vid for vid in emb if vid >= 16]
    corpus_cell = {vid: cells(emb[vid], 1)[0] for vid in corpus_ids}
    corpus_code = {vid: code(emb[vid]) for vid in corpus_ids}
    by_q: dict = {}
    for r in out:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    assert set(by_q) == set(range(8, 16))

    def exact_top5(qid):
        d = sorted(
            (float(np.dot(emb[qid] - emb[vid], emb[qid] - emb[vid])), vid)
            for vid in corpus_ids
        )
        return {vid for _d, vid in d[:5]}

    hits_trained = 0
    for qid, rows in by_q.items():
        probed = set(cells(emb[qid], 2))
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert corpus_cell[int(r["vec_id"])] in probed
        cands = sorted(
            (adc_rel(emb[qid], corpus_code[vid]), vid)
            for vid, c in corpus_cell.items()
            if c in probed
        )
        want = [vid for _d, vid in cands[:5]]
        assert [int(r["vec_id"]) for r in rows] == want  # exact replica
        hits_trained += len({int(r["vec_id"]) for r in rows} & exact_top5(qid))

    fixed_rows = q_similarity_ivfpq(spark, sf_dir).collect()
    by_q_fixed: dict = {}
    for r in fixed_rows:
        by_q_fixed.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    hits_fixed = sum(
        len(vids & exact_top5(qid)) for qid, vids in by_q_fixed.items()
    )
    assert hits_trained >= hits_fixed, (hits_trained, hits_fixed)


class TestPqEncodeArrow:
    """r13 verdict ask #3: the Arrow/numpy ingest-side PQ encode must
    be byte-identical to the Catalyst expression path."""

    def test_identity_on_fixture_embeddings(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from dcafs_spark.operators.similarity import pq_codebooks_fixed, pq_encode

        books = pq_codebooks_fixed(64, 8, 16, seed=7)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", F.col("embedding").alias("v")
        )
        for micro in (False, True):
            a = {
                r["vec_id"]: list(r["code"])
                for r in pq_encode(
                    emb, "v", books, quantize_micro=micro, engine="expr"
                ).collect()
            }
            b = {
                r["vec_id"]: list(r["code"])
                for r in pq_encode(
                    emb, "v", books, quantize_micro=micro, engine="arrow"
                ).collect()
            }
            assert a == b and len(a) >= 100

    def test_tie_break_first_min_both_engines(self, spark):
        from dcafs_spark.operators.similarity import pq_encode

        # two IDENTICAL centroids (indices 1 and 2): exact distance tie
        # must resolve to the lower index in both engines
        c = [0.5, -0.25]
        books = [[[9.0, 9.0], c, list(c), [0.5, -0.25]]]
        df = spark.createDataFrame(
            [(1, [0.5, -0.25]), (2, [0.0, 0.0]), (3, [10.0, 10.0])],
            "vec_id long, v array<double>",
        )
        for micro in (False, True):
            for eng in ("expr", "arrow"):
                got = {
                    r["vec_id"]: list(r["code"])
                    for r in pq_encode(
                        df, "v", books, quantize_micro=micro, engine=eng
                    ).collect()
                }
                assert got == {1: [1], 2: [1], 3: [0]}, (micro, eng)

    def test_plan_is_narrow_map(self, spark):
        from dcafs_spark.operators.similarity import pq_codebooks_fixed, pq_encode

        df = spark.createDataFrame([(1, [0.0] * 64)], "vec_id long, v array<double>")
        plan = (
            pq_encode(df, "v", pq_codebooks_fixed(64, 8, 16), engine="arrow")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInPandas" in plan and "Exchange" not in plan


class TestIncrementalDedup:
    def test_across_batches_and_within_batch(self, spark, tmp_path):
        from dcafs_spark.operators.dedup import incremental_dedup

        store = str(tmp_path / "seen")
        b1 = spark.createDataFrame(
            [(1, "alpha text"), (2, "beta text"), (3, "alpha  text")],  # 3 dups 1 after norm
            "doc_id int, text string",
        )
        s1 = incremental_dedup(spark, b1, store)
        assert sorted(r["doc_id"] for r in s1.collect()) == [1, 2]  # min-id wins in-batch

        b2 = spark.createDataFrame(
            [(10, "beta text"), (11, "gamma text"), (12, "gamma text")],
            "doc_id int, text string",
        )
        s2 = incremental_dedup(spark, b2, store)
        assert sorted(r["doc_id"] for r in s2.collect()) == [11]  # beta seen in run 1

        b3 = spark.createDataFrame([(20, "gamma text")], "doc_id int, text string")
        assert incremental_dedup(spark, b3, store).count() == 0

    def test_empty_store_bootstrap(self, spark, tmp_path):
        from dcafs_spark.operators.dedup import incremental_dedup

        out = incremental_dedup(
            spark,
            spark.createDataFrame([(1, "x")], "doc_id int, text string"),
            str(tmp_path / "fresh_store"),
        )
        assert out.count() == 1
        assert spark.read.parquet(str(tmp_path / "fresh_store")).count() == 1


class TestCrossDedup:
    def test_condemns_near_dups_not_novel(self, spark, sf_dir):
        from dcafs_spark.queries import q_cross_dedup

        out = q_cross_dedup(spark, sf_dir).collect()
        ids = sorted(r["doc_id"] for r in out)
        assert all(i < 2_000_000 for i in ids), "a reversed novel doc was condemned"
        assert len(ids) == len(set(ids)), "more than one best match per doc"
        assert all(1_000_000 <= i < 1_000_050 for i in ids)
        for r in out:
            assert r["est_jaccard"] >= 0.5
            # best match is a real corpus doc; the source doc unless the
            # corpus holds an identical twin with a lower id (the
            # generator plants duplicate families — ties break low)
            assert 0 <= r["ref_id"] < 500
            assert r["ref_id"] <= r["doc_id"] - 1_000_000


def test_collapse_paths_row_identical(spark):
    """The duplicate-density probe is performance-only: collapse=True
    (pre-collapse + expansion) and collapse=False (per-document join)
    must emit IDENTICAL rows, on a corpus that has both exact copies
    and near-dups — within-copy-group pairs score exactly 1.0 on both
    paths (identical shingle sets / signatures / vectors)."""
    docs = _docs(spark)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(minhash_lsh_pairs(docs, threshold=0.3, collapse=True)) == rows(
        minhash_lsh_pairs(docs, threshold=0.3, collapse=False)
    )
    assert rows(ngram_jaccard_pairs(docs, threshold=0.3, collapse=True)) == rows(
        ngram_jaccard_pairs(docs, threshold=0.3, collapse=False)
    )
    assert rows(simhash_pairs(docs, max_hamming=16, collapse=True)) == rows(
        simhash_pairs(docs, max_hamming=16, collapse=False)
    )
    from dcafs_spark.operators.similarity import embedding_dedup_pairs, hyperplanes

    v = [1.0, 0.2, -0.3, 0.05]
    near = [1.0, 0.2, -0.3, 0.06]
    emb = spark.createDataFrame(
        [(0, v), (1, v), (2, near), (3, [-0.2, 1.0, 0.0, 0.0])], "vec_id long, v array<double>"
    )
    planes = hyperplanes(4, 6, 42)
    for mp in (False, True):
        assert rows(
            embedding_dedup_pairs(emb, planes, 0.9, center=False, collapse=True, multiprobe=mp)
        ) == rows(
            embedding_dedup_pairs(emb, planes, 0.9, center=False, collapse=False, multiprobe=mp)
        )


def test_collapse_auto_probe_and_memo(spark):
    """Auto mode measures duplicate density (HLL distinct ratio) and
    memoizes it per probe plan: an all-distinct corpus reads ~1.0
    (→ direct path), a copy-flood reads low (→ collapse), and the
    second call for the same corpus hits the cache."""
    from dcafs_spark.operators.dedup import (
        _DUP_RATIO_CACHE,
        approx_distinct_ratio,
        normalize_text,
    )

    distinct = spark.range(200).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), F.col("id")).alias("text")
    )
    flood = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("same text every row").alias("text")
    )
    key = F.md5(normalize_text(F.col("text")))
    before = len(_DUP_RATIO_CACHE)
    r_distinct = approx_distinct_ratio(distinct, key)
    r_flood = approx_distinct_ratio(flood, key)
    assert r_distinct > 0.97
    assert r_flood < 0.05
    assert len(_DUP_RATIO_CACHE) == before + 2
    # memo hit: same corpus, no new entry, same value
    assert approx_distinct_ratio(distinct, key) == r_distinct
    assert len(_DUP_RATIO_CACHE) == before + 2


def test_center_is_the_default_and_spreads_buckets(spark):
    """The production default must center (SCALE.md round 9: a
    mean-shifted corpus melts sign-LSH buckets 58x). Functional check
    on the ANN path: on a 6-sigma-shifted corpus the UNcentered query
    bucket piles up a large fraction of the corpus, while the default
    call returns strictly fewer candidates — and still ranks the
    planted neighbor first."""
    import inspect
    import random as _random

    from dcafs_spark.operators.similarity import embedding_dedup_pairs, lsh_topk

    assert inspect.signature(lsh_topk).parameters["center"].default is True
    assert inspect.signature(embedding_dedup_pairs).parameters["center"].default is True

    dim, n, shift = 8, 64, 6.0
    rows = []
    for i in range(n):
        rng = _random.Random(1000 + i)
        rows.append((i, [rng.gauss(0.0, 1.0) + shift for _ in range(dim)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(900, [x + 0.0001 for x in rows[0][1]])], "query_id long, query_vec array<double>"
    )
    uncentered = lsh_topk(corpus, q, k=n, n_planes=6, dim=dim, center=False).collect()
    default = lsh_topk(corpus, q, k=n, n_planes=6, dim=dim).collect()
    assert len(uncentered) > n // 3  # mean direction piles up the query bucket
    assert len(default) < len(uncentered)  # centering spread the buckets
    best = min(default, key=lambda r: r["rank"])
    assert best["vec_id"] == 0 and best["cos_sim"] >= 0.999


def test_cross_dedup_collapse_paths_identical(spark):
    """cross_minhash_dedup's probe decision is performance-only: the
    collapsed (content-level election + re-expansion) and direct
    (per-document) paths must emit identical condemned rows, including
    the max-est / min-ref_id tie-break, on corpora with exact copies
    on both sides."""
    from dcafs_spark.operators.dedup import cross_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    ref = spark.createDataFrame(
        [(10, base), (11, base), (12, "spark catalyst optimizer plans only here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " extra"), (4, "entirely different content words")],
        "doc_id long, text string",
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    a = rows(cross_minhash_dedup(new, ref, threshold=0.3, collapse=True))
    b = rows(cross_minhash_dedup(new, ref, threshold=0.3, collapse=False))
    assert a == b
    got = {r[0]: (r[1], r[2]) for r in a}
    assert got[1] == (10, 1.0)  # exact copy: best ref match, min ref id on tie
    assert got[2] == (10, 1.0)
    assert 4 not in got  # unrelated doc survives


def test_semantic_dedup_keeps_cluster_fringe(spark):
    """SemDeDup dominance: of a near-dup pair the member with LOWER
    centroid similarity survives (the paper's diversity rule)."""
    from dcafs_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (1, [10.0, 0.0, 0.0, 0.0]),      # c_sim 10.0 — closer to centroid
        (2, [9.99, 0.3, 0.0, 0.0]),      # near-dup of 1, c_sim 9.99 — fringe
        (3, [0.0, 5.0, 0.0, 0.0]),       # other cluster, alone
        (4, [0.0, 0.0, 0.0, 0.0]),       # zero vector: no direction
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict() for r in semantic_dedup(emb, cents, threshold=0.99).collect()}
    assert len(out) == 4
    assert out[1]["kept"] is False and out[2]["kept"] is True
    assert out[1]["cluster"] == 0 and out[3]["cluster"] == 1
    assert out[3]["kept"] is True
    assert out[4]["kept"] is True and out[4]["cluster"] == 0  # all-tie argmax → index 0


def test_semantic_dedup_tie_breaks_on_id(spark):
    """Equal micro-quantized centroid similarity: the LOWER id wins."""
    from dcafs_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0]]
    rows = [(7, [5.0, 0.1]), (9, [5.0, -0.1])]  # same dot with centroid
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, cents, threshold=0.99).collect()}
    assert out == {7: True, 9: False}


def test_semantic_dedup_clusters_isolate_pairs(spark):
    """Identical vectors in DIFFERENT clusters are never compared —
    the within-cluster join is the whole candidate set."""
    from dcafs_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    rows = [(1, [3.0, 1.0]), (2, [-3.0, -1.0])]  # antipodal → clusters 0/1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict() for r in semantic_dedup(emb, cents, threshold=0.99).collect()}
    assert out[1]["cluster"] != out[2]["cluster"]
    assert out[1]["kept"] and out[2]["kept"]


def test_semantic_dedup_chain_keeps_local_minima(spark):
    """A~B~C chain (A,C not mutual dups): dominance is pairwise, so
    every vector beaten by SOME near-dup neighbor drops — B loses to
    its fringe-ward neighbor even though A also loses to B's other
    side. Only the per-neighborhood minimum survives."""
    from dcafs_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0, 0.0]]
    # c_sim order: a > b > c; cos(a,b), cos(b,c) >= thr; cos(a,c) < thr
    rows = [
        (1, [10.2, 0.0, 0.0]),
        (2, [10.0, 0.8, 0.0]),
        (3, [9.8, 1.6, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, cents, threshold=0.995)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    import math as m

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (m.sqrt(sum(x * x for x in a)) * m.sqrt(sum(x * x for x in b)))

    assert cos(rows[0][1], rows[1][1]) >= 0.995 and cos(rows[1][1], rows[2][1]) >= 0.995
    assert cos(rows[0][1], rows[2][1]) < 0.995
    assert kept == {1: False, 2: False, 3: True}


def test_semantic_dedup_matches_python_reference(spark):
    """Differential oracle: seeded random corpus with planted near-dups
    vs a direct python implementation of assignment + dominance."""
    import math as m
    import random as _random

    from dcafs_spark.operators.similarity import hyperplanes, semantic_dedup

    rng = _random.Random(99)
    dim, n = 16, 80
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n)]
    rows = [(i, base[i]) for i in range(n)]
    # plant near-dups of the first 10 vectors
    rows += [
        (1000 + i, [x * 1.001 + 0.003 for x in base[i]]) for i in range(10)
    ]
    cents = hyperplanes(dim, 4, seed=5)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["c_sim_micro"], r["kept"])
        for r in semantic_dedup(emb, cents, threshold=0.995).collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    # python reference (centroids already unit-norm from hyperplanes)
    scores = {
        vid: [round(dot(v, c) * 1e6) for c in cents] for vid, v in rows
    }
    ref_cluster = {vid: s.index(max(s)) for vid, s in scores.items()}
    ref_csim = {vid: max(s) for vid, s in scores.items()}
    vecs = dict(rows)

    def cos(a, b):
        return round(dot(a, b) / (m.sqrt(dot(a, a)) * m.sqrt(dot(b, b))), 6)

    dropped = set()
    ids = sorted(vecs)
    for x in ids:
        for y in ids:
            if x == y or ref_cluster[x] != ref_cluster[y]:
                continue
            if cos(vecs[x], vecs[y]) < 0.995:
                continue
            if (ref_csim[y], 0) < (ref_csim[x], 0) or (
                ref_csim[y] == ref_csim[x] and y < x
            ):
                dropped.add(x)
    assert len(got) == len(rows)
    for vid in vecs:
        assert got[vid] == (ref_cluster[vid], ref_csim[vid], vid not in dropped), vid
    assert any(not k for _, _, k in got.values())  # planted dups found


def test_semantic_dedup_with_trained_centroids(spark):
    """Production path: kmeans_train_l2 centroids feed semantic_dedup.
    Two well-separated gaussian blobs + planted near-dups: training
    must put the blobs in different clusters, and each planted pair
    resolves to exactly one dropped member regardless of which cluster
    its blob landed in."""
    import random as _random

    from dcafs_spark.operators.similarity import kmeans_train_l2, semantic_dedup

    rng = _random.Random(7)
    dim = 8
    rows = []
    for i in range(30):  # blob A around +5 on dim0
        rows.append((i, [5.0 + rng.gauss(0, 0.3) if d == 0 else rng.gauss(0, 0.3) for d in range(dim)]))
    for i in range(30, 60):  # blob B around -5 on dim0
        rows.append((i, [-5.0 + rng.gauss(0, 0.3) if d == 0 else rng.gauss(0, 0.3) for d in range(dim)]))
    # planted near-dups: one per blob
    rows.append((1000, [x * 1.0005 + 0.0005 for x in rows[3][1]]))
    rows.append((1001, [x * 1.0005 + 0.0005 for x in rows[33][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = kmeans_train_l2(emb, k=2, dim=dim, iters=8)
    out = {r["vec_id"]: r.asDict() for r in semantic_dedup(emb, cents, threshold=0.999).collect()}

    assert out[0]["cluster"] != out[30]["cluster"]  # blobs separated
    for src, copy in ((3, 1000), (33, 1001)):
        assert out[src]["cluster"] == out[copy]["cluster"]
        assert out[src]["kept"] != out[copy]["kept"]  # exactly one survives
    # non-planted members of tight-but-not-duplicate blobs stay kept
    # unless they genuinely clear the 0.999 bar against a fringe-ward
    # neighbor; the planted pairs must be among the dropped
    dropped = {vid for vid, r in out.items() if not r["kept"]}
    assert dropped & {3, 1000} and dropped & {33, 1001}


def test_semantic_dedup_cluster_cap_skips_hot_cluster(spark):
    """Opt-in cluster_cap: an over-occupied cluster skips the pair
    search (members stay kept); small clusters still dedup."""
    from dcafs_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    hot = [(i, [5.0 + 0.001 * i, 0.2]) for i in range(4)]        # cluster 0, all near-dups
    cold = [(10, [-5.0, 0.2]), (11, [-5.0, 0.21])]               # cluster 1, one dup pair
    emb = spark.createDataFrame(hot + cold, "vec_id long, embedding array<double>")

    capped = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, cents, 0.995, cluster_cap=3).collect()}
    assert all(capped[i] for i in range(4))          # hot cluster: pair search skipped
    assert [capped[10], capped[11]].count(False) == 1  # cold cluster still dedups

    uncapped = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, cents, 0.995).collect()}
    assert sum(not k for i, k in uncapped.items() if i < 4) >= 3  # without cap the hot cluster collapses


def test_semantic_dedup_collapse_path_equivalence(spark):
    """Copy-flood guard: the collapsed path (bit-identical vectors
    roll up on a content hash before the pair join) must emit rows
    IDENTICAL to the per-vector path on a corpus mixing exact copies,
    near-dups, a cross-dominating fringe neighbor, singletons and a
    zero vector."""
    import random as _random

    from dcafs_spark.operators.similarity import hyperplanes, semantic_dedup

    rng = _random.Random(17)
    dim = 8
    cents = hyperplanes(dim, 3, seed=4)
    rows = []
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows += [(i, list(base)) for i in (5, 2, 9)]          # copy group, min id 2
    rows.append((7, [x * 1.001 + 0.002 for x in base]))   # near-dup of the group
    other = [rng.gauss(0, 1) for _ in range(dim)]
    rows += [(20, list(other)), (21, list(other))]        # second copy group
    rows.append((30, [rng.gauss(0, 1) for _ in range(dim)]))  # singleton
    rows.append((40, [0.0] * dim))                        # zero vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    direct = sorted(
        tuple(r) for r in semantic_dedup(emb, cents, 0.995, collapse=False).collect()
    )
    collapsed = sorted(
        tuple(r) for r in semantic_dedup(emb, cents, 0.995, collapse=True).collect()
    )
    auto = sorted(tuple(r) for r in semantic_dedup(emb, cents, 0.995).collect())
    assert direct == collapsed == auto
    kept = {r[0]: r[3] for r in direct}
    # copy group {2,5,9}: non-min members always drop; group fate vs 7
    # (its near-dup) follows the fringe rule, but never both survive
    assert kept[5] is False and kept[9] is False
    assert kept[2] != kept[7] or (kept[2], kept[7]) == (False, False)
    assert [kept[20], kept[21]].count(False) == 1  # isolated copy pair: one survives
    assert kept[30] is True and kept[40] is True


def test_semantic_dedup_null_placement_not_collapsed(spark):
    """Vectors differing only in NULL placement must NOT merge as
    bit-identical copies on the collapse path: the content hash is a
    null-preserving encoding (round-11 review — concat_ws silently
    skipped nulls, so [1,null,2] and [1,2,null] hashed identically and
    the collapsed path could drop one while the direct path, where
    cosine → null → filtered, kept both)."""
    from dcafs_spark.operators.similarity import hyperplanes, semantic_dedup

    cents = hyperplanes(3, 2, seed=4)
    rows = [
        (1, [1.0, None, 2.0]),
        (2, [1.0, 2.0, None]),
        (3, [1.0, 2.0, 2.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    direct = sorted(
        tuple(r) for r in semantic_dedup(emb, cents, 0.995, collapse=False).collect()
    )
    collapsed = sorted(
        tuple(r) for r in semantic_dedup(emb, cents, 0.995, collapse=True).collect()
    )
    assert direct == collapsed
    kept = {r[0]: r[3] for r in direct}
    # null-component vectors have undefined cosine: excluded from
    # pairing on BOTH paths, so everyone survives
    assert kept == {1: True, 2: True, 3: True}


def test_bounded_topk_equals_window_rank(spark):
    """Differential: the two-stage partial-agg top-k (`bounded_topk`,
    the recall evals' window-free rank shape) emits exactly the rows a
    row_number() window would, on random scored data with ties,
    uneven key sizes, and keys smaller than k — across a repartition
    (the local stage keys on spark_partition_id, so the RESULT must
    not depend on the physical layout)."""
    import random as _random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dcafs_spark.operators.similarity import bounded_topk

    rng = _random.Random(99)
    rows = []
    for q in range(7):
        for i in range(rng.randrange(1, 40)):
            rows.append((q, i, rng.randrange(0, 12)))  # small range → ties
    df = spark.createDataFrame(rows, "qid long, vid long, d long")

    w = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("vid").asc())
    want = sorted(
        (r["qid"], r["vid"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    )
    for parts in (1, 3, 17):
        s = F.struct(F.col("d").alias("_o"), F.col("vid").alias("_i"))
        got = sorted(
            (r["qid"], r["_e"]["_i"], r["_pos"] + 1)
            for r in bounded_topk(df.repartition(parts), "qid", s, 5).collect()
        )
        assert got == want, f"parts={parts}"


def test_train_pq_pads_short_corpora_by_cycling(spark):
    """Corpora with fewer than k vectors still yield k well-formed
    codewords per subspace: missing seeds CYCLE the available ones
    (seed 0, 1, 0, 1, ... for 2 real seeds) rather than repeating
    seed 0, and an empty corpus yields all-zero codewords."""
    from dcafs_spark.operators.similarity import train_pq

    rows = [(0, [1.0] * 8), (1, [2.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq(emb, m=2, k=4, dim=8, iters=0)
    for s in range(2):
        assert len(books[s]) == 4
        assert books[s][2] == books[s][0] and books[s][3] == books[s][1]  # cycled
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    books0 = train_pq(empty, m=2, k=3, dim=8, iters=1)
    assert all(c == [0.0] * 4 for bs in books0 for c in bs)


def test_sql_text_fast_paths_match_column_dsl(spark):
    """Round-14 optimization: `ivf_cells` / `ivf_assign` / `pq_code` /
    `pq_adc_rel_distance` accept a column-name STRING and build their
    whole expression as one SQL text (one py4j call) instead of
    hundreds of Column-DSL roundtrips — profiling showed 2.3-2.9 s of
    driver-side plan-build per ivfpq bench query. Both paths must stay
    BIT-IDENTICAL on every row (micro-quantized and raw), or the
    oracle gates would drift."""
    from dcafs_spark.operators.similarity import (
        ivf_assign,
        ivf_cells,
        pq_adc_rel_distance,
        pq_code,
        pq_codebooks_fixed,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    cents = sorted(
        ((r["vec_id"], list(r["v"])) for r in emb.filter("vec_id < 8").collect()),
        key=lambda t: t[0],
    )
    books = pq_codebooks_fixed(64, 8, 16, seed=7)
    df = emb.select(
        "vec_id",
        "v",
        ivf_cells(F.col("v"), cents, 2).alias("c_dsl"),
        ivf_cells("v", cents, 2).alias("c_sql"),
        ivf_assign(F.col("v"), cents).alias("a_dsl"),
        ivf_assign("v", cents).alias("a_sql"),
        pq_code(F.col("v"), books, quantize_micro=True).alias("pm_dsl"),
        pq_code("v", books, quantize_micro=True).alias("pm_sql"),
        pq_code(F.col("v"), books, quantize_micro=False).alias("pr_dsl"),
        pq_code("v", books, quantize_micro=False).alias("pr_sql"),
    )
    assert (
        df.filter(
            "c_dsl != c_sql OR a_dsl != a_sql OR pm_dsl != pm_sql OR pr_dsl != pr_sql"
        ).count()
        == 0
    )
    staged = emb.select("vec_id", "v", pq_code("v", books, quantize_micro=True).alias("codes"))
    adc = staged.select(
        pq_adc_rel_distance(F.col("codes"), F.col("v"), books).alias("d_dsl"),
        pq_adc_rel_distance("codes", "v", books).alias("d_sql"),
    )
    assert adc.filter("d_dsl != d_sql").count() == 0
