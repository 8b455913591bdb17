"""Semantic unit tests for the round-5 curation operators: chunk-level
cross-doc dedup (C4-style), PII scrubbing, corpus n-gram census,
capped per-stratum sampling, Gopher quality rules.

The sf-data differential tests live in test_queries_oracle; these pin
the operator SEMANTICS on handcrafted rows where the right answer is
computable by eye.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDedup:
    def test_first_owner_keeps_dropped_counts(self, spark):
        from dcafs_spark.operators.dedup import chunk_dedup_stats

        ten = "a b c d e f g h i j"
        other = "k l m n o p q r s t"
        rows = [
            (1, ten + " " + other),  # owns both chunks
            (2, ten),  # chunk owned by doc 1 → dropped
            (3, other + " unique tail words here now one two three four five"),
        ]
        out = {
            r["doc_id"]: r
            for r in chunk_dedup_stats(_docs(spark, rows), chunk_words=10).collect()
        }
        assert out[1]["n_chunks"] == 2 and out[1]["n_dropped"] == 0
        assert out[1]["kept_words"] == 20
        assert out[2]["n_chunks"] == 1 and out[2]["n_dropped"] == 1
        assert out[2]["kept_words"] == 0
        # doc 3: first chunk duplicates doc 1's second chunk; tail is unique
        assert out[3]["n_chunks"] == 2 and out[3]["n_dropped"] == 1
        assert out[3]["kept_words"] == 10

    def test_partial_tail_chunk_counts_words(self, spark):
        from dcafs_spark.operators.dedup import chunk_dedup_stats

        rows = [(7, "one two three")]  # 3 words → single 3-word chunk
        (r,) = chunk_dedup_stats(_docs(spark, rows), chunk_words=10).collect()
        assert r["n_chunks"] == 1 and r["kept_words"] == 3

    def test_internal_duplicate_chunks_stay_with_owner(self, spark):
        from dcafs_spark.operators.dedup import chunk_dedup_stats

        ten = "a b c d e f g h i j"
        (r,) = chunk_dedup_stats(
            _docs(spark, [(5, ten + " " + ten)]), chunk_words=10
        ).collect()
        # both occurrences live in the owner doc: nothing dropped
        assert r["n_chunks"] == 2 and r["n_dropped"] == 0 and r["kept_words"] == 20


class TestPiiScrub:
    def test_redacts_and_counts(self, spark):
        from dcafs_spark.operators.textan import pii_scrub

        rows = [
            (1, "reach me at jo.doe+spam@mail.example.org or +32 475 123 456"),
            (2, "server at 192.168.0.12 and 10.0.0.1, no mail"),
            (3, "clean text without identifiers"),
        ]
        out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
        assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
        assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
        assert "jo.doe" not in out[1]["redacted"]
        assert out[2]["n_ipv4"] == 2 and out[2]["redacted"].count("<IPV4>") == 2
        assert out[3]["redacted"] == rows[2][1]
        assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0


class TestNgramTopk:
    def test_counts_and_tiebreak(self, spark):
        from dcafs_spark.operators.textan import ngram_topk

        rows = [(1, "x y x y z"), (2, "x y q")]
        out = ngram_topk(_docs(spark, rows), n=2, k=2).collect()
        # "x y": 3 occurrences across 2 docs; then alphabetical among count-1 grams
        assert out[0]["gram"] == "x y"
        assert out[0]["occurrences"] == 3 and out[0]["doc_freq"] == 2
        assert out[1]["occurrences"] == 1


class TestCappedSample:
    def test_cap_and_determinism(self, spark):
        from dcafs_spark.operators.sampling import capped_stratified_sample

        rows = [(i, "en" if i % 3 else "fr") for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = capped_stratified_sample(df, "lang", 10, "doc_id", seed=3)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"en": 10, "fr": 10}
        # deterministic: same rows under a different shuffle layout
        ids = sorted(r["doc_id"] for r in out.collect())
        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            ids2 = sorted(
                r["doc_id"]
                for r in capped_stratified_sample(df, "lang", 10, "doc_id", seed=3).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)
        assert ids == ids2

    def test_small_stratum_kept_whole(self, spark):
        from dcafs_spark.operators.sampling import capped_stratified_sample

        df = spark.createDataFrame([(1, "rare"), (2, "rare")], "doc_id long, lang string")
        assert capped_stratified_sample(df, "lang", 10, "doc_id").count() == 2

    def test_dominant_stratum_prefilter(self, spark):
        """A dominant stratum triggers the automatic scan-side hash
        prefilter: the plan carries a bucket < CASE(stratum) Filter
        BEFORE the rank window, small strata are untouched, and the
        selected rows are identical to the unfiltered spec (the
        prefilter keeps a prefix of the rank order)."""
        from dcafs_spark.operators.sampling import capped_stratified_sample

        # 3 NULL sampling keys in the dominant stratum: NULL buckets
        # rank FIRST in the window's NULLS FIRST order, so the
        # prefilter must retain them or the selection diverges
        rows = (
            [(i, "en") for i in range(3000)]
            + [(10_000 + i, "fr") for i in range(20)]
            + [(None, "en")] * 3
        )
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = capped_stratified_sample(df, "lang", 5, "doc_id", seed=7)
        spec = capped_stratified_sample(df, "lang", 5, "doc_id", seed=7, prefilter_margin=0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        spec_plan = spec._jdf.queryExecution().executedPlan().toString()
        # threshold for en: target=4*5+32=52 expected survivors of 3003
        thr = int(52 * 1_000_000 / 3003) + 1
        assert f"THEN {thr} ELSE 1000000 END" in plan  # attr ids vary: lang#N
        assert "CASE WHEN" not in spec_plan  # margin=0 disables
        def norm(df):  # None-safe sort key for rows with NULL doc_id
            return sorted(((r[0] is None, r[0] or 0, r[1]) for r in df.collect()))

        assert norm(out) == norm(spec)
        counts = {
            r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"en": 5, "fr": 5}


class TestGopherFilter:
    def test_rules_fire_independently(self, spark):
        from dcafs_spark.operators.textan import gopher_filter

        long_good = " ".join(
            ["the quick brown fox jumps over a lazy dog near the old stone wall for fun with vigor"] * 4
        )
        rows = [
            (1, long_good),  # passes words/stop; repetition high (4x same sentence)
            (2, "short text"),  # fails word count
            (3, " ".join(f"alpha{i} the beta{i} of gamma{i}" for i in range(20))),  # 100 words, varied bigrams
        ]
        out = {r["doc_id"]: r for r in gopher_filter(_docs(spark, rows)).collect()}
        assert out[2]["ok_word_count"] == 0 and out[2]["keep"] == 0
        assert out[1]["ok_word_count"] == 1 and out[1]["ok_stopwords"] == 1
        assert out[1]["ok_repetition"] == 0  # 4x-repeated sentence
        assert out[3]["ok_word_count"] == 1 and out[3]["ok_repetition"] == 1

    def test_flags_are_ints(self, spark):
        from dcafs_spark.operators.textan import gopher_filter

        df = gopher_filter(_docs(spark, [(1, "hello world")]))
        types = dict(df.dtypes)
        for c in ("ok_word_count", "ok_mean_word_len", "ok_stopwords", "ok_repetition", "keep"):
            assert types[c] == "bigint"


class TestSequencePacking:
    def test_contiguous_fill_and_straddle(self, spark):
        from dcafs_spark.operators.packing import sequence_packing

        df = spark.createDataFrame(
            [(i, 100) for i in range(10)], "doc_id long, n_tokens long"
        )
        out = sequence_packing(df, "n_tokens", "doc_id", budget=250, shards=1).collect()
        rows = sorted(out, key=lambda r: r["cum_tokens"])
        # 10 docs x 100 tokens, budget 250: cum 100..1000
        assert [r["cum_tokens"] for r in rows] == [100 * i for i in range(1, 11)]
        # doc with cum 300 occupies tokens 201-300: starts pack 0, ends pack 1
        straddler = next(r for r in rows if r["cum_tokens"] == 300)
        assert straddler["pack_first"] == 0 and straddler["pack_last"] == 1
        # doc with cum 200 fits pack 0 exactly
        exact = next(r for r in rows if r["cum_tokens"] == 200)
        assert exact["pack_first"] == 0 and exact["pack_last"] == 0

    def test_sharding_bounds_window_size(self, spark):
        from pyspark.sql import functions as F

        from dcafs_spark.operators.packing import sequence_packing

        df = spark.createDataFrame([(i, 10) for i in range(200)], "doc_id long, n_tokens long")
        out = sequence_packing(df, "n_tokens", "doc_id", budget=64, shards=8)
        shard_counts = out.groupBy("shard").agg(F.count("*").alias("n")).collect()
        assert len(shard_counts) == 8  # all shards used → parallel packing
        # per-shard cum_tokens is internally consistent
        per = out.groupBy("shard").agg(
            F.max("cum_tokens").alias("mx"), (F.sum("n_tokens")).alias("sm")
        ).collect()
        for r in per:
            assert r["mx"] == r["sm"]


class TestCurationInvariants:
    """Randomized invariants over the round-5 operators (seeded RNG,
    deterministic corpora — the hypothesis-style harness the suite
    uses elsewhere without spinning one Spark job per example)."""

    def _rand_docs(self, spark, seed, n=40, vocab=12):
        import random

        rnd = random.Random(seed)
        words = [f"w{i}" for i in range(vocab)]
        rows = [
            (i, " ".join(rnd.choice(words) for _ in range(rnd.randint(1, 60))))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string"), rows

    def test_chunk_dedup_conservation(self, spark):
        """kept_words + dropped chunk words == total words, per corpus."""
        from dcafs_spark.operators.dedup import chunk_dedup_stats

        df, rows = self._rand_docs(spark, seed=11)
        out = chunk_dedup_stats(df, chunk_words=5)
        total_words = sum(len(t.split()) for _, t in rows)
        agg = out.agg(
            F.sum("kept_words").alias("kept"),
            F.sum("n_chunks").alias("chunks"),
            F.sum("n_dropped").alias("dropped"),
        ).collect()[0]
        # every doc appears; dropped <= chunks; kept <= total
        assert out.count() == len(rows)
        assert agg["dropped"] <= agg["chunks"]
        assert 0 < agg["kept"] <= total_words

    def test_pii_scrub_idempotent(self, spark):
        """Scrubbing already-redacted text finds nothing."""
        from dcafs_spark.operators.textan import pii_scrub

        rows = [
            (1, "a@b.co and 1.2.3.4 and +32 475 123 456"),
            (2, "double a@b.co x@y.org"),
        ]
        first = (
            pii_scrub(spark.createDataFrame(rows, "doc_id long, text string"))
            .select("doc_id", F.col("redacted").alias("text"))
        )
        second = pii_scrub(first)
        for r in second.collect():
            assert r["n_email"] == 0 and r["n_ipv4"] == 0 and r["n_phone"] == 0
            assert r["redacted"] == r["text"]

    def test_packing_budget_invariants(self, spark):
        """pack ids are non-decreasing with cum_tokens inside a shard and
        pack_first <= pack_last; every pack boundary respects budget."""
        from dcafs_spark.operators.packing import sequence_packing

        import random

        rnd = random.Random(3)
        rows = [(i, rnd.randint(1, 500)) for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        budget = 700
        out = sequence_packing(df, "n_tokens", "doc_id", budget=budget, shards=4).collect()
        assert all(r["pack_first"] <= r["pack_last"] for r in out)
        for r in out:
            # first token of the doc lives in pack_first
            assert (r["cum_tokens"] - r["n_tokens"]) // budget == r["pack_first"]
            # last token lives in pack_last
            assert max((r["cum_tokens"] - 1) // budget, r["pack_first"]) == r["pack_last"]
        by_shard = {}
        for r in sorted(out, key=lambda r: (r["shard"], r["cum_tokens"])):
            prev = by_shard.get(r["shard"])
            if prev is not None:
                assert r["pack_first"] >= prev["pack_first"]
                assert r["cum_tokens"] == prev["cum_tokens"] + r["n_tokens"]
            by_shard[r["shard"]] = r

    def test_packing_nested_field_and_bad_budget(self, spark):
        """tokens_col may be a struct field path (dots stay field-access
        separators when quoting for SQL interpolation), and a non-int
        or non-positive budget is rejected instead of silently changing
        the integer DIV semantics."""
        import pytest

        from dcafs_spark.operators.packing import sequence_packing

        df = spark.createDataFrame(
            [(i, (i % 7 + 1,)) for i in range(40)],
            "doc_id long, meta struct<tok_count: long>",
        )
        out = sequence_packing(df, "meta.tok_count", "doc_id", budget=16, shards=2).collect()
        assert all(r["pack_first"] <= r["pack_last"] for r in out)
        assert len(out) == 40
        for bad in (16.0, "16", 0, -3, True):
            with pytest.raises(ValueError):
                sequence_packing(df, "meta.tok_count", "doc_id", budget=bad, shards=2)

    def test_ngram_topk_subset_of_full_census(self, spark):
        """top-k counts agree with a full explode-groupBy recount."""
        from dcafs_spark.operators.textan import ngram_topk, ngrams

        df, _rows = self._rand_docs(spark, seed=7, n=25, vocab=6)
        top = ngram_topk(df, n=2, k=5).collect()
        full = {
            r["gram"]: r["cnt"]
            for r in df.select(F.explode(ngrams(F.col("text"), 2)).alias("gram"))
            .groupBy("gram")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        top_counts = [r["occurrences"] for r in top]
        assert top_counts == sorted(top_counts, reverse=True)
        for r in top:
            assert full[r["gram"]] == r["occurrences"]
        # nothing outside the top-k beats the last in-list count
        kth = top_counts[-1]
        in_top = {r["gram"] for r in top}
        assert all(c <= kth for g, c in full.items() if g not in in_top)


class TestInvertedIndex:
    def test_postings_capped_and_sorted(self, spark):
        from dcafs_spark.operators.textan import inverted_index

        rows = [(i, "common uniq%d" % i) for i in range(30)]
        out = {
            r["term"]: r
            for r in inverted_index(
                _docs(spark, rows), max_postings=5
            ).collect()
        }
        c = out["common"]
        assert c["doc_freq"] == 30  # full df survives the cap
        assert c["postings"] == "0,1,2,3,4"  # 5 lowest ids, numeric order
        assert out["uniq7"]["doc_freq"] == 1 and out["uniq7"]["postings"] == "7"

    def test_repeated_term_in_doc_counts_once(self, spark):
        from dcafs_spark.operators.textan import inverted_index

        out = inverted_index(_docs(spark, [(3, "echo echo echo")])).collect()
        (r,) = out
        assert r["term"] == "echo" and r["doc_freq"] == 1 and r["postings"] == "3"


class TestChunkDedupApply:
    def test_rebuild_drops_foreign_chunks(self, spark):
        from dcafs_spark.operators.dedup import chunk_dedup_apply

        ten = "a b c d e f g h i j"
        other = "k l m n o p q r s t"
        rows = [
            (1, ten),
            (2, ten + " " + other),  # first chunk owned by doc 1
        ]
        out = {r["doc_id"]: r for r in chunk_dedup_apply(_docs(spark, rows), chunk_words=10).collect()}
        import hashlib

        assert out[1]["n_kept"] == 1
        assert out[1]["clean_hash"] == hashlib.md5(ten.encode()).hexdigest()
        assert out[2]["n_kept"] == 1
        assert out[2]["clean_hash"] == hashlib.md5(other.encode()).hexdigest()

    def test_fully_deduped_doc_disappears(self, spark):
        from dcafs_spark.operators.dedup import chunk_dedup_apply

        ten = "a b c d e f g h i j"
        rows = [(1, ten), (2, ten)]
        out = chunk_dedup_apply(_docs(spark, rows), chunk_words=10).collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_apply_consistent_with_stats(self, spark):
        """Docs kept by apply carry exactly the chunk counts stats says
        they own (n_kept == n_chunks - n_dropped)."""
        import random

        from dcafs_spark.operators.dedup import chunk_dedup_apply, chunk_dedup_stats

        rnd = random.Random(5)
        words = [f"w{i}" for i in range(8)]
        rows = [
            (i, " ".join(rnd.choice(words) for _ in range(rnd.randint(5, 40))))
            for i in range(30)
        ]
        df = _docs(spark, rows)
        stats = {r["doc_id"]: r for r in chunk_dedup_stats(df, chunk_words=5).collect()}
        applied = {r["doc_id"]: r for r in chunk_dedup_apply(df, chunk_words=5).collect()}
        for did, s in stats.items():
            owned = s["n_chunks"] - s["n_dropped"]
            if owned == 0:
                assert did not in applied
            else:
                assert applied[did]["n_kept"] == owned


class TestCodeDetect:
    def test_code_doc_flags(self, spark):
        from dcafs_spark.operators.textan import code_features

        code = (
            "def main():\n    import os\n    return os.getcwd();\n"
            "class Foo:\n    def bar(self):\n    return {1: 2};\n"
        )
        prose = "The quick brown fox jumps over the lazy dog near the river bank."
        df = spark.createDataFrame([(1, code), (2, prose)], "doc_id int, text string")
        rows = {r["doc_id"]: r.asDict() for r in code_features(df).collect()}
        assert rows[1]["is_code"] == 1
        assert rows[1]["n_kw"] >= 4 and rows[1]["n_indent"] >= 4
        assert rows[2]["is_code"] == 0
        assert rows[2]["n_punct_code"] == 0

    def test_counts_are_exact(self, spark):
        from dcafs_spark.operators.textan import code_features

        df = spark.createDataFrame([(1, "a=b; {c}\n    x")], "doc_id int, text string")
        r = code_features(df).first()
        assert r["n_punct_code"] == 4  # '=' ';' '{' '}'
        assert r["n_indent"] == 1


class TestOovRate:
    def test_oov_ppm_bounds_and_consistency(self, spark, sf_dir):
        from dcafs_spark.queries import q_oov_rate

        out = q_oov_rate(spark, sf_dir).collect()
        assert len(out) > 0
        for r in out:
            assert 0 <= r["n_oov"] <= r["n_tokens"]
            assert 0 <= r["oov_ppm"] <= 1_000_000
            assert r["oov_ppm"] == r["n_oov"] * 1_000_000 // r["n_tokens"]


class TestCleanText:
    def test_cleanup_semantics(self, spark):
        from dcafs_spark.operators.textan import clean_text
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                (1, '<div class="a">Hello &amp; <b>world</b>&nbsp;&#39;quoted&#39;</div>'),
                (2, "no markup   at\tall\x07"),
                (3, "<not closed"),
            ],
            "id int, text string",
        )
        got = {r["id"]: r["c"] for r in df.select("id", clean_text(F.col("text")).alias("c")).collect()}
        assert got[1] == "Hello & world 'quoted'"
        assert got[2] == "no markup at all"
        assert got[3] == "<not closed"  # unterminated tag is kept, not eaten


class TestBm25AndBoilerplate:
    def test_bm25_matches_python_reference(self, spark):
        """Quantized BM25 equals an independent python implementation
        (same Lucene positive-idf form, same micro-unit rounding)."""
        import math

        from dcafs_spark.operators.textan import bm25_score

        corpus = [
            (0, "spark join window spark spark"),
            (1, "join join hash scan filter"),
            (2, "window"),
            (3, "hash scan row batch merge sort"),
            (4, ""),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        terms = ["spark", "join", "window"]
        got = {r["doc_id"]: (r["n_tokens"], r["bm25_micro"]) for r in bm25_score(df, terms).collect()}

        toks = {i: [w for w in t.lower().strip().split() if w] for i, t in corpus}
        n = len(corpus)
        tot = sum(len(v) for v in toks.values())
        k1, b = 1.2, 0.75
        want = {}
        for i, tk in toks.items():
            score = 0
            hit = False
            for t in terms:
                tf = tk.count(t)
                dfq = sum(1 for v in toks.values() if t in v)
                idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
                denom = tf + k1 * (1.0 - b + b * (len(tk) * n / tot))
                score += int(round(idf * tf * (k1 + 1.0) / denom * 1e6))
                hit = hit or tf > 0
            if hit:
                want[i] = (len(tk), score)
        assert got == want
        assert 4 not in got and 3 not in got  # no query term -> no row

    def test_source_boilerplate_per_source_threshold(self, spark):
        """A 10-word banner shared by >= min_docs docs of ONE source is
        flagged in EVERY doc of that source; the same banner below the
        threshold in another source is NOT flagged (per-source rule);
        content chunks survive."""
        from dcafs_spark.operators.dedup import source_boilerplate_stats

        banner = "cookie banner accept terms privacy policy subscribe newsletter footer now"
        assert len(banner.split()) == 10
        mk = lambda i: f"unique content words number{i} alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}"  # noqa: E731
        rows = (
            [(i, "a", banner + " " + mk(i)) for i in range(3)]  # >= min_docs
            + [(10 + i, "b", banner + " " + mk(10 + i)) for i in range(2)]  # below
            + [(20, "a", mk(20))]  # source-a doc without the banner
        )
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {r["doc_id"]: r for r in source_boilerplate_stats(df, min_docs=3).collect()}
        for i in range(3):  # banner flagged, content kept
            assert got[i]["n_boiler"] == 1 and got[i]["n_chunks"] == 2
            assert got[i]["kept_words"] == 10
        for i in (10, 11):  # same banner, source below threshold
            assert got[i]["n_boiler"] == 0
        assert got[20]["n_boiler"] == 0 and got[20]["kept_words"] == 10


class TestContaminationAndContainment:
    def test_contamination_fraction_exact_ppm(self, spark):
        """Fractions equal an independent python computation on distinct
        3-gram sets; clean docs appear with 0 (report, not filter)."""
        from dcafs_spark.operators.dedup import contamination_fraction

        corpus = [
            (0, "alpha beta gamma delta epsilon"),      # shares a prefix with probe
            (1, "zeta eta theta iota kappa"),           # clean
            (2, "alpha beta gamma delta epsilon"),      # exact probe copy
        ]
        probe = [(9, "alpha beta gamma delta epsilon")]
        c = spark.createDataFrame(corpus, "doc_id long, text string")
        p = spark.createDataFrame(probe, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contam_ppm"])
            for r in contamination_fraction(c, p.select("text"), shingle_n=3).collect()
        }

        def sh3(t):
            w = t.split()
            k = max(len(w) - 2, 1)
            return {" ".join(w[i : i + 3]) for i in range(k)}

        pset = sh3(probe[0][1])
        want = {}
        for i, t in corpus:
            s = sh3(t)
            hits = len(s & pset)
            want[i] = (len(s), hits, hits * 1_000_000 // len(s))
        assert got == want
        assert got[1] == (3, 0, 0)          # clean doc present with 0
        assert got[2] == (3, 3, 1_000_000)  # exact copy reads 100%

    def test_containment_catches_pairs_jaccard_misses(self, spark):
        """A short doc fully quoted inside a long page: overlap = 1.0
        even though Jaccard is far below any banding threshold; an
        unrelated doc pairs with nothing."""
        from dcafs_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

        quote = "the quick brown fox jumps over the lazy dog tonight"
        filler = " ".join(f"word{i} token{i} item{i}" for i in range(40))
        rows = [
            (1, quote),
            (2, filler[: len(filler) // 2] + " " + quote + " " + filler[len(filler) // 2 :]),
            (3, "completely unrelated content about ships and oceans sailing"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["overlap"] for r in containment_pairs(df, threshold=0.9).collect()}
        assert got == {(1, 2): 1.0}
        jac = ngram_jaccard_pairs(df, threshold=0.3, collapse=False).collect()
        assert all(not (r["id_a"] == 1 and r["id_b"] == 2) for r in jac)  # banding blind to it

    def test_containment_small_docs_full_recall(self, spark):
        """Docs with <= sketch_k shingles are sketched whole — an exact
        sub-threshold overlap is computed, not missed, and filtered by
        value; identical docs read 1.0."""
        from dcafs_spark.operators.dedup import containment_pairs

        rows = [
            (1, "a b c d e f"),
            (2, "a b c d e f"),       # identical -> 1.0
            (3, "a b c d x y"),       # shares 2 of 4 shingles -> 0.5
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["overlap"] for r in containment_pairs(df, threshold=0.9).collect()}
        assert got == {(1, 2): 1.0}
        lo = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in containment_pairs(df, threshold=0.4).collect()
        }
        assert lo[(1, 3)] == 0.5 and lo[(2, 3)] == 0.5

    def test_containment_sketch_cap_drops_hot_key_only(self, spark):
        """A sketch hash shared by every doc (boilerplate) is skipped
        under the cap; pairs that also share an uncapped slot still
        surface, pairs whose ONLY shared slot was the hot key are
        explicitly lost."""
        from dcafs_spark.operators.dedup import containment_pairs

        boiler = "common shared boilerplate words everyone has"
        rows = [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " alpha beta gamma delta"),   # true dup of 1
            (3, boiler + " wholly different tail here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        uncapped = {
            (r["id_a"], r["id_b"])
            for r in containment_pairs(df, threshold=0.5).collect()
        }
        assert (1, 2) in uncapped and (1, 3) in uncapped  # boiler links all
        # cap semantics are on DISTINCT-content occupancy (docs 1+2 are
        # exact copies -> one representative): cap=1 drops the boiler
        # keys (2 representatives share them) while the copy-group pair
        # (1,2) still surfaces through re-expansion at exactly 1.0
        capped = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in containment_pairs(df, threshold=0.5, sketch_cap=1).collect()
        }
        assert (1, 2) in capped and capped[(1, 2)] == 1.0
        assert (1, 3) not in capped and (2, 3) not in capped

    def test_containment_collapse_path_equivalence(self, spark):
        """Both collapse paths emit identical rows on a copy-heavy
        corpus (within-group pairs at exactly 1.0, cross-group pairs
        inheriting representative scores)."""
        from dcafs_spark.operators.dedup import containment_pairs

        quote = "the quick brown fox jumps over the lazy dog tonight again"
        rows = (
            [(i, quote) for i in range(5)]                       # copy group
            + [(10, quote + " plus a much longer tail " + " ".join(f"w{j}" for j in range(30)))]
            + [(20, "entirely different material about oceans and ships sailing far")]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        direct = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in containment_pairs(df, threshold=0.8, collapse=False).collect()
        }
        collapsed = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in containment_pairs(df, threshold=0.8, collapse=True).collect()
        }
        assert direct == collapsed
        assert direct[(0, 1)] == 1.0            # within-copy-group
        assert direct[(0, 10)] == 1.0           # quote contained in long doc
        assert all(20 not in pair for pair in direct)


class TestUrlCanonicalization:
    """Round-12 URL tier: canonicalization rules + first-seen dedup."""

    CASES = [
        # (raw, canonical)
        ("HTTPS://WWW.Site.COM:443/a/b/?utm_source=x#frag", "https://site.com/a/b"),
        ("https://site.com/a/b", "https://site.com/a/b"),
        ("http://www.site.com:80/a", "http://site.com/a"),
        ("http://site.com:443/a", "http://site.com:443/a"),  # not http's default
        ("https://site.com:80/a", "https://site.com:80/a"),  # not https' default
        ("https://site.com/a?utm_medium=email", "https://site.com/a"),
        ("https://site.com/a?b=2&utm_source=f&a=1", "https://site.com/a?b=2&a=1"),
        ("https://site.com/", "https://site.com"),
        ("https://site.com/a///", "https://site.com/a"),
        ("https://wwwx.site.com/a", "https://wwwx.site.com/a"),  # only 'www.' strips
    ]

    def test_canonical_rules(self, spark):
        from dcafs_spark.operators.urls import url_parts

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _c) in enumerate(self.CASES)], "i long, url string"
        )
        got = {
            r["i"]: r["p"]["canon"]
            for r in df.select("i", url_parts(F.col("url")).alias("p")).collect()
        }
        for i, (_raw, want) in enumerate(self.CASES):
            assert got[i] == want, self.CASES[i]

    def test_param_order_preserved_not_sorted(self, spark):
        from dcafs_spark.operators.urls import url_parts

        df = spark.createDataFrame(
            [(1, "https://s.com/p?b=2&a=1"), (2, "https://s.com/p?a=1&b=2")],
            "i long, url string",
        )
        got = {r["i"]: r["p"]["canon"] for r in df.select("i", url_parts(F.col("url")).alias("p")).collect()}
        assert got[1] != got[2]  # conservatively distinct

    def test_url_dedup_first_seen_wins(self, spark):
        from dcafs_spark.operators.urls import url_dedup

        df = spark.createDataFrame(
            [
                (5, "HTTPS://WWW.A.com/x/?utm_source=t"),
                (2, "https://a.com/x"),
                (9, "https://a.com/x#top"),
                (7, "https://b.com/y"),
            ],
            "doc_id long, url string",
        )
        rows = {r["doc_id"]: r for r in url_dedup(df, "url", "doc_id").collect()}
        assert rows[2]["kept"] and not rows[5]["kept"] and not rows[9]["kept"]
        assert rows[2]["n_dupes"] == 3 and rows[7]["n_dupes"] == 1 and rows[7]["kept"]
        assert rows[5]["domain"] == "a.com"


class TestRegisteredDomain:
    """Round-13 URL tier: eTLD+1 extraction + per-domain profile."""

    def test_etld1_rules(self, spark):
        from dcafs_spark.operators.urls import registered_domain

        cases = [
            ("blog.brand3.co.uk", "brand3.co.uk"),   # 2-label suffix wins
            ("brand3.co.uk", "brand3.co.uk"),
            ("cdn.a.b.brand1.com", "brand1.com"),    # deep subdomain chain
            ("brand9.com.au", "brand9.com.au"),
            ("shop.brand2.net", "brand2.net"),
            ("com", "com"),                          # bare suffix falls through
            ("localhost", "localhost"),              # no suffix match
        ]
        df = spark.createDataFrame(
            [(i, h) for i, (h, _w) in enumerate(cases)], "i long, host string"
        )
        got = {
            r["i"]: r["d"]
            for r in df.select(
                "i", registered_domain(F.col("host")).alias("d")
            ).collect()
        }
        for i, (_h, want) in enumerate(cases):
            assert got[i] == want, cases[i]

    def test_domain_profile_counts(self, spark):
        from dcafs_spark.operators.urls import domain_profile

        df = spark.createDataFrame(
            [
                (1, "https://www.a.co.uk/x"),
                (2, "https://blog.a.co.uk/x"),   # same eTLD+1, distinct page
                (3, "HTTPS://a.co.uk/x"),        # canonical dup of 3? no — of 1
                (4, "https://b.com/y?utm_source=t"),
                (5, "https://b.com/y"),          # canonical dup of 4
            ],
            "doc_id long, url string",
        )
        got = {r["domain"]: r for r in domain_profile(df, "url", "doc_id").collect()}
        a, b = got["a.co.uk"], got["b.com"]
        # doc 1 (www-stripped) and doc 3 share canon https://a.co.uk/x;
        # doc 2 keeps its blog. host → distinct canonical page
        assert a["n_docs"] == 3 and a["n_pages"] == 2
        assert b["n_docs"] == 2 and b["n_pages"] == 1
        assert b["dup_share"] == 0.5

    def test_encoding_qc(self, spark):
        from dcafs_spark.operators.textan import encoding_qc

        rows = [
            (1, "clean ascii text"),
            (2, "bro�ken transcode"),
            (3, "binary\x01sniff\x02ed"),
            (4, "tabs\tand\nnewlines are fine"),
            (5, ""),                              # empty → ratio 1.0, kept
            (6, "café naïve résumé"),  # non-ASCII ratio
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in encoding_qc(df, min_ascii_ratio=0.9).collect()}
        assert got[1]["kept"] and got[1]["ascii_ratio"] == 1.0
        assert got[2]["n_replacement"] == 1 and not got[2]["kept"]
        assert got[3]["n_control"] == 2 and not got[3]["kept"]
        assert got[4]["kept"] and got[4]["n_control"] == 0
        assert got[5]["kept"] and got[5]["ascii_ratio"] == 1.0
        assert not got[6]["kept"] and got[6]["ascii_ratio"] < 0.9
        # multilingual setting: ratio reports, counts gate
        ml = {r["doc_id"]: r for r in encoding_qc(df, min_ascii_ratio=0.0).collect()}
        assert ml[6]["kept"] and not ml[2]["kept"]

    def test_term_blocklist_stats(self, spark):
        from dcafs_spark.operators.textan import term_blocklist_stats

        rows = [
            (1, "a SLOW merge batch here"),     # slow + phrase = 2 hits, 2 terms
            (2, "slowly flashes"),              # word boundary: no hits
            (3, "slow slow slow slow"),         # 4 hits of 1 term
            (4, None),                          # null text → 0 hits, kept
            (5, "merge batch merge"),           # phrase wins once; bare merge not listed
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in term_blocklist_stats(
                df, ["slow", "merge batch"], max_hits=3
            ).collect()
        }
        assert (got[1]["n_hits"], got[1]["n_distinct_terms"], got[1]["kept"]) == (2, 2, True)
        assert (got[2]["n_hits"], got[2]["kept"]) == (0, True)
        assert (got[3]["n_hits"], got[3]["n_distinct_terms"], got[3]["kept"]) == (4, 1, False)
        assert (got[4]["n_hits"], got[4]["kept"]) == (0, True)
        assert (got[5]["n_hits"], got[5]["n_distinct_terms"]) == (1, 1)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            term_blocklist_stats(df, [])

    def test_url_filter_verdicts(self, spark):
        from dcafs_spark.operators.urls import url_filter

        df = spark.createDataFrame(
            [
                (1, "https://ok.com/a"),
                (2, "https://cdn.spam.com/x"),      # subdomain of blocked eTLD+1
                (3, "https://spam.com/y"),          # blocked apex
                (4, "https://ok.com/login"),        # junk path
                (5, "HTTPS://WWW.OK.com/login/"),   # junk path via canonicalization
                (6, "https://ok.com/loginzz"),      # anchored rule must NOT match
            ],
            "doc_id long, url string",
        )
        out = {
            r["doc_id"]: r
            for r in url_filter(
                df, "url", blocked_domains=["spam.com"],
                blocked_path_rules=[r"^/login$"],
            ).collect()
        }
        assert out[1]["kept"] and out[6]["kept"]
        assert not out[2]["kept"] and not out[3]["kept"]
        assert not out[4]["kept"] and not out[5]["kept"]
        assert out[2]["domain"] == "spam.com"  # eTLD+1, not the cdn host
        # no rules → everything kept, verdict column still present
        allkept = url_filter(df, "url").collect()
        assert all(r["kept"] for r in allkept) and len(allkept) == 6

    def test_domain_capped_sample_quota(self, spark):
        from dcafs_spark.operators.urls import domain_capped_sample

        rows = [
            (i, f"https://sub{i % 3}.big.com/p/{i}") for i in range(10)
        ] + [(100, "https://small.org/x")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = domain_capped_sample(df, "url", "doc_id", k=4).collect()
        by_dom: dict = {}
        for r in out:
            by_dom.setdefault(r["domain"], []).append((r["rank"], r["doc_id"]))
        # big.com capped at its 4 lowest ids, ranks 0..3; small.org whole
        assert sorted(by_dom["big.com"]) == [(0, 0), (1, 1), (2, 2), (3, 3)]
        assert by_dom["small.org"] == [(0, 100)]


class TestRegisteredDomainPSL:
    """Round-14 (r13 verdict ask #2): PSL-scale eTLD+1 via the
    broadcast-join path, identity-pinned against the CASE chain."""

    HOSTS = [
        "blog.brand3.co.uk", "brand3.co.uk", "cdn.a.b.brand1.com",
        "brand9.com.au", "shop.brand2.net", "com", "co.uk",
        "localhost", "deep.x.y.z.brand0.org", "m.brand4.com",
    ]

    def _hosts_df(self, spark, hosts=None):
        hs = hosts if hosts is not None else self.HOSTS
        return spark.createDataFrame(
            [(i, h) for i, h in enumerate(hs)], "i long, host string"
        )

    def test_broadcast_identity_with_case_chain(self, spark):
        from dcafs_spark.operators.urls import (
            PUBLIC_SUFFIXES_SAMPLE,
            with_registered_domain,
        )

        df = self._hosts_df(spark)
        case = {
            r["i"]: r["domain"]
            for r in with_registered_domain(
                df, "host", suffixes=PUBLIC_SUFFIXES_SAMPLE, mode="case"
            ).collect()
        }
        bcast = {
            r["i"]: r["domain"]
            for r in with_registered_domain(
                df, "host", suffixes=PUBLIC_SUFFIXES_SAMPLE, mode="broadcast"
            ).collect()
        }
        assert case == bcast
        assert case[0] == "brand3.co.uk" and case[7] == "localhost"

    def test_psl_scale_9k_rules(self, spark):
        from dcafs_spark.operators.urls import with_registered_domain

        # synthetic PSL shape: ~9k rules across 1..3 labels, like the
        # real list (≈75% 2-label country suffixes)
        rules = (
            [f"tld{i}" for i in range(1500)]
            + [f"co{i}.ztld{i % 40}" for i in range(6500)]
            + [f"a{i}.b{i}.ztri{i % 10}" for i in range(1000)]
        )
        assert len(rules) == 9000
        hosts = [
            "site.tld7",                 # 1-label rule
            "www2.site.co12.ztld12",     # 2-label rule, subdomain
            "x.a9.b9.ztri9",             # 3-label rule
            "a9.b9.ztri9",               # host == bare 3-label suffix
            "deep.sub.site.co40.ztld0",  # 2-label rule, deep chain
            "nomatch.example",           # no rule
        ]
        out = {
            r["i"]: r["domain"]
            for r in with_registered_domain(
                self._hosts_df(spark, hosts), "host", suffixes=rules, mode="auto"
            ).collect()
        }
        assert out[0] == "site.tld7"
        assert out[1] == "site.co12.ztld12"
        assert out[2] == "x.a9.b9.ztri9"
        assert out[3] == "a9.b9.ztri9"        # bare suffix falls through
        assert out[4] == "site.co40.ztld0"
        assert out[5] == "nomatch.example"

    def test_auto_picks_broadcast_and_plan_is_broadcast_join(self, spark):
        from dcafs_spark.operators.urls import with_registered_domain

        rules = [f"t{i}" for i in range(300)]  # past PSL_BROADCAST_THRESHOLD
        plan = with_registered_domain(
            self._hosts_df(spark), "host", suffixes=rules, mode="auto"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # the corpus never shuffles

    def test_wildcard_rules_rejected_and_dupes_collapsed(self, spark):
        from dcafs_spark.operators.urls import with_registered_domain

        df = self._hosts_df(spark, ["a.co.uk"])
        with pytest.raises(ValueError, match="wildcard"):
            with_registered_domain(df, "host", suffixes=["*.ck"], mode="broadcast")
        out = with_registered_domain(
            df, "host", suffixes=["co.uk", "co.uk", "uk"], mode="broadcast"
        ).collect()
        assert len(out) == 1 and out[0]["domain"] == "a.co.uk"

    def test_ops_equal_under_both_modes(self, spark):
        from dcafs_spark.operators.urls import (
            domain_capped_sample,
            domain_profile,
            url_filter,
        )

        rows = [
            (i, f"https://sub{i % 3}.brand{i % 4}.co.uk/p/{i % 5}") for i in range(40)
        ] + [(100 + j, f"https://brand{j}.net/x?utm_source=a&id={j}") for j in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        for op in (
            lambda d, m: domain_profile(d, "url", "doc_id", psl_mode=m),
            lambda d, m: url_filter(
                d, "url", blocked_domains=["brand1.co.uk"], psl_mode=m
            ),
            lambda d, m: domain_capped_sample(d, "url", "doc_id", k=3, psl_mode=m),
        ):
            a = sorted(map(tuple, op(df, "case").collect()))
            b = sorted(map(tuple, op(df, "broadcast").collect()))
            assert a == b


class TestParagraphDedup:
    def test_corpus_and_intra_regimes(self, spark):
        from dcafs_spark.operators.dedup import paragraph_dedup_stats

        para = " ".join(f"w{i}" for i in range(20))  # one exact 20-word paragraph
        other = " ".join(f"x{i}" for i in range(20))
        rows = [
            (1, para),                         # boilerplate copy 1
            (2, para),                         # copy 2
            (3, para),                         # copy 3 → corpus-repeated (≥3 docs)
            (4, other + " " + other),          # intra-doc repeat, only 1 doc
            (5, " ".join(f"y{i}" for i in range(7))),  # short unique doc
        ]
        got = {
            r["doc_id"]: r
            for r in paragraph_dedup_stats(
                spark.createDataFrame(rows, "doc_id long, text string"),
                chunk_words=20,
                min_docs=3,
            ).collect()
        }
        for d in (1, 2, 3):  # every copy removed — no first-owner survivor
            assert got[d]["n_repeated_corpus"] == 1 and got[d]["kept_words"] == 0
        assert got[4]["n_paras"] == 2
        assert got[4]["n_repeated_intra"] == 1  # second occurrence collapses
        assert got[4]["kept_words"] == 20       # one copy survives
        assert got[5]["n_paras"] == 1 and got[5]["kept_words"] == 7


class TestQualityClassifier:
    def test_score_matches_python_replica(self, spark):
        """Bit-exact replica of the broadcast linear scorer in pure
        python (same md5 bucketing, same left-assoc float sum, same
        rational squash) — the cross-engine determinism argument in
        the operator docstring, verified against a third engine."""
        import hashlib

        from dcafs_spark.operators.textan import linear_quality_score

        weights = [0.5, -1.0, 2.0, 0.25] * 4
        rows = [(1, "the quick brown fox"), (2, "a a a"), (3, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["score"], r["kept"])
            for r in linear_quality_score(df, weights, bias=0.1, threshold=0.5).collect()
        }

        def bucket(w):
            return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 16

        for doc_id, text in rows:
            toks = text.strip().lower().split() if text.strip() else [""]
            # split('\\s+') on empty text yields [''] — a phantom token
            # that still hashes into a bucket (matches words() exactly)
            if text == "":
                toks = [""]
            n = max(len(toks), 1)
            z = 0.1
            for i, w in enumerate(weights):
                z = z + w * (sum(1 for t in toks if bucket(t) == i) / n)
            score = round(0.5 * (1.0 + z / (1.0 + abs(z))), 6)
            assert got[doc_id][0] == score
            assert got[doc_id][1] == (score >= 0.5)
