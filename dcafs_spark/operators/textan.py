"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All deterministic Catalyst expressions (so the DuckDB oracle replicates
them exactly) and all narrow maps — at 100 TB these run at scan speed
with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from dcafs_spark.runtime import checkpoint

# minimal stopword profiles for the n-gram/stopword language heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "es": ["el", "los", "las", "una", "por", "que"],
}

_WORD_RE = r"[A-Za-z]+"
# BPE-ish tokenizer: word pieces, numbers, or single punctuation marks
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count. Empty/whitespace-only text counts 0 —
    split('') yields [''], which is a phantom field, not a token (a
    token-budget ledger must not charge one token per empty doc)."""
    return F.size(F.filter(words(col), lambda x: x != ""))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish regex token count (letters / digits / punct pieces)."""
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_RE), 0))


def lang_score(col: Column, lang: str) -> Column:
    """Fraction of words that are marker stopwords for `lang`."""
    w = words(col)
    markers = _LANG_MARKERS[lang]
    hits = F.size(F.filter(w, lambda x: x.isin(*markers)))
    return hits.cast("double") / F.size(w)


def lang_id(col: Column) -> Column:
    """Heuristic language id: CJK-char ratio → 'zh'; else the stopword
    profile with the highest hit ratio; 'und' when nothing scores."""
    cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", ""))
    cjk_ratio = cjk.cast("double") / F.greatest(F.length(col), F.lit(1))
    scores = [(lang, lang_score(col, lang)) for lang in _LANG_MARKERS]
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return F.when(cjk_ratio > 0.2, F.lit("zh")).otherwise(best_lang)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-length features plus a
    composite quality score in [0,1].

    (Staging the token array in its own projection was measured here
    and does NOT help — 1.39 vs 1.48 s at the 64× rung: the regex
    punct/upper scans dominate, not the 3 tokenize references. The
    hazard fix stays where it measured: `hashed_token_bids` 7.1×,
    `bm25_score` 1.8×.)"""
    out_cols = list(df.columns)
    col = F.col(text_col)
    w = words(col)
    n_chars = F.length(col)
    n_words = F.size(w)
    mean_word_len = F.round(
        F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n_words, 4
    )
    punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    punct_ratio = F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4)
    stop_hits = F.size(F.filter(w, lambda x: x.isin("the", "a", "of", "and", "to", "is", "in")))
    stop_ratio = F.round(stop_hits.cast("double") / F.greatest(n_words, F.lit(1)), 4)
    upper_ratio = F.round(
        F.length(F.regexp_replace(col, r"[^A-Z]", "")).cast("double") / F.greatest(n_chars, F.lit(1)), 4
    )
    # composite: reward moderate length & stopword presence, punish
    # extreme punctuation / all-caps (C4/Gopher-style rule scoring)
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 2.5) & (mean_word_len <= 12), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
        + F.when(upper_ratio < 0.3, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        *out_cols,
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        mean_word_len.alias("q_mean_word_len"),
        punct_ratio.alias("q_punct_ratio"),
        stop_ratio.alias("q_stop_ratio"),
        upper_ratio.alias("q_upper_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def fingerprint(col: Column, n: int = 8) -> Column:
    """Winnowing-style document fingerprint: the minimum md5 over
    word 8-shingles of normalized text (order-invariant under exact
    shingle set; robust to whitespace changes)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.array_min(F.transform(grams_of(F.split(norm, " "), n), F.md5))


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Gopher-style repetition: fraction of duplicate word n-grams,
    1 - |distinct n-grams| / |n-grams| (0 = no repetition). Unlike
    `word_shingles` this keeps duplicates — that's the signal."""
    grams = grams_of(words(col), n)
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / F.size(grams), 4
    )


# PII patterns kept to the regex subset Java regex and RE2 (DuckDB)
# interpret identically: character classes, bounded repetition,
# alternation — no lookaround, no backreferences.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+[0-9]{2}[0-9 ]{7,12}[0-9]",
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora (the standard pre-training
    scrub: emails / IPs / phone numbers → typed placeholder tokens).

    Pure Catalyst regexp ops — a narrow map that runs at scan speed
    with zero shuffle at any corpus size. Counts come from
    regexp_extract_all before replacement; redaction applies the three
    patterns in a fixed order (email, ipv4, phone) so overlapping
    matches resolve identically on every engine.
    """
    col = F.col(text_col)
    counts = {
        f"n_{k}": F.size(F.regexp_extract_all(col, F.lit(p), 0)).cast("bigint")
        for k, p in PII_PATTERNS.items()
    }
    red = col
    for k, p in PII_PATTERNS.items():
        red = F.regexp_replace(red, p, f"<{k.upper()}>")
    return df.select(
        *df.columns,
        *[c.alias(n) for n, c in counts.items()],
        red.alias("redacted"),
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores for a FIXED query term set — the retrieval
    scoring a curation/decontamination pipeline runs against a known
    probe set (benchmark prompts, seed-corpus queries). Emits one row
    per document containing at least one query term:
    (id_col, n_tokens, bm25_micro).

    idf is the Lucene/ATIRE positive form ln((N − df + 0.5)/(df + 0.5)
    + 1); per-term contribution idf · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl)).

    Scale shape — zero explode, zero wide shuffle: per-doc term
    frequencies for the (bounded) query set and the doc length are
    ONE narrow map over the scan (a size(filter(words)) per term —
    no (doc, term) pairs ever materialize); corpus statistics (N,
    Σdl for avgdl, per-term document frequencies) reduce to a single
    map-side-combined aggregate row that broadcasts back; scoring is
    a second narrow map over the checkpointed base. Per-(doc, term)
    contributions quantize to int64 micro-units BEFORE summing, so
    the total is order-independent and engine-portable (ln parity is
    the same contract the surprisal/DSIR gates rely on).

    The token array materializes in its own projection before the
    per-term frequencies reference it — without the split, dl + one
    _tf per term each inlined their own tokenize (|terms|+1 passes on
    the interpreted HOF path, the `hashed_token_bids` hazard class;
    staging measured 1.9× on the 64×/32k-doc rung)."""
    staged = df.withColumn(
        "__bm25_w", F.filter(words(F.col(text_col)), lambda x: x != "")
    )
    w = F.col("__bm25_w")

    def _tf(term: str) -> Column:
        # NB: a two-parameter lambda (e.g. `lambda x, t=t`) would make
        # F.filter pass the ELEMENT INDEX into the second slot — the
        # arity-dispatch trap word_shingles documents
        return F.size(F.filter(w, lambda x: x == F.lit(term))).cast("long")

    tf_cols = [_tf(t).alias(f"_tf{i}") for i, t in enumerate(query_terms)]
    # one tokenize pass feeds the stats agg AND the scoring map
    base = staged.select(
        F.col(id_col).alias("id"), F.size(w).cast("long").alias("dl"), *tf_cols
    ).transform(checkpoint)
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("N"),
        F.sum("dl").cast("long").alias("tot"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("long").alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    dl_over_avg = F.col("dl").cast("double") * F.col("N") / F.col("tot")
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            (F.col("N") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5) + 1.0
        )
        tf = F.col(f"_tf{i}").cast("double")
        denom = tf + k1 * (1.0 - b + b * dl_over_avg)
        contrib = F.round(idf * tf * (k1 + 1.0) / denom * 1e6).cast("long")
        score = contrib if score is None else score + contrib
    any_hit = None
    for i in range(len(query_terms)):
        hit = F.col(f"_tf{i}") > 0
        any_hit = hit if any_hit is None else (any_hit | hit)
    return (
        base.crossJoin(F.broadcast(stats))
        .filter(any_hit)
        .select(F.col("id").alias(id_col), F.col("dl").alias("n_tokens"), score.alias("bm25_micro"))
    )


def grams_of(w: Column, n: int) -> Column:
    """Word n-grams (duplicates KEPT) from a words array — the single
    construction shared by ngrams/fingerprint/repetition/gopher so the
    short-doc clamp (k >= 1) can never drift between them."""
    k = F.greatest(F.size(w) - F.lit(n - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), k), lambda i: F.array_join(F.slice(w, i, n), " "))


def ngrams(col: Column, n: int = 2) -> Column:
    """All word n-grams of the text (duplicates kept), as
    array<string> — the corpus-statistics building block."""
    return grams_of(words(col), n)


def ngram_topk(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 50, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level top-k word n-grams with document frequency.

    explode → groupBy(gram) with map-side partial aggregation, so the
    shuffle carries (gram, partial count) per distinct gram per
    partition, not one row per occurrence; the top-k is a single
    ordered limit the driver never materializes beyond k rows.
    Deterministic tiebreak on the gram string itself.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"), F.explode(ngrams(F.col(text_col), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.count("*").alias("occurrences"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    return (
        counts.orderBy(F.desc("occurrences"), F.asc("gram"))
        .limit(k)
        .select("gram", "occurrences", "doc_freq")
    )


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_postings: int = 20
) -> DataFrame:
    """Term → (document frequency, capped posting list) — the corpus
    index artifact retrieval/decontamination tooling consumes.

    Skew-safe two-level aggregation: a window row_number over the term
    partition (the previous shape) pairs row_number with a full
    count(*) frame, which disables Spark's WindowGroupLimit partial
    pushdown — EVERY (term, id) pair for a corpus-wide stopword would
    shuffle into and sort in ONE task. Instead, level 1 groups by
    (term, input partition): the partial aggregation completes
    map-side (the partition id is constant within each task) and the
    first exchange hashes on the COMPOSITE key, so a stopword's rows
    scatter across reducers; its projection keeps only the
    `max_postings` lowest ids per partition plus a count. Level 2
    merges per-term: ≤ #partitions rows of ≤ max_postings ids each —
    bounded regardless of corpus size — and min-k of per-partition
    min-ks is exactly the global min-k, so the output is identical to
    the single-window form. doc_freq = sum of partial counts.
    Postings render as a csv string so cross-engine comparers see a
    scalar. (id_col must be unique per row — the corpus-table
    contract; per-row array_distinct dedups a doc's own terms, so no
    (term, id) duplicate can exist.)"""
    pairs = df.select(
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("term"),
        F.col(id_col).alias("id"),
        F.spark_partition_id().alias("_p"),
    )
    partial = pairs.groupBy("term", "_p").agg(
        F.count(F.lit(1)).alias("_c"),
        F.slice(F.array_sort(F.collect_list("id")), 1, max_postings).alias("_ids"),
    )
    return partial.groupBy("term").agg(
        F.sum("_c").cast("bigint").alias("doc_freq"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.flatten(F.collect_list("_ids"))), 1, max_postings),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


# Gopher-rule bounds (Rae et al. 2021 §A1.1, adapted): each rule is an
# independent boolean; keep = every rule passes.
GOPHER_RULES = {
    "ok_word_count": "words in [50, 100000]",
    "ok_mean_word_len": "mean word length in [3, 10]",
    "ok_stopwords": ">= 2 distinct common stopwords",
    "ok_repetition": "duplicate 2-gram fraction < 0.30",
}


def gopher_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style quality gate: four independent rule booleans plus
    the conjunction `keep`. All narrow Catalyst expressions (no UDF,
    no shuffle) — at 100 TB this is a scan-side filter whose predicate
    pushes into the parquet read when callers filter on `keep`."""
    col = F.col(text_col)
    w = words(col)
    n_words = F.size(w)
    mean_wl = F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n_words
    stop_set = ["the", "a", "of", "and", "to", "is", "in", "that", "for", "with"]
    n_stop = F.size(F.array_distinct(F.filter(w, lambda x: x.isin(*stop_set))))
    # unrounded repetition fraction: the rule compares it, and a rounded
    # value could straddle the threshold differently across engines
    grams2 = grams_of(w, 2)
    rep2 = F.lit(1.0) - F.size(F.array_distinct(grams2)).cast("double") / F.size(grams2)
    ok_wc = (n_words >= 50) & (n_words <= 100000)
    ok_mwl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    ok_stop = n_stop >= 2
    ok_rep = rep2 < 0.30
    # rule flags as 0/1 bigints: cross-engine drivers compare cell text,
    # and int is the one representation every engine prints identically
    return df.select(
        *df.columns,
        ok_wc.cast("bigint").alias("ok_word_count"),
        ok_mwl.cast("bigint").alias("ok_mean_word_len"),
        ok_stop.cast("bigint").alias("ok_stopwords"),
        ok_rep.cast("bigint").alias("ok_repetition"),
        (ok_wc & ok_mwl & ok_stop & ok_rep).cast("bigint").alias("keep"),
    )


# code-detection keyword set: \b works identically in Java regex and
# RE2 for this ASCII alternation
_CODE_KW_RE = r"\b(def|class|import|return|function|const|void|static|public)\b"


def code_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Code-vs-prose heuristic (curation pipelines route code to a
    separate bucket / tokenizer): integer-only structural counts plus
    an `is_code` flag. Narrow map, zero shuffle.

    - n_punct_code: chars from the code-punctuation class {}();=<>[]
    - n_kw: keyword hits (def/class/import/...) in lowered text
    - n_indent: lines starting with a 4-space indent, counted via a
      length-diff on replace('\\n    ') — no multiline regex flag,
      whose semantics differ across engines
    - is_code: punctuation density > 3% OR (>=3 keywords AND >=2
      indented lines)
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[^{}();=<>\[\]]", ""))
    n_kw = F.size(F.regexp_extract_all(F.lower(t), F.lit(_CODE_KW_RE), 0))
    n_indent = (
        (n_chars - F.length(F.replace(t, F.lit("\n    "), F.lit("")))) / F.lit(5)
    ).cast("long")
    is_code = (
        (n_punct * 1000 > n_chars * 30) | ((n_kw >= 3) & (n_indent >= 2))
    ).cast("int")
    return df.select(
        *df.columns,
        n_punct.cast("long").alias("n_punct_code"),
        n_kw.cast("long").alias("n_kw"),
        n_indent.alias("n_indent"),
        is_code.alias("is_code"),
    )


# --- SQL-text expression builders (round 14 optimization) ------------
# Same pattern as operators/similarity.py / operators/dedup.py: the
# hashed-feature + linear-score chain costs ~0.34 s of driver-side py4j
# Column-DSL construction per call (16 filter/size features + the
# 16-term weighted sum). These emit the SAME tree as ONE parsed SQL
# text; value parity pinned by the untouched oracle hashes of every
# gated caller. A str argument means an SQL expression fragment.


def _sql_words(col_sql: str) -> str:
    return f"split(lower(trim({col_sql})), '\\\\s+')"


def _sql_hashed_token_bids(col_sql: str, n_buckets: int = 16) -> str:
    return (
        f"transform({_sql_words(col_sql)}, "
        f"t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % {n_buckets})"
    )


def _sql_hashed_token_feature(bids_sql: str, i: int) -> str:
    return (
        f"(size(filter({bids_sql}, b -> b = {i})) / greatest(size({bids_sql}), 1))"
    )


def _sql_linear_z(bids_sql: str, weights: list[float], bias: float) -> str:
    """The left-associated bias + Σ wᵢ·fᵢ chain as SQL text (same
    fold order as the Column path — float add is not associative)."""
    z = f"{float(bias)!r}D"
    for i, w in enumerate(weights):
        z = f"({z} + {float(w)!r}D * {_sql_hashed_token_feature(bids_sql, i)})"
    return z


def hashed_token_bids(col: Column | str, n_buckets: int = 16) -> Column:
    """Hashing-trick bucket id per token (one md5 each) — the feature
    substrate for `linear_quality_score`. Returned as ONE array column
    so the caller can MATERIALIZE it in its own projection before the
    per-bucket counts reference it: higher-order functions evaluate as
    CodegenFallback (no cross-expression subexpression sharing), so 16
    frequency expressions each embedding their own copy of this
    transform would pay the per-token md5 16× (measured at the 256×/128k-doc
    rung: 7.0 s inlined → 0.96 s after splitting the projection).
    A str argument is an SQL expression fragment (single-`F.expr`
    build)."""
    if isinstance(col, str):
        return F.expr(_sql_hashed_token_bids(col, n_buckets))
    return F.transform(
        words(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % n_buckets,
    )


def hashed_token_features(bids: Column, n_buckets: int = 16) -> list[Column]:
    """Per-bucket token frequencies over a MATERIALIZED bid array
    (`hashed_token_bids` in its own projection — see its docstring).
    Each frequency is a `filter`+`size` over the small int array: zero
    shuffle, zero explode, the whole feature vector stays in the scan
    stage. Frequencies are exact rationals count/n_tokens (one
    correctly-rounded division — engine-portable)."""
    n_tok = F.greatest(F.size(bids), F.lit(1))
    return [
        (F.size(F.filter(bids, lambda b: b == i)) / n_tok).alias(f"f{i}")
        for i in range(n_buckets)
    ]


def linear_quality_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Quality-classifier scoring with a BROADCAST linear model — the
    fastText/DSIR-style pipeline stage that scores every document in a
    corpus against a small trained model (here the model is the
    literal weight vector riding the plan; at 100 TB that is the whole
    point — no join, no UDF, no model server, one scan).

    score = 0.5 * (1 + z / (1 + |z|)) with z = bias + Σ wᵢ·fᵢ over the
    hashed token frequencies — the rational squash, NOT the logistic:
    exp() is not correctly-rounded and may differ in the last ulp
    between engines, while add/mul/div/abs are IEEE-exact, so the
    score (rounded to 6 dp, the repo's similarity convention) is
    bit-identical in the SQL oracle. `kept` compares the ROUNDED
    score to the threshold, so no unrounded boundary exists.

    The bucket-id array materializes in its own projection (NOT
    inlined into the 16 frequency expressions) — the 16× md5 hazard
    `hashed_token_bids` documents."""
    bid_col = "__lqs_bids"
    staged = df.withColumn(bid_col, hashed_token_bids(f"`{text_col}`", len(weights)))
    # whole z-chain + rational squash as ONE SQL text (same tree as the
    # former Column-DSL loop: left-associated adds, f-i division order)
    z = _sql_linear_z(f"`{bid_col}`", [float(w) for w in weights], float(bias))
    score = F.expr(f"round((0.5D * (1.0D + ({z} / (1.0D + abs({z}))))), 6)")
    return (
        staged.withColumn("score", score)
        .withColumn("kept", F.col("score") >= threshold)
        .drop(bid_col)
    )


_LR_MEMO: dict[str, tuple[list[float], float]] = {}


def train_quality_lr(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 16,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-3,
    memo_key: str | None = None,
) -> tuple[list[float], float]:
    """Distributed training of the model-based quality filter — the
    GPT-3/LLaMA curation stage (Brown et al. 2020, appendix A: a
    logistic-regression classifier on hashed token features, positives
    = a curated reference corpus, negatives = raw crawl; docs scoring
    low get dropped). Batch gradient descent where EACH ITERATION IS
    ONE map-side-combinable Spark aggregation over the materialized
    feature frame (the MLlib treeAggregate shape): driver traffic per
    iteration is n_buckets+2 doubles, the corpus is tokenized and
    hashed exactly ONCE (eager checkpoint), and the feature rows the
    iterations loop over are (label, 16 doubles) — never text. Class
    imbalance is handled with a positive-class weight n_neg/n_pos
    (balanced risk), L2 everywhere but the bias.

    Returns (weights, bias) as driver-side floats — like
    `kmeans_train`/`train_pq`, the trained model is bounded driver
    state that rides subsequent scoring plans as literals
    (`linear_quality_score`-shaped: no join, no UDF at inference).
    Memoized per `memo_key` (the per-sf_dir convention).

    Data-dependent float reduction → rows-only gate + numpy third
    oracle (the adjudicated trained-gate pattern; replica in
    tests/test_round14_ops.py replays the GD allclose)."""
    if memo_key is not None and memo_key in _LR_MEMO:
        return _LR_MEMO[memo_key]
    from dcafs_spark.runtime import checkpoint

    bid_col = "__lr_bids"
    staged = df.withColumn(bid_col, hashed_token_bids(F.col(text_col), n_buckets))
    feats = hashed_token_features(F.col(bid_col), n_buckets)
    # class counts ride the checkpoint's own action as an Observation
    # (r15 — the connected_components treatment): one job instead of
    # materialize + a separate counts aggregate
    obs = Observation()
    frame = (
        staged.select(F.col(label_col).cast("double").alias("y"), *feats)
        .observe(obs, F.sum("y").alias("np"), F.count(F.lit(1)).cast("double").alias("n"))
        .transform(checkpoint, eager=True)
    )
    counts = obs.get
    n_pos, n = float(counts["np"] or 0), float(counts["n"] or 0)
    if n_pos == 0 or n_pos == n:
        raise ValueError("train_quality_lr: need both classes present")
    # Scale-adaptive task sizing for the iteration loop (r14): each GD
    # step is a full-frame aggregation JOB, so per-task scheduling
    # overhead is paid iters× — coalesce the materialized (1 + n_buckets)-
    # double rows to ~64 MB/task. At bench SFs that is ONE task per
    # step (measured ~3x faster per step); at 100 TB the formula keeps
    # every core busy (n·136 B ≫ 64 MB·cores), so this is a no-op there.
    row_bytes = 8 * (1 + n_buckets)
    want = int(n * row_bytes // (64 << 20)) + 1
    nparts = frame.rdd.getNumPartitions()
    if want < nparts:
        frame = frame.coalesce(want)
    pos_w = (n - n_pos) / n_pos
    w = [0.0] * n_buckets
    b = 0.0
    for _ in range(iters):
        # per-step expressions as SQL text (one selectExpr instead of
        # ~600 py4j Column calls per step — the round-14 build-latency
        # pattern). The residual r = sw·(p−y) is projected ONCE per row
        # and the 18 aggregates reference the projected columns: the
        # former form re-embedded the full z tree in every gradient
        # column, so each step paid whole-stage-codegen compilation of
        # a ~17x larger source (weights are fresh literals every step —
        # no codegen cache hit possible). Sums are bit-identical: r
        # evaluates to the same double either way.
        z = f"{float(b)!r}D"
        for i, wi in enumerate(w):
            z = f"({z} + {float(wi)!r}D * f{i})"
        p = f"(1.0D / (1.0D + exp(-{z})))"
        sw = f"(CASE WHEN y > 0 THEN {float(pos_w)!r}D ELSE 1.0D END)"
        r = f"({sw} * ({p} - y))"
        row = (
            frame.selectExpr(
                f"{sw} AS _sw", f"{r} AS _r", *[f"f{i}" for i in range(n_buckets)]
            )
            .selectExpr(
                "sum(_sw) AS sw",
                "sum(_r) AS gb",
                *[f"sum(_r * f{i}) AS g{i}" for i in range(n_buckets)],
            )
            .collect()[0]
        )
        denom = float(row["sw"])
        b -= lr * float(row["gb"]) / denom
        w = [
            wi - lr * (float(row[f"g{i}"]) / denom + l2 * wi)
            for i, wi in enumerate(w)
        ]
    out = (w, b)
    if memo_key is not None:
        _LR_MEMO[memo_key] = out
    return out


def term_blocklist_stats(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
    passthrough: bool = False,
) -> DataFrame:
    """Term-blocklist filtering — the wordlist stage (NSFW/spam/banned
    phrases, the C4 "bad words" filter class) every crawl curation
    pipeline runs: per document, the number of blocklisted term
    occurrences (case-insensitive, word-boundary, multi-word phrases
    allowed), the number of DISTINCT blocked terms hit, and the
    verdict `kept = n_hits <= max_hits` (the common policy grades on
    hit count, not binary presence — one incidental hit in a long
    document is not a porn page).

    Scale shape (100 TB): one compiled regexp alternation evaluated in
    the scan projection — no join, no shuffle, no UDF; a wordlist is
    10^2-10^3 terms, far under the codegen hazard (it is ONE regexp
    literal, not unrolled expressions). Terms are \\Q…\\E-quoted and
    sorted longest-first so phrase entries win over their own
    substrings identically in Spark (Java regex) and the DuckDB
    oracle (RE2) — both use leftmost-first alternation.

    ASCII-text assumption (r13 ADVICE): the ``\\b`` anchors are
    Unicode-aware in Java but ASCII-only in RE2, so verdicts can
    diverge when a blocked term abuts a non-ASCII word character —
    run `encoding_qc`-class filtering (or ASCII-normalize) upstream
    for multilingual corpora. Terms whose first or last character is
    not an ASCII word char can never match inside the anchors and are
    rejected here rather than silently never matching.

    `passthrough=True` appends the three verdict columns to the input
    columns instead of projecting down to (id, verdicts) — the
    composed-pipeline form (`corpus_curation`), still one scan."""
    if not terms:
        raise ValueError("terms must be non-empty")
    import re as _re

    for t in terms:
        if "\\E" in t:
            raise ValueError("blocklist terms may not contain \\\\E")
        if not _re.match(r"^\w.*\w$|^\w$", t, _re.ASCII):
            raise ValueError(
                "blocklist term %r must start and end with an ASCII word "
                "character (\\b anchors can never match otherwise)" % t
            )
    pat = (
        r"\b(?:"
        + "|".join("\\Q" + t.lower() + "\\E" for t in sorted(terms, key=len, reverse=True))
        + r")\b"
    )
    hits = F.regexp_extract_all(F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(pat), 0)
    head = list(df.columns) if passthrough else [id_col]
    return df.select(
        *head,
        F.size(hits).cast("bigint").alias("n_hits"),
        F.size(F.array_distinct(hits)).cast("bigint").alias("n_distinct_terms"),
        (F.size(hits) <= max_hits).alias("kept"),
    )


def encoding_qc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ascii_ratio: float = 0.995,
    passthrough: bool = False,
) -> DataFrame:
    """Encoding/mojibake QC — the decode-sanity stage a crawl pipeline
    runs right after charset detection: documents carrying U+FFFD
    replacement characters (a botched transcode), C0 control bytes
    (binary mis-sniffed as text), or a high non-ASCII-ratio anomaly
    for an ASCII-expected source get flagged before they poison
    tokenizer/LM stats downstream. Reports per doc: replacement-char
    count, control-char count (C0 minus tab/newline/CR), the rounded
    printable-ASCII ratio, and `kept`.

    The ratio is ROUNDED to 6 dp and the threshold compares against
    the rounded value (the repo's cross-engine float convention). For
    multilingual corpora the ratio is a reporting column, not a drop
    rule — gate on the replacement/control counts only (set
    min_ascii_ratio=0.0).

    Scale shape (100 TB): three regexp counts + one length, all in the
    scan projection — no join, no shuffle, no UDF. `passthrough=True`
    appends the verdict columns to the input columns (the composed-
    pipeline form, `corpus_curation`), still one scan."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_repl = F.size(F.regexp_extract_all(t, F.lit(r"\x{FFFD}"), 0)).cast("bigint")
    n_ctrl = F.size(
        F.regexp_extract_all(t, F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F]"), 0)
    ).cast("bigint")
    n_nonascii = F.size(F.regexp_extract_all(t, F.lit(r"[^\x09\x0A\x0D\x20-\x7E]"), 0))
    ln = F.length(t)
    ratio = F.when(ln == 0, F.lit(1.0)).otherwise(
        F.round(F.lit(1.0) - n_nonascii / ln, 6)
    )
    head = [F.col(c) for c in df.columns] if passthrough else [F.col(id_col)]
    return df.select(
        *head,
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        ratio.alias("ascii_ratio"),
        (
            (n_repl == 0) & (n_ctrl == 0) & (ratio >= F.lit(min_ascii_ratio))
        ).alias("kept"),
    )


def clean_text(col: Column) -> Column:
    """Training-corpus text normalization (the C4/CCNet-style cleanup
    pass): strip markup tags, decode the common HTML entities, drop
    control characters, collapse runs of whitespace, trim. Pure
    regexp_replace chain — scan-speed, zero shuffle, and every regex
    stays in the Java/RE2-common subset so a DuckDB oracle reproduces
    it byte-for-byte."""
    out = F.regexp_replace(col, r"<[^>]{0,512}>", " ")  # bounded: no catastrophic scan
    # &amp; decodes LAST (standard entity semantics): a double-escaped
    # '&amp;lt;' must yield the literal '&lt;', not '<'
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)
