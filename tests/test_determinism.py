"""Partition-order determinism for double-aggregating queries.

Double summation is partition-order dependent: a 3dp round of a float
sum can flip at a x.xx5 boundary when the shuffle layout changes, which
flips the driver's value hash (the round-2/3 `sessionize` latent flake).
These queries now sum `value` as exact integer cents (`_csum`), so their
results must be bit-identical under any `spark.sql.shuffle.partitions`.
The sweep re-plans each query under widely different partition counts
(1 forces a single sequential sum; 97 is prime → maximally different
row-to-partition layout) and compares full-result digests.
"""

import hashlib
import math

import pytest

from dcafs_spark.queries import QUERIES

SWEEP = [1, 7, 97]
FLAKY_SUSPECTS = [
    "tumbling_window",
    "sessionize",
    "skew_salted_agg",
    "pivot_events",
    "sliding_window",
    # money sums (decimal(30,6) exact path — _dsum)
    "pricing_summary",
    "join_enrich",
    "topk_customers",
    "rollup_revenue",
    "regional_revenue",
    "cube_revenue",
    # round-4 additions: iterative CC, percentiles, shingle joins
    "dedup_clusters",
    "dedup_embedding_clusters",
    "doc_length_quantiles",
    "decontaminate",
    "text_repetition",
    # round-5 additions: chunk-owner window, top-k limit, per-stratum
    # window, per-shard packing cumsum
    "line_dedup",
    "ngram_topk",
    "lang_balanced_sample",
    "sequence_packing",
    "inverted_index",
    "chunk_dedup_apply",
    "corpus_stats",
    # round-5 additions: money-sum top-k, tolerance-nulled window fill,
    # float dot products rounded at 6dp
    "shipping_priority",
    "asof_tolerance",
    "random_projection",
    "embedding_quantize",
    "lang_mix_weights",
    "quality_band_sample",
    "oov_rate",
    "code_detect",
    "cross_dedup",
    "text_clean",
    "tfidf_topk",
    "track_sog_cog",
    "session_funnel",
    "retention_cohorts",
    "text_hash_embedding",
    # round-5 TPC-H shapes: semi-join counts, window-avg cents filter,
    # agg-of-agg histogram
    "order_priority",
    "small_order_revenue",
    "cust_order_distribution",
    "resample_gapfill",
    "outlier_mad",
    "resample_interp",
    # round-6 additions: decimal money sums through deep join trees,
    # ratio-of-exact-sums shares, global-max window, frame medians,
    # integer-exact corr/z-score, entropy float sums, packing audit
    "volume_shipping",
    "market_share",
    "promo_revenue",
    "top_supplier",
    "disjunctive_revenue",
    "sales_opportunity",
    "rolling_median",
    "event_transitions",
    "hourly_lag_corr",
    "anomaly_zscore",
    "zipf_vocab",
    "token_entropy",
    "embedding_dim_stats",
    "nearest_port",
    "nation_profit",
    "packing_efficiency",
    "grouping_sets_revenue",
    "cumulative_active_users",
    "json_props_extract",
    "ntile_deciles",
    "levenshtein_drift",
    "histogram_log_bins",
    "event_type_profile",
]


def _digest(df):
    cols = df.columns
    rows = df.collect()

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    h = hashlib.md5()
    for line in sorted("|".join(norm(r[c]) for c in cols) for r in rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", FLAKY_SUSPECTS)
def test_result_stable_across_shuffle_layouts(spark, sf_dir, name):
    fn, _sql = QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    digests = set()
    try:
        for n in SWEEP:
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            digests.add(_digest(fn(spark, sf_dir)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(digests) == 1
