"""Differential tests for the round-6 analytics batch against
numpy/pandas — an independent second oracle for the shapes whose DuckDB
gate shares SQL window/join semantics with Spark (rolling stats,
transitions, lagged correlation, nearest-facility) plus plan-shape
assertions for the TPC-H additions."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _events_pd(spark, sf_dir) -> pd.DataFrame:
    from dcafs_spark.queries import _events

    return (
        _events(spark, sf_dir)
        .selectExpr("event_id", "user_id", "event_type", "value", "ts_ns DIV 1000 AS ts_us")
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    )


def test_rolling_median_matches_pandas(spark, sf_dir):
    from dcafs_spark.queries import q_rolling_median

    got = q_rolling_median(spark, sf_dir).toPandas().set_index("event_id")
    ev = _events_pd(spark, sf_dir)
    assert len(got) == len(ev) > 0
    for _uid, g in ev.groupby("user_id"):
        med = g["value"].rolling(10, min_periods=1).median()
        mean = g["value"].rolling(10, min_periods=1).mean()
        for eid, m, a in zip(g["event_id"], med, mean):
            assert abs(got.loc[eid, "med10"] - round(m, 4)) < 1e-9
            assert abs(got.loc[eid, "mean10"] - a) < 1e-6


def test_event_transitions_match_pandas(spark, sf_dir):
    from dcafs_spark.queries import q_event_transitions

    got = q_event_transitions(spark, sf_dir).toPandas()
    ev = _events_pd(spark, sf_dir)
    ev["prev_type"] = ev.groupby("user_id")["event_type"].shift(1)
    ev["gap_us"] = ev["ts_us"] - ev.groupby("user_id")["ts_us"].shift(1)
    want = (
        ev.dropna(subset=["prev_type"])
        .groupby(["prev_type", "event_type"])
        .agg(n=("gap_us", "size"), sum_gap_us=("gap_us", "sum"))
    )
    assert len(got) == len(want) > 0
    for r in got.itertuples():
        w = want.loc[(r.prev_type, r.next_type)]
        assert r.n == w["n"]
        assert r.sum_gap_us == w["sum_gap_us"]


def test_hourly_lag_corr_matches_numpy(spark, sf_dir):
    from dcafs_spark.queries import q_hourly_lag_corr

    got = {int(r.lag_hours): r.pearson_r for r in q_hourly_lag_corr(spark, sf_dir).collect()}
    ev = _events_pd(spark, sf_dir)
    ev["hr"] = ev["ts_us"] // 3_600_000_000
    hourly = (
        ev.groupby("hr")
        .agg(
            clicks=("event_type", lambda s: int((s == "click").sum())),
            purchases=("event_type", lambda s: int((s == "purchase").sum())),
        )
        .reset_index()
    )
    for lag in (0, 1):
        b = hourly[["hr", "purchases"]].copy()
        b["hr"] -= lag
        m = hourly[["hr", "clicks"]].merge(b, on="hr")
        r = np.corrcoef(m["clicks"], m["purchases"])[0, 1]
        assert abs(got[lag] - r) < 1e-5, (lag, got[lag], r)


def test_anomaly_zscore_matches_pandas(spark, sf_dir):
    from dcafs_spark.queries import q_anomaly_zscore

    got = q_anomaly_zscore(spark, sf_dir).toPandas().set_index("event_id")
    ev = _events_pd(spark, sf_dir)
    n_flagged = 0
    for _uid, g in ev.groupby("user_id"):
        x = g["value"].to_numpy()
        mean = pd.Series(x).rolling(20).mean().to_numpy()
        std = pd.Series(x).rolling(20).std(ddof=1).to_numpy()
        with np.errstate(invalid="ignore"):
            z = (x - mean) / std
        for eid, zi in zip(g["event_id"], z):
            flagged = bool(np.isfinite(zi) and abs(zi) > 2.5)
            assert (eid in got.index) == flagged, (eid, zi)
            if flagged:
                n_flagged += 1
                assert abs(got.loc[eid, "z"] - zi) < 1e-3
    assert len(got) == n_flagged


def test_nearest_port_matches_numpy(spark, sf_dir):
    from dcafs_spark.queries import _PORTS, q_nearest_port

    got = q_nearest_port(spark, sf_dir).toPandas().set_index("event_id")
    ev = _events_pd(spark, sf_dir)
    lat = 50.0 + (ev["value"] % 200) / 100.0
    lon = 3.0 + ((ev["value"] * 7) % 300) / 100.0
    best_d = np.full(len(ev), np.inf)
    best_p = np.zeros(len(ev), dtype=np.int64)
    for pid, plat, plon in _PORTS:
        dp = np.radians(plat - lat)
        dl = np.radians(plon - lon)
        a = (
            np.sin(dp / 2) ** 2
            + np.cos(np.radians(lat)) * np.cos(np.radians(plat)) * np.sin(dl / 2) ** 2
        )
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(a))
        # strict < keeps the lowest port_id on ties, like the rank order
        upd = d < best_d
        best_d, best_p = np.where(upd, d, best_d), np.where(upd, pid, best_p)
    assert len(got) == len(ev)
    eids = ev["event_id"].to_numpy()
    for i in range(len(ev)):
        assert got.loc[eids[i], "port_id"] == best_p[i]
        assert abs(got.loc[eids[i], "dist_km"] - best_d[i]) < 1e-3


def test_tpch_plans_push_down_and_broadcast(spark, sf_dir):
    """The new relational shapes must keep their scan-side pruning:
    promo month filter reaches the lineitem scan; the nearest-port
    argmin is a pure map — no join, no exchange anywhere in the
    plan (the literal facility dim unrolls into the projection)."""
    from dcafs_spark.queries import q_nearest_port, q_promo_revenue

    simple = q_promo_revenue(spark, sf_dir)._jdf.queryExecution().toString()
    assert "l_shipdate" in simple and "PushedFilters" in simple
    np_plan = q_nearest_port(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # no join and no key shuffle; the only allowed Exchange is the
    # round-robin input spreading from ensure_parallelism (a local-mode
    # under-split guard, size-gated no-op at real scale)
    assert "Join" not in np_plan and "hashpartitioning" not in np_plan


def test_json_props_extract_matches_pandas(spark, sf_dir):
    import json

    from dcafs_spark.queries import q_json_props_extract

    got = {
        (r.event_type, r.k_band): (r.n, r.sum_k, r.min_k, r.max_k)
        for r in q_json_props_extract(spark, sf_dir).collect()
    }
    ev = _events_pd(spark, sf_dir)
    from dcafs_spark.queries import _events

    props = (
        _events(spark, sf_dir).select("event_id", "event_type", "props").toPandas()
    )
    props["k"] = props["props"].map(lambda s: json.loads(s).get("k"))
    props = props.dropna(subset=["k"])
    props["k"] = props["k"].astype(int)
    want = props.groupby(["event_type", props["k"] % 5])["k"].agg(["size", "sum", "min", "max"])
    assert len(got) == len(want) > 0
    for (et, band), w in want.iterrows():
        assert got[(et, band)] == (w["size"], w["sum"], w["min"], w["max"])
    assert len(ev) >= len(props)  # sanity: dropna only removed missing keys


def test_ntile_deciles_matches_pandas(spark, sf_dir):
    import numpy as np

    from dcafs_spark.queries import q_ntile_deciles

    got = {
        (r.event_type, r.decile): r.n for r in q_ntile_deciles(spark, sf_dir).collect()
    }
    ev = _events_pd(spark, sf_dir)
    for et, g in ev.groupby("event_type"):
        n = len(g)
        # SQL ntile: first (n % 10) tiles get ceil(n/10) rows
        base, extra = divmod(n, 10)
        for d in range(1, 11):
            expect = base + (1 if d <= extra else 0)
            if expect:
                assert got[(et, d)] == expect, (et, d)


def test_levenshtein_drift_matches_python(spark, sf_dir):
    from dcafs_spark.queries import _docs, q_levenshtein_drift

    got = {r.doc_id: r.edit_dist for r in q_levenshtein_drift(spark, sf_dir).collect()}
    docs = (
        _docs(spark, sf_dir).select("doc_id", "text").toPandas().sort_values("doc_id")
    )
    heads = [(int(i), t[:40]) for i, t in zip(docs["doc_id"], docs["text"])]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    assert len(got) == len(heads) - 1 > 0
    for (i, a), (_j, b) in zip(heads, heads[1:]):
        assert got[i] == lev(a, b), i


def test_event_type_profile_matches_pandas(spark, sf_dir):
    from dcafs_spark.queries import q_event_type_profile

    got = {
        r.user_id: (r.types_csv, r.n_types, r.n_events, r.first_value)
        for r in q_event_type_profile(spark, sf_dir).collect()
    }
    ev = _events_pd(spark, sf_dir)
    for uid, g in ev.groupby("user_id"):
        csv = ",".join(sorted(g["event_type"].unique()))
        first = round(float(g.iloc[0]["value"]), 2)  # g pre-sorted by (ts, event_id)
        assert got[uid] == (csv, g["event_type"].nunique(), len(g), first), uid


def test_sales_opportunity_uses_anti_join(spark, sf_dir):
    from dcafs_spark.queries import q_sales_opportunity

    plan = q_sales_opportunity(spark, sf_dir)._jdf.queryExecution().toString()
    assert "LeftAnti" in plan


# ---------------------------------------------------------------- round 7


def test_bigram_pmi_matches_counter(spark, sf_dir):
    import math
    from collections import Counter

    from dcafs_spark.queries import _docs, q_bigram_pmi

    got = {(r.x, r.y): (r.c_xy, r.c_x, r.c_y, r.pmi) for r in q_bigram_pmi(spark, sf_dir).collect()}
    texts = [r.text for r in _docs(spark, sf_dir).select("text").collect()]
    uni, pairs = Counter(), Counter()
    for t in texts:
        ws = [w for w in t.lower().strip().split() if w]
        uni.update(ws)
        pairs.update(zip(ws, ws[1:]))
    U, T = sum(uni.values()), sum(pairs.values())
    exp = {
        (x, y): c for (x, y), c in pairs.items() if c >= 5
    }
    assert set(got) == set(exp) and len(got) > 0
    for (x, y), c in exp.items():
        pmi = round(math.log((c * U * U) / (T * uni[x] * uni[y])), 6)
        assert got[(x, y)][0] == c
        assert abs(got[(x, y)][3] - pmi) < 1e-9, (x, y)


def test_unigram_surprisal_matches_counter(spark, sf_dir):
    import math
    from collections import Counter

    from dcafs_spark.queries import _docs, q_unigram_surprisal

    got = {r.doc_id: (r.n_tokens, r.mean_surprisal) for r in q_unigram_surprisal(spark, sf_dir).collect()}
    docs = [(r.doc_id, r.text) for r in _docs(spark, sf_dir).select("doc_id", "text").collect()]
    uni = Counter()
    toks = {}
    for i, t in docs:
        ws = [w for w in t.lower().strip().split() if w]
        toks[i] = ws
        uni.update(ws)
    # Spark's round() is HALF_UP over the double's shortest decimal
    # repr (BigDecimal.valueOf); python round() is banker's — mimic
    # Spark exactly or boundary terms drift by one micro-nat.
    from decimal import ROUND_HALF_UP, Decimal

    def hround(x, places="1"):
        return Decimal(repr(x)).quantize(Decimal(places), ROUND_HALF_UP)

    U = sum(uni.values())
    for i, ws in toks.items():
        if not ws:
            assert i not in got
            continue
        q = sum(int(hround(math.log(U / uni[w]) * 1e6)) for w in ws)
        exp = float(hround(q / (1e6 * len(ws)), "0.000001"))
        assert got[i][0] == len(ws)
        assert abs(got[i][1] - exp) < 1e-9, i


def test_dim_covariance_matches_numpy(spark, sf_dir):
    from dcafs_spark.queries import _embs, q_dim_covariance

    got = {(r.i, r.j): r.cov for r in q_dim_covariance(spark, sf_dir).collect()}
    embs = np.array(
        [r.embedding[:8] for r in _embs(spark, sf_dir).select("embedding").collect()],
        dtype=np.float64,
    )
    q = np.round(embs * 1e6)  # the query's micro-unit quantization
    cov = np.cov(q.T, ddof=1) / 1e12
    assert len(got) == 36
    for i in range(8):
        for j in range(i, 8):
            assert abs(got[(i, j)] - cov[i, j]) < 1e-6, (i, j)


def test_gini_sources_matches_python(spark, sf_dir):
    from collections import Counter

    from dcafs_spark.queries import _docs, q_gini_sources

    row = q_gini_sources(spark, sf_dir).first()
    counts = Counter(r.source for r in _docs(spark, sf_dir).select("source").collect())
    cs = sorted(counts.values())
    k, tot = len(cs), sum(cs)
    gini = (2 * sum((i + 1) * c for i, c in enumerate(cs))) / (k * tot) - (k + 1) / k
    assert row.n_sources == k and row.total_docs == tot
    assert abs(row.gini - round(gini, 6)) < 1e-9
    assert 0.0 <= row.gini < 1.0


def test_click_attribution_matches_pandas(spark, sf_dir):
    from dcafs_spark.queries import q_click_attribution

    got = {r.purchase_id: (r.click_id, r.gap_sec) for r in q_click_attribution(spark, sf_dir).collect()}
    ev = _events_pd(spark, sf_dir)
    ns = ev.assign(ts_ns=ev["ts_us"] * 1000)
    n_attr = 0
    for uid, g in ns.groupby("user_id"):
        clicks = [
            (int(r.ts_ns), int(r.event_id))
            for r in g[g["event_type"] == "click"].itertuples()
        ]
        for r in g[g["event_type"] == "purchase"].itertuples():
            cand = [
                (t, e) for t, e in clicks
                if t <= r.ts_ns and t >= r.ts_ns - 3_600_000_000_000
            ]
            exp = max(cand) if cand else None  # (latest ts, then max id)
            gid, ggap = got[int(r.event_id)]
            if exp is None:
                assert gid is None and ggap is None, r.event_id
            else:
                n_attr += 1
                assert gid == exp[1], r.event_id
                assert abs(ggap - (r.ts_ns - exp[0]) / 1e9) < 1e-12
    assert n_attr > 0


def test_click_attribution_tiebreak_same_timestamp(spark):
    """Two clicks at the purchase's exact timestamp: the larger
    event_id wins; a click 1ns after the purchase never matches."""
    from dcafs_spark.queries import q_click_attribution

    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 00:00:00", 7, "purchase", 1.0, "{}"),
        (4, "2024-01-01 00:00:01", 7, "click", 1.0, "{}"),
        (5, "2024-01-01 02:00:00", 7, "purchase", 1.0, "{}"),
    ]
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {r.purchase_id: r.click_id for r in q_click_attribution(spark, d).collect()}
    assert got[3] == 2  # same-ts tie → larger click id
    assert got[5] is None  # click at 00:00:01 is > 1h before 02:00:00


def test_prefilter_semi_join_exact_and_broadcast(spark, sf_dir):
    from dcafs_spark.queries import _t, q_prefilter_semi_join

    plan = q_prefilter_semi_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the bucket prefilter broadcasts
    got = {r.l_returnflag: (r.n_items, r.revenue) for r in q_prefilter_semi_join(spark, sf_dir).collect()}
    li = _t(spark, sf_dir, "lineitem").toPandas()
    orders = _t(spark, sf_dir, "orders").toPandas()
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_orderkey"])
    sel = li[li["l_orderkey"].isin(urgent)]
    for flag, g in sel.groupby("l_returnflag"):
        exp_rev = round(float((g["l_extendedprice"] * (1 - g["l_discount"])).sum()), 2)
        assert got[flag][0] == len(g)
        assert abs(got[flag][1] - exp_rev) < 0.02


def test_train_pq_matches_numpy_lloyds(spark, sf_dir):
    """The fused PQ trainer (all m subspace Lloyd's runs in one corpus
    scan per iteration) equals a per-subspace numpy Lloyd's: same
    first-k-by-id init, argmin by (||c||² − 2·v·c) with first-min
    ties, mean update, empty cluster keeps its centroid."""
    import numpy as np
    from pyspark.sql import functions as F

    from dcafs_spark.operators.similarity import train_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    m, k, dim, iters = 8, 16, 64, 3
    dsub = dim // m
    got = train_pq(emb, m=m, k=k, dim=dim, iters=iters, id_col="vec_id", vec_col="v")

    rows = emb.collect()
    rows.sort(key=lambda r: r["vec_id"])
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        cents = sub[:k].copy()
        for _ in range(iters):
            cn2 = (cents**2).sum(axis=1)
            d = cn2[None, :] - 2.0 * sub @ cents.T
            assign = d.argmin(axis=1)  # numpy argmin = first minimal
            new = cents.copy()
            for j in range(k):
                sel = sub[assign == j]
                if len(sel):
                    new[j] = sel.mean(axis=0)
            if np.array_equal(new, cents):
                break
            cents = new
        assert np.allclose(np.array(got[s]), cents, atol=1e-9), f"subspace {s}"


def test_pq_recall_trained_matches_numpy(spark, sf_dir):
    """Third oracle for the TRAINED-codebook acceptance eval: take the
    Spark-trained books (exact python floats), replicate encode, ADC
    and all three rankings in numpy, and compare hit counts exactly.
    Also pins the acceptance ordering the gate exists to show:
    exact ≥ trained ≥ fixed recall@5."""
    import numpy as np
    from pyspark.sql import functions as F

    from dcafs_spark.operators.similarity import pq_codebooks_fixed, train_pq
    from dcafs_spark.queries import q_pq_recall_trained

    got = {
        r["method"]: (r["hits"], r["recall5"])
        for r in q_pq_recall_trained(spark, sf_dir).collect()
    }

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    m, kk, dsub = 8, 16, 8
    fixed = np.array(pq_codebooks_fixed(64, m, kk, seed=7))
    trained = np.array(
        train_pq(emb, m=m, k=kk, dim=64, iters=3, id_col="vec_id", vec_col="v")
    )

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    qmask = ids < 16
    qids = ids[qmask]
    Q = X[qmask].copy()
    for r, vid in enumerate(qids):
        for i in range(64):
            Q[r, i] += ((int(vid) * 31 + i * 17) % 13 - 6) / 40.0

    def encode(books):
        codes = np.zeros((len(X), m), dtype=int)
        for s in range(m):
            sub = X[:, s * dsub : (s + 1) * dsub]
            cn2 = (books[s] ** 2).sum(axis=1)
            d = np.round((cn2[None, :] - 2.0 * sub @ books[s].T) * 1e6)
            codes[:, s] = d.argmin(axis=1)
        return codes

    codes_f, codes_t = encode(fixed), encode(trained)
    hits = {"exact_l2": 0, "pq_adc_fixed": 0, "pq_adc_trained": 0}
    for r, qid in enumerate(qids):
        q = Q[r]
        ranked = {"exact_l2": np.round(((X - q) ** 2).sum(axis=1) * 1e6)}
        for name, books, codes in (
            ("pq_adc_fixed", fixed, codes_f),
            ("pq_adc_trained", trained, codes_t),
        ):
            adc = np.zeros(len(X))
            for s in range(m):
                qs = q[s * dsub : (s + 1) * dsub]
                adc += ((qs[None, :] - books[s][codes[:, s]]) ** 2).sum(axis=1)
            ranked[name] = np.round(adc * 1e6)
        for name, d in ranked.items():
            order = np.lexsort((ids, d))
            if int(qid) in set(ids[order[:5]].tolist()):
                hits[name] += 1
    for name, h in hits.items():
        assert got[name] == (h, h / 16.0), name
    assert got["exact_l2"][0] >= got["pq_adc_trained"][0] >= got["pq_adc_fixed"][0]


def test_pq_recall_matches_numpy(spark, sf_dir):
    """Third oracle for the PQ acceptance eval: replicate encode (argmin
    micro-quantized subspace distance, first-min tie), in-plan ADC and
    both rankings in numpy and compare the hit counts exactly."""
    import numpy as np

    from dcafs_spark.operators.similarity import pq_codebooks_fixed
    from dcafs_spark.queries import q_pq_recall

    got = {r["method"]: (r["hits"], r["recall5"]) for r in q_pq_recall(spark, sf_dir).collect()}

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    m, kk, dsub = 8, 16, 8
    books = np.array(pq_codebooks_fixed(64, m, kk, seed=7))  # (m, k, dsub)

    # queries: vec_id < 16 rotated by the exact-rational offset
    qmask = ids < 16
    qids = ids[qmask]
    Q = X[qmask].copy()
    for r, vid in enumerate(qids):
        for i in range(64):
            Q[r, i] += ((int(vid) * 31 + i * 17) % 13 - 6) / 40.0

    # encode: per subspace argmin of micro-quantized (||c||^2 - 2 v.c)
    codes = np.zeros((len(X), m), dtype=int)
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        cn2 = (books[s] ** 2).sum(axis=1)
        d = np.round((cn2[None, :] - 2.0 * sub @ books[s].T) * 1e6)
        codes[:, s] = d.argmin(axis=1)  # numpy argmin = first minimal

    hits_e = hits_a = 0
    for r, qid in enumerate(qids):
        q = Q[r]
        d_exact = np.round(((X - q) ** 2).sum(axis=1) * 1e6)
        adc = np.zeros(len(X))
        for s in range(m):
            qs = q[s * dsub : (s + 1) * dsub]
            adc += ((qs[None, :] - books[s][codes[:, s]]) ** 2).sum(axis=1)
        d_adc = np.round(adc * 1e6)
        for d, acc in ((d_exact, "e"), (d_adc, "a")):
            order = np.lexsort((ids, d))  # ties on vec_id
            top5 = set(ids[order[:5]].tolist())
            if int(qid) in top5:
                if acc == "e":
                    hits_e += 1
                else:
                    hits_a += 1
    assert got["exact_l2"] == (hits_e, hits_e / 16.0)
    assert got["pq_adc"] == (hits_a, hits_a / 16.0)
    assert hits_e >= hits_a  # quantization can only lose recall here
