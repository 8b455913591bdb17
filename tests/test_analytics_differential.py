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
