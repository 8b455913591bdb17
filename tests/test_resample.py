"""Differential tests for the resample gates against numpy — an
independent second oracle (the DuckDB gate shares SQL semantics with
Spark; np.interp / searchsorted share nothing)."""

from __future__ import annotations

import numpy as np

HOUR = 3_600_000_000


def _obs_by_user(spark, sf_dir):
    from dcafs_spark.queries import _events

    ev = (
        _events(spark, sf_dir)
        .selectExpr("user_id", "ts_ns DIV 1000 AS ts_us", "event_id", "value")
        .toPandas()
    )
    # collapse (user, µs) ties to the max-event_id row, like the operator
    ev = (
        ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        .groupby(["user_id", "ts_us"], as_index=False)
        .last()
    )
    return ev.groupby("user_id")


def _grid(ts):
    h0, h1 = ts.min() // HOUR, ts.max() // HOUR
    if h1 <= h0:
        return None
    hours = np.arange(h0 + 1, h1 + 1, dtype=np.int64)
    return hours, hours * HOUR


def test_resample_interp_matches_numpy(spark, sf_dir):
    from dcafs_spark.queries import q_resample_interp

    got = q_resample_interp(spark, sf_dir).toPandas()
    want = {}
    for uid, g in _obs_by_user(spark, sf_dir):
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        vs = g["value"].to_numpy()
        gr = _grid(ts)
        if gr is None:
            continue
        hours, grid = gr
        for h, v in zip(hours, np.interp(grid, ts, vs)):
            want[(uid, int(h))] = v
    assert len(got) == len(want) > 0
    for r in got.itertuples():
        assert abs(r.value - want[(r.user_id, r.hour)]) < 1e-6, (r.user_id, r.hour)


def test_resample_gapfill_matches_numpy(spark, sf_dir):
    from dcafs_spark.queries import q_resample_gapfill

    got = q_resample_gapfill(spark, sf_dir).toPandas()
    want = {}
    for uid, g in _obs_by_user(spark, sf_dir):
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        vs = g["value"].to_numpy()
        gr = _grid(ts)
        if gr is None:
            continue
        hours, grid = gr
        idx = np.searchsorted(ts, grid, side="right") - 1
        for h, v in zip(hours, vs[idx]):
            want[(uid, int(h))] = v
    assert len(got) == len(want) > 0
    for r in got.itertuples():
        assert abs(r.value - want[(r.user_id, r.hour)]) < 1e-6, (r.user_id, r.hour)
