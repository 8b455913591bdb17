"""Waypoints: geofence circles with ENTER/LEAVE event detection.

Parity target: reference `src/util/gis/Waypoint.java:21-30,71-105` —
a waypoint is a (lat, lon, radius) circle; a position stream drives a
state machine INSIDE/OUTSIDE whose transitions emit ENTER/LEAVE (and
trigger travel commands, `Waypoints.java:285-316`). Distance/bearing
helpers in `src/util/gis/GisTools.java:117-213`.

Spark-first: batch/replay flavor is a pure plan — haversine distance
expression + a lag window per (track, waypoint) to find transitions.
No state machine code at all: the "state" IS the previous row's
inside-flag, which is exactly `lag()`. Scale: one window sort per
track partition; tracks are independent → embarrassingly parallel.

The streaming flavor keeps per-track state across micro-batches with
the same transition rule applied in `applyInPandas` per key — state =
last inside-flag per (track, waypoint), carried via a driver-side dict
in foreachBatch (track cardinality = fleet size, tiny) or
applyInPandasWithState for unbounded track counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dcafs_spark.functions.geo import haversine_km


@dataclass
class Waypoint:
    id: str
    lat: float
    lon: float
    radius_km: float


def waypoint_events(
    df: DataFrame,
    waypoints: list[Waypoint],
    lat: str = "lat",
    lon: str = "lon",
    track: str = "track_id",
    ts: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Position stream × waypoints → rows with distance, inside-flag,
    and event ∈ {ENTER, LEAVE, NULL}.

    The waypoint list is a literal inline table (broadcast by
    construction — it's bounded config, like the reference's XML set),
    cross-joined narrowly: #rows × #waypoints stays a map-side op.
    """
    spark = df.sparkSession
    wps = spark.createDataFrame(
        [(w.id, w.lat, w.lon, w.radius_km) for w in waypoints],
        "wp_id string, wp_lat double, wp_lon double, wp_radius_km double",
    )
    joined = df.crossJoin(F.broadcast(wps))
    dist = haversine_km(F.col(lat), F.col(lon), F.col("wp_lat"), F.col("wp_lon"))
    joined = joined.withColumn("dist_km", dist).withColumn(
        "inside", F.col("dist_km") <= F.col("wp_radius_km")
    )
    # A colliding-ts fix pair would make lag() partition-order-dependent
    # without a total order — callers with an id column should pass it.
    order_cols = [ts] if order_tiebreak is None else [ts, order_tiebreak]
    w = Window.partitionBy(track, "wp_id").orderBy(*order_cols)
    prev = F.lag("inside").over(w)
    # First fix per key has prev=NULL → no event: the reference's UNKNOWN
    # state transitions silently to INSIDE/OUTSIDE (Waypoint.java:92-96);
    # a track already inside at its first fix must NOT emit ENTER.
    event = (
        F.when(prev.isNotNull() & F.col("inside") & ~prev, F.lit("ENTER"))
        .when(prev.isNotNull() & ~F.col("inside") & prev, F.lit("LEAVE"))
        .otherwise(F.lit(None).cast("string"))
    )
    return joined.withColumn("event", event)


def nearest_waypoint(
    df: DataFrame,
    waypoints: list[Waypoint],
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Nearest waypoint + distance per position (`wpts:nearest`).

    Map-only argmin: the bounded waypoint set rides as a literal
    struct array and `array_min` picks (dist, wp_id) per row — zero
    shuffle, and unlike the previous crossJoin + groupBy-on-all-columns
    form it PRESERVES input cardinality (exact-duplicate fixes stay
    distinct rows) and tolerates non-groupable column types (maps)."""
    # an empty set would build a zero-element F.array() whose null-typed
    # array_min fails at ANALYSIS time (the old crossJoin form degraded
    # to an empty result) — make the failure mode explicit instead
    if not waypoints:
        raise ValueError("nearest_waypoint requires at least one waypoint")
    cands = F.array(
        *[
            F.struct(
                haversine_km(F.col(lat), F.col(lon), F.lit(w.lat), F.lit(w.lon)).alias(
                    "dist_km"
                ),
                F.lit(w.id).alias("wp_id"),
            )
            for w in waypoints
        ]
    )
    best = F.array_min(cands)
    return df.select(
        *df.columns,
        best.getField("wp_id").alias("nearest_wp"),
        best.getField("dist_km").alias("nearest_dist_km"),
    )


def stateful_geofence_stream(stream_df, waypoints: list[Waypoint], lat="lat", lon="lon", track="track_id", ts="ts"):
    """Streaming geofence with per-track state in the Spark state
    store (applyInPandasWithState) — the unbounded-fleet variant of
    StreamingGeofence (whose driver dict suits bounded fleets).

    State per track: last inside-flag per waypoint. Emits only
    ENTER/LEAVE transition rows. Distance math runs vectorized in
    numpy per Arrow batch; the state store only holds one byte per
    (track, waypoint)."""
    import math as _math
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    wp_ids = [w.id for w in waypoints]
    wp_data = [(w.lat, w.lon, w.radius_km) for w in waypoints]

    state_schema = StructType([StructField("inside", ArrayType(BooleanType()))])
    out_schema = StructType(
        [
            StructField("track_id", StringType()),
            StructField("wp_id", StringType()),
            StructField("ts", DoubleType()),
            StructField("event", StringType()),
            StructField("dist_km", DoubleType()),
        ]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        inside = list(state.get[0]) if state.exists else [None] * len(wp_ids)
        rows: dict[str, list] = {c: [] for c in ("track_id", "wp_id", "ts", "event", "dist_km")}
        # a group larger than the Arrow batch size arrives as MULTIPLE
        # chunks in arbitrary order — sorting each chunk independently
        # would run the transition state machine out of time order
        # (spurious ENTER/LEAVE + a wrong carried flag). Concatenate,
        # then sort ONCE. Memory note: one micro-batch of one track's
        # fixes, the same bound the per-chunk form already had in
        # aggregate.
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        else:
            whole = None
        for pdf in [whole] if whole is not None else []:
            pdf = pdf.sort_values("ts")
            la = np.radians(pdf["lat"].to_numpy(dtype=float))
            lo = np.radians(pdf["lon"].to_numpy(dtype=float))
            tsv = pdf["ts"].to_numpy(dtype=float)
            for j, (wla, wlo, wr) in enumerate(wp_data):
                wla_r, wlo_r = _math.radians(wla), _math.radians(wlo)
                a = (
                    np.sin((wla_r - la) / 2) ** 2
                    + np.cos(la) * _math.cos(wla_r) * np.sin((wlo_r - lo) / 2) ** 2
                )
                dist = 2 * 6371.0088 * np.arcsin(np.sqrt(a))
                for i in range(len(dist)):
                    now_in = bool(dist[i] <= wr)
                    prev = inside[j]
                    if prev is not None and now_in != prev:
                        rows["track_id"].append(key[0])
                        rows["wp_id"].append(wp_ids[j])
                        rows["ts"].append(float(tsv[i]))
                        rows["event"].append("ENTER" if now_in else "LEAVE")
                        rows["dist_km"].append(float(dist[i]))
                    inside[j] = now_in
        state.update(([bool(x) if x is not None else None for x in inside],))
        yield pd.DataFrame(rows)

    keyed = stream_df.select(
        F.col(track).cast("string").alias("track_id"),
        F.col(lat).cast("double").alias("lat"),
        F.col(lon).cast("double").alias("lon"),
        F.col(ts).cast("double").alias("ts"),
    )
    return keyed.groupBy("track_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class StreamingGeofence:
    """Cross-batch ENTER/LEAVE: carries last inside-flag per
    (track, waypoint) between micro-batches (foreachBatch flavor).

    `max_transitions_per_batch` bounds the per-batch driver collect:
    transitions are "rare by nature" until a noisy GPS stream chatters
    across a fence boundary every other fix, at which point an
    unbounded collect is a driver OOM. The cap keeps the EARLIEST
    transitions of the batch (TakeOrdered by ts — still distributed)
    and counts the remainder in `overflow`, so a chattering sensor
    degrades to a diagnosable counter instead of a crash. `max_events`
    similarly bounds the accumulated event log (oldest dropped,
    counted in `evicted`)."""

    def __init__(
        self,
        waypoints: list[Waypoint],
        max_transitions_per_batch: int = 10_000,
        max_events: int = 1_000_000,
    ):
        self.waypoints = waypoints
        self.state: dict[tuple[str, str], bool] = {}
        self.events: list[tuple] = []
        self.max_transitions_per_batch = max_transitions_per_batch
        self.max_events = max_events
        self.overflow = 0  # transitions dropped by the per-batch cap
        self.evicted = 0  # oldest events trimmed from the log

    def process_batch(self, batch_df: DataFrame, batch_id: int = 0, **cols) -> None:
        """Only two sparse result sets reach the driver: (a) up to
        `max_transitions_per_batch` transition rows (event ≠ NULL),
        taken as the batch's earliest via a distributed TakeOrdered,
        and (b) ONE first/last boundary row per (track, waypoint) via
        min_by/max_by — never the full batch. Driver work is
        O(min(#transitions, cap) + #keys), independent of batch row
        count; the exact dropped count is paid for with one extra
        distributed count() only on the rare overflow path."""
        evd = waypoint_events(batch_df, self.waypoints, **cols)
        track = cols.get("track", "track_id")
        ts = cols.get("ts", "ts")
        sel = evd.select(
            F.col(track).alias("_track"),
            "wp_id",
            F.col(ts).alias("_ts"),
            "inside",
            "event",
            "dist_km",
        )
        cap = self.max_transitions_per_batch
        trans_df = sel.filter(F.col("event").isNotNull())
        trans = trans_df.orderBy("_ts", "_track", "wp_id").limit(cap + 1).collect()
        if len(trans) > cap:
            self.overflow += trans_df.count() - cap
            trans = trans[:cap]
        # ordering key includes (inside, dist_km), not _ts alone: two
        # fixes sharing the batch's min/max timestamp would otherwise
        # make the carried inside-flag (and hence next batch's boundary
        # event) depend on shuffle order
        okey = F.struct("_ts", "inside", "dist_km")
        bounds = (
            sel.groupBy("_track", "wp_id")
            .agg(
                F.min_by(F.struct("_ts", "inside", "dist_km"), okey).alias("first"),
                F.max_by(F.struct("_ts", "inside", "dist_km"), okey).alias("last"),
            )
            .collect()
        )
        new_events: list[tuple] = []
        for r in bounds:
            key = (r["_track"], r["wp_id"])
            carried = self.state.get(key)
            fi = r["first"]
            if carried is not None and bool(fi["inside"]) != carried:
                ev = "ENTER" if fi["inside"] else "LEAVE"
                new_events.append((key[0], key[1], fi["_ts"], ev, fi["dist_km"]))
            self.state[key] = bool(r["last"]["inside"])
        for r in trans:
            new_events.append((r["_track"], r["wp_id"], r["_ts"], r["event"], r["dist_km"]))
        new_events.sort(key=lambda e: e[2])
        self.events.extend(new_events)
        if len(self.events) > self.max_events:
            drop = len(self.events) - self.max_events
            self.evicted += drop
            del self.events[:drop]
