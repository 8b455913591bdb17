"""Oracle-side timestamp-unit portability.

The driver's DuckDB may read the events parquet at full ns resolution
(TIMESTAMP_NS, newer readers) while Spark 4.1 and DuckDB 1.0 land on
µs-TRUNCATED values — the exact divergence that kept `sessionize` /
`range_join` hash-red in rounds 2-4 (rows+schema green, values off at
the 30-min gap boundary). The fix: oracle SQL touches `ts` ONLY through
`(epoch_ns(ts) // 1000)` — exact bigint truncation under any read unit.

DuckDB 1.0 (sandbox) cannot hold sub-µs timestamps, so the ns-reader is
simulated faithfully at the integer level: a connection where `ts` is
the raw BIGINT ns value and `epoch_ns` is a shadow macro returning it
verbatim (legal because the lint below proves the SQLs never use `ts`
any other way). The µs-reader connection carries a real TIMESTAMP
truncated to µs with the built-in `epoch_ns`. Identical results across
the two connections == identical results across driver DuckDB versions.

The synthetic events stress both failure modes:
  * sub-µs ties whose event_id order CONTRADICTS the ns order (window
    tiebreaks), and
  * session gaps of exactly 30 min + a few hundred ns (truncate-vs-
    round on the strict `> 1800000000` flag).
"""

from __future__ import annotations

import re

import duckdb
import pyarrow as pa
import pytest

from dcafs_spark import queries as Q

US = 1_000  # ns per µs
GAP = 1_800_000_000 * US  # 30 min in ns


def _events_ns() -> list[tuple[int, int, int, str, float]]:
    """(event_id, ts_ns, user_id, event_type, value) rows."""
    rows = []
    eid = 1
    base = 1_704_067_200_000_000_000  # 2024-01-01 UTC in ns
    for user in range(1, 6):
        t = base + user * 17 * US
        # sub-µs tie: same truncated µs, ns order is eid DESCENDING so a
        # ns-resolution ORDER BY ts disagrees with (µs, event_id)
        rows.append((eid, t + 900, user, "click", 99.5 + user))
        eid += 1
        rows.append((eid, t + 100, user, "purchase", 150.0 + user))
        eid += 1
        # gap exactly 30 min → NOT a new session (strict >)
        t += GAP
        rows.append((eid, t + 100, user, "click", 101.0))
        eid += 1
        # gap 30 min + 400 ns: truncated µs gap == 1800000000 (no new
        # session); a ns-resolution or rounded-µs gap exceeds it (flip!)
        t += GAP + 400
        rows.append((eid, t, user, "click", 95.0))
        eid += 1
        # gap 30 min + 999 ns — boundary approached from above
        t += GAP + 999
        rows.append((eid, t, user, "error", 120.0))
        eid += 1
        # unambiguous new session: gap 30 min + 5 µs
        t += GAP + 5 * US
        rows.append((eid, t + 300, user, "purchase", 88.0))
        eid += 1
        # another sub-µs tie inside the session, threshold-crossing values
        rows.append((eid, t + 300 + 250, user, "click", 101.5))
        eid += 1
    return rows


def _connect(shape: str) -> duckdb.DuckDBPyConnection:
    rows = _events_ns()
    ids = pa.array([r[0] for r in rows], pa.int64())
    users = pa.array([r[2] for r in rows], pa.int64())
    types = pa.array([r[3] for r in rows], pa.string())
    vals = pa.array([r[4] for r in rows], pa.float64())
    names = ["event_id", "ts", "user_id", "event_type", "value"]
    con = duckdb.connect()
    if shape == "ns":
        ts = pa.array([r[1] for r in rows], pa.int64())  # raw ns bigint
        # exact-ns reader sim: epoch_ns(ts) yields the full ns value
        con.register("events", pa.table([ids, ts, users, types, vals], names=names))
        con.execute("CREATE MACRO epoch_ns(t) AS t")
    else:
        ts = pa.array([r[1] // US for r in rows], pa.int64()).cast(pa.timestamp("us"))
        con.register("events", pa.table([ids, ts, users, types, vals], names=names))
    return con


@pytest.fixture(scope="module")
def cons():
    return _connect("ns"), _connect("us")


ORACLES = {
    "sessionize": Q.SQL_SESSIONIZE,
    "sessionize_native": Q.SQL_SESSIONIZE_NATIVE,
    "range_join": Q._sql_range_join(),
    "current_values": Q.SQL_CURRENT_VALUES,
    "history_window": Q.SQL_HISTORY,
    "threshold_crossings": Q.SQL_CROSSINGS,
    "asof_join": Q.SQL_ASOF,
    "asof_tolerance": Q.SQL_ASOF_TOL,
    "buffer_tail": Q.SQL_BUFFER_TAIL,
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_unit_invariant(cons, name):
    con_ns, con_us = cons
    sql = ORACLES[name]
    ns_rows = sorted(map(tuple, con_ns.execute(sql).fetchall()))
    us_rows = sorted(map(tuple, con_us.execute(sql).fetchall()))
    assert ns_rows == us_rows, f"{name}: ns-read vs µs-read oracle diverged"


def test_lint_no_raw_ts_in_window_logic():
    """The macro simulation above is sound only if oracle SQL never
    touches `ts` except via epoch_ns(ts) (or coarse strftime/date_trunc
    formatting, which truncates identically in both engines). Lint every
    registered oracle for the two historical failure shapes."""
    for name, (_fn, sql) in Q.QUERIES.items():
        if sql is None:
            continue
        assert "epoch_us(" not in sql, f"{name}: epoch_us() is not unit-proof"
        assert not re.search(r"(ORDER BY|lag\(|lead\()\s*(\w+\.)?ts\b", sql), (
            f"{name}: raw ns-resolution ts in window logic"
        )


def test_fixture_really_stresses_the_boundary():
    """Guard the fixture: it must contain gaps that flip the 30-min
    strict-> at ns resolution but not at truncated µs (else the
    invariance tests are vacuous)."""
    rows = sorted(_events_ns(), key=lambda r: (r[2], r[1]))
    flips = 0
    for a, b in zip(rows, rows[1:]):
        if a[2] != b[2]:
            continue
        ns_gap = b[1] - a[1]
        us_gap = b[1] // US - a[1] // US
        if (ns_gap > GAP) != (us_gap > GAP // US):
            flips += 1
    assert flips >= 5
