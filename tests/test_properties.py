"""Property-based tests (hypothesis): Spark operators vs. brute-force
pure-Python reference implementations on randomized micro-data.  These
hunt the boundary cases fixed fixtures miss (equal timestamps, empty
sides, single-row groups)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from dbt_json_readr_spark.operators.asof import asof_join
from dbt_json_readr_spark.operators.sessionize import sessionize

BASE = dt.datetime(2024, 1, 1)

# timestamps on a coarse grid to force equal-ts collisions
ts_strategy = st.integers(min_value=0, max_value=40).map(
    lambda m: BASE + dt.timedelta(minutes=m)
)
key_strategy = st.integers(min_value=1, max_value=3)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _naive_asof(left, right):
    """For each left row: right row with max ts <= left.ts on same key,
    ties on ts broken by the LAST in (ts, px) sort order — matching the
    window's last() over right-rows-sorted semantics."""
    out = {}
    for k, lts, tag in left:
        cands = [(rts, px) for (rk, rts, px) in right if rk == k and rts <= lts]
        out[tag] = max(cands)[1] if cands else None
    return out


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(key_strategy, ts_strategy, st.uuids().map(str)),
        min_size=1, max_size=8,
    ),
    right=st.lists(
        st.tuples(key_strategy, ts_strategy, st.integers(0, 100).map(float)),
        max_size=8,
    ),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    # right must be unique per (key, ts) for determinism (operator contract)
    seen = set()
    right = [r for r in right if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    ldf = spark.createDataFrame(left, "k long, ts timestamp, tag string")
    rdf = spark.createDataFrame(
        right or [(99, BASE, 0.0)], "k long, ts timestamp, px double"
    )
    got = {r.tag: r.px_asof for r in asof_join(ldf, rdf, on="k").collect()}
    want = _naive_asof(left, right or [(99, BASE, 0.0)])
    assert got == want


def _naive_sessions(rows, gap_s=1800):
    """rows: (user, ts, event_id) → {event_id: session_id} with the
    batch operator's semantics (sorted by ts then event_id; gap > gap_s
    starts a new session)."""
    out = {}
    by_user: dict = {}
    for u, ts, eid in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                sid += 1
            out[eid] = sid
            prev = ts
    return out


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(key_strategy, ts_strategy, st.integers(0, 10**6)),
        min_size=1, max_size=12, unique_by=lambda r: r[2],
    )
)
def test_sessionize_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(u, ts, e, 1.0) for u, ts, e in rows],
        "user_id long, ts timestamp, event_id long, value double",
    )
    got = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert got == _naive_sessions(rows)
