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


def _naive_scd2(current, updates):
    """Pure-Python SCD2: current rows (k, v, eff, end, cur); updates
    (k, v, eff) pre-deduped per key."""
    upd = {k: (v, eff) for k, v, eff in updates}
    out = []
    live_keys = set()
    for k, v, eff, end, cur in current:
        live_keys.add(k)
        if cur and k in upd and upd[k][0] != v:
            out.append((k, v, eff, upd[k][1], False))
            out.append((k, upd[k][0], upd[k][1], None, True))
        else:
            out.append((k, v, eff, end, cur))
    for k, (v, eff) in upd.items():
        if k not in live_keys:
            out.append((k, v, eff, None, True))
    return sorted(out)


@settings(**SETTINGS)
@given(
    current=st.lists(
        st.tuples(key_strategy, st.sampled_from(["a", "b", "c"]), ts_strategy),
        max_size=3, unique_by=lambda r: r[0],
    ),
    updates=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.sampled_from(["a", "b", "z"]),
        ),
        max_size=3, unique_by=lambda r: r[0],
    ),
)
def test_scd2_matches_bruteforce(spark, current, updates):
    from dbt_json_readr_spark.operators.scd2 import scd2_apply

    upd_ts = BASE + dt.timedelta(hours=1)
    cur_rows = [(k, v, eff, None, True) for k, v, eff in current]
    upd_rows = [(k, v, upd_ts) for k, v in updates]
    cur_df = spark.createDataFrame(
        cur_rows or [(99, "x", BASE, None, True)],
        "k long, v string, effective_from timestamp, effective_to timestamp, is_current boolean",
    )
    upd_df = spark.createDataFrame(
        upd_rows or [(98, "x", upd_ts)], "k long, v string, effective_from timestamp"
    )
    got = sorted(
        (r.k, r.v, r.effective_from, r.effective_to, r.is_current)
        for r in scd2_apply(cur_df, upd_df, key="k", tracked=["v"]).collect()
    )
    want = _naive_scd2(
        cur_rows or [(99, "x", BASE, None, True)],
        upd_rows or [(98, "x", upd_ts)],
    )
    assert got == want
