"""Property-based tests (hypothesis) for the temporal operators: the Spark
sessionization and as-of join must agree with straightforward pure-Python
references on arbitrary event sets — including the edge cases unit vectors
miss (equal timestamps, gap exactly at the threshold, users with a single
event, purchases before any click)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distribution_engine_smt_spark.pipeline.temporal import (
    SESSION_GAP_US,
    asof_attribution,
    sessionize_events,
)

BASE = datetime(2024, 1, 1)
GAP_S = SESSION_GAP_US // 1_000_000

# offsets in seconds, deliberately clustered around multiples of the gap so
# exact-threshold and ±1 cases are generated often
_offset = st.one_of(
    st.integers(0, 4 * GAP_S),
    st.sampled_from([0, GAP_S - 1, GAP_S, GAP_S + 1, 2 * GAP_S, 2 * GAP_S + 1]),
)
_event = st.tuples(
    st.integers(1, 3),                        # user_id
    _offset,                                  # ts offset (seconds)
    st.sampled_from(["click", "purchase"]),   # event_type
)
_events = st.lists(_event, min_size=0, max_size=14)

_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + timedelta(seconds=off), user, typ)
            for i, (user, off, typ) in enumerate(rows)
        ],
        _SCHEMA,
    )


def _expected_sessions(rows):
    """Reference: sort each user's events by (ts, event_id); a session
    breaks when the gap to the previous event exceeds the threshold."""
    by_user: dict[int, list] = {}
    for i, (user, off, _typ) in enumerate(rows):
        by_user.setdefault(user, []).append((off, i))
    out = {}
    for user, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        sessions: dict[int, list] = {}
        for off, _i in evs:
            if prev is None or (off - prev) * 1_000_000 > SESSION_GAP_US:
                sid += 1
            sessions.setdefault(sid, []).append(off)
            prev = off
        for sid_, offs in sessions.items():
            out[(user, sid_)] = (
                len(offs),
                BASE + timedelta(seconds=min(offs)),
                BASE + timedelta(seconds=max(offs)),
            )
    return out


def _expected_asof(rows):
    """Reference: each purchase pairs with the max click ts <= its ts for
    the same user (None when no such click)."""
    out = {}
    for i, (user, off, typ) in enumerate(rows):
        if typ != "purchase":
            continue
        clicks = [
            o for (u, o, t) in rows if u == user and t == "click" and o <= off
        ]
        out[i] = BASE + timedelta(seconds=max(clicks)) if clicks else None
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events)
def test_sessionize_matches_reference(spark, rows):
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_ts"], r["end_ts"])
        for r in sessionize_events(_df(spark, rows)).collect()
    }
    assert got == _expected_sessions(rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_events)
def test_asof_matches_reference(spark, rows):
    got = {
        r["event_id"]: r["last_click_ts"]
        for r in asof_attribution(_df(spark, rows)).collect()
    }
    assert got == _expected_asof(rows)
