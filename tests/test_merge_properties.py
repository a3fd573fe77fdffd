"""Property-based tests (hypothesis) for the upsert primitive — the engine
foundation must hold under arbitrary interleavings, not just the unit
vectors: last-writer-wins respects seq regardless of row order, replay is
idempotent, and disjoint deltas commute."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distribution_engine_smt_spark.operators import merge_upsert

KEYS = ["k1", "k2"]
_key = st.tuples(st.sampled_from(["a", "b", "c"]), st.sampled_from(["X", "Y"]))
_row = st.tuples(_key, st.integers(0, 50), st.integers(1, 1_000_000))  # (key, value, seq)
_rows = st.lists(_row, min_size=0, max_size=12)

_SCHEMA = "k1 string, k2 string, v int, seq long"


def _df(spark, rows):
    return spark.createDataFrame(
        [(k[0], k[1], v, s) for (k, v, s) in rows], _SCHEMA
    )


def _expected(target_rows, delta_rows):
    """Reference model: highest (seq, source) wins per key — a target row
    that carries its own seq is honored (causality preserved across
    merges); delta beats target on seq ties."""
    state = {}
    for (k, v, s) in target_rows:
        state[k] = (v, (s, 0))
    for (k, v, s) in delta_rows:
        if k not in state or (s, 1) >= state[k][1]:
            state[k] = (v, (s, 1))
    return {k: v for k, (v, _) in state.items()}


def _dedupe_target(rows):
    """State tables are keyed: one row per key (keep last occurrence)."""
    seen = {}
    for r in rows:
        seen[r[0]] = r
    return list(seen.values())


def _dedupe_delta(rows):
    """Equal (key, seq) delta rows are order-ambiguous by contract (the
    processors always derive distinct seqs); keep one per (key, seq)."""
    seen = {}
    for r in rows:
        seen[(r[0], r[2])] = r
    return list(seen.values())


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=_rows, delta=_rows)
def test_lww_matches_sequential_model(spark, target, delta):
    target = _dedupe_target(target)
    delta = _dedupe_delta(delta)
    out = merge_upsert(_df(spark, target), _df(spark, delta), KEYS, seq_col="seq")
    got = {(r["k1"], r["k2"]): r["v"] for r in out.collect()}
    assert got == _expected(target, delta)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=_rows, delta=_rows)
def test_replay_idempotent(spark, target, delta):
    target = _dedupe_target(target)
    once = merge_upsert(_df(spark, target), _df(spark, delta), KEYS, seq_col="seq")
    twice = merge_upsert(once, _df(spark, delta), KEYS, seq_col="seq")
    a = sorted((r["k1"], r["k2"], r["v"]) for r in once.collect())
    b = sorted((r["k1"], r["k2"], r["v"]) for r in twice.collect())
    assert a == b


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=_rows, delta=_rows)
def test_disjoint_deltas_commute(spark, target, delta):
    target = _dedupe_target(target)
    left = [r for r in delta if r[0][0] in ("a", "b")]
    right = [r for r in delta if r[0][0] == "c"]
    t = _df(spark, target)
    ab = merge_upsert(
        merge_upsert(t, _df(spark, left), KEYS, seq_col="seq"),
        _df(spark, right), KEYS, seq_col="seq",
    )
    ba = merge_upsert(
        merge_upsert(t, _df(spark, right), KEYS, seq_col="seq"),
        _df(spark, left), KEYS, seq_col="seq",
    )
    assert sorted(map(tuple, ab.collect())) == sorted(map(tuple, ba.collect()))
