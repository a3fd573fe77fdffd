"""Construction-cost regression guard for the r12 one-parse collapse.

DataFrame-construction latency is almost entirely py4j round-trips
(~0.4 ms each); the r12 optimization rewrote the hot builders as SQL
text parsed once, taking e.g. dedup_simhash from ~14k round-trips per
cold construction to ~260. A regression here is invisible to every
result-correctness test (the plans are identical), so this suite counts
the round-trips directly and pins a generous ceiling per converted
query — an accidental return to per-Column construction (one
``F.lit``/``F.col`` per element of a 64-dim literal, say) blows through
the bound by an order of magnitude, while normal drift (a few extra
calls from a new filter or alias) stays well inside it."""

from __future__ import annotations

import pytest


# Converted query -> round-trip ceiling. Measured values sit at roughly
# half the bound; the pre-conversion values were 5-50x the bound.
BOUNDS = {
    "dedup_simhash": 900,
    "dedup_simhash_pairs": 1300,
    "dedup_embedding_lsh": 1300,
    "dedup_embedding_lsh_single_probe": 1100,
    "ann_pq_topk": 1800,
    # pq_train / ann_ivf_kmeans_topk run their LIVE Lloyd fits at the
    # test SF (no store built), whose bounded per-iteration collects are
    # construction-time driver work — ceilings sized for that path
    "pq_train": 2600,
    "bm25_search": 500,
    "rrf_hybrid_search": 1600,
    "hll_distinct": 800,
    "hll_daily_merge": 1000,
    "ann_ivf_kmeans_topk": 2600,
}


@pytest.fixture()
def py4j_counter(monkeypatch):
    import py4j.clientserver as cs

    count = [0]
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **k):
        count[0] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(cs.ClientServerConnection, "send_command", counted)
    return count


def test_converted_queries_stay_one_parse(spark, py4j_counter):
    from distribution_engine_smt_spark import driver_queries
    import distribution_engine_smt_spark.pipeline  # noqa: F401
    from distribution_engine_smt_spark.session import release_caches
    from tests.conftest import SF_DIR

    # warm the table cache so footer reads aren't billed to the first query
    driver_queries.QUERIES["discussions_by_created"](spark, SF_DIR)
    over = {}
    for name, bound in BOUNDS.items():
        release_caches(spark)
        py4j_counter[0] = 0
        driver_queries.QUERIES[name](spark, SF_DIR)
        # liveness (ADVICE r12 #3): a real construction always makes SOME
        # round-trips; a zero counter means the patched connection class
        # isn't the one in use (e.g. a non-pinned-thread GatewayConnection)
        # and every ceiling below would pass vacuously — fail loudly
        # instead of silently disarming the guard.
        assert py4j_counter[0] > 0, (
            f"{name}: py4j counter stayed 0 — the send_command patch "
            "missed the active connection class; the guard is disarmed"
        )
        if py4j_counter[0] > bound:
            over[name] = (py4j_counter[0], bound)
    assert not over, (
        "construction round-trips regressed past the one-parse bounds "
        f"(got, bound): {over}"
    )
