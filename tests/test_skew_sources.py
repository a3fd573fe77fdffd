"""Tests for the skew helpers and paged-source adapter."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from distribution_engine_smt_spark.sources import paged_source, staked_accounts


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 5).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    got = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"s": ("v", "sum"), "n": ("*", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
        ).collect()
    }
    exp = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == exp


def test_salted_broadcast_left_matches_plain(spark):
    fact = spark.range(5_000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(0, "a"), (1, "b")], "k long, name string")
    salted = salted_broadcast_left(fact, dim, ["k"], buckets=4)
    plain = fact.join(dim, "k", "left")
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_paged_source_stops_on_short_page(spark):
    calls = []

    def fetch(limit, offset):
        calls.append((limit, offset))
        return [
            {"account": f"u{i}", "symbol": "TKN", "stake": float(i % 7)}
            for i in range(offset, min(offset + limit, 250))
        ]

    df = paged_source(
        spark, fetch, "account string, symbol string, stake double", page_size=100
    )
    assert df.count() == 250
    # three pages: two full, one short (50) which ends the scan
    assert calls == [(100, 0), (100, 100), (100, 200)]


def test_staked_accounts_filters_zero_stake(spark):
    def fetch(limit, offset):
        if offset:
            return []
        return [
            {"account": f"u{i}", "symbol": "TKN", "stake": float(i % 7)}
            for i in range(200)
        ]

    rows = staked_accounts(spark, fetch).collect()
    assert len(rows) == 200 - len([i for i in range(200) if i % 7 == 0])


def test_paged_source_empty(spark):
    df = paged_source(spark, lambda l, o: [], "account string, symbol string, stake double")
    assert df.isEmpty()


# ---------------------------------------------------------------------------
# hot_key_aggregate: the conf-gated salting the ingestion folds route through
# ---------------------------------------------------------------------------
def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_hot_key_aggregate_salts_by_default_and_obeys_conf(spark):
    from distribution_engine_smt_spark.operators.skew import (
        SALT_BUCKETS_CONF,
        hot_key_aggregate,
    )

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("double").alias("v")
    )
    aggs = {"s": ("v", "sum"), "n": ("*", "count")}

    salted = hot_key_aggregate(df, ["k"], aggs)
    assert "__salt" in _plan(salted)  # two-phase: partial on (k, __salt)

    spark.conf.set(SALT_BUCKETS_CONF, "1")
    try:
        plain = hot_key_aggregate(df, ["k"], aggs)
        assert "__salt" not in _plan(plain)
    finally:
        spark.conf.unset(SALT_BUCKETS_CONF)

    # identical results either way
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_hot_key_aggregate_supports_column_expressions(spark):
    from distribution_engine_smt_spark.operators.skew import hot_key_aggregate

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("a", "x", 4.0), ("b", "x", 8.0)],
        "k string, tag string, v double",
    )
    got = {
        r["k"]: (r["x_sum"], r["mx"])
        for r in hot_key_aggregate(
            df,
            ["k"],
            {
                "x_sum": (F.when(F.col("tag") == "x", F.col("v")), "sum"),
                "mx": ("v", "max"),
            },
        ).collect()
    }
    assert got == {"a": (5.0, 4.0), "b": (8.0, 8.0)}


def test_hot_key_aggregate_property_matches_plain(spark):
    """Property: for arbitrary skewed inputs, the salted two-phase fold is
    value-identical to a plain groupBy across all four decomposable
    aggregate kinds (hypothesis drives the distributions)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from distribution_engine_smt_spark.operators.skew import hot_key_aggregate

    rows_st = st.lists(
        st.tuples(
            st.sampled_from(["hot", "hot", "hot", "warm", "cold"]),  # skewed keys
            st.integers(-1000, 1000),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(rows=rows_st)
    def run(rows):
        df = spark.createDataFrame(rows, "k string, v int")
        aggs = {
            "s": ("v", "sum"), "n": ("*", "count"),
            "mn": ("v", "min"), "mx": ("v", "max"),
        }
        got = {r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
               for r in hot_key_aggregate(df, ["k"], aggs, buckets=4).collect()}
        from pyspark.sql import functions as F

        exp = {r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
               for r in df.groupBy("k").agg(
                   F.sum("v").alias("s"), F.count("*").alias("n"),
                   F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
        assert got == exp

    run()


def test_fetched_follows_feeds_refresh(spark):
    """S9 end-to-end: a per-account fetch callable -> authoritative snapshot
    -> refresh_follows reconciliation (adds, soft-removes, keeps mutes)."""
    from distribution_engine_smt_spark.processors.l1 import refresh_follows
    from distribution_engine_smt_spark.sources import fetched_follows

    calls = []

    def fetch(acct):
        calls.append(acct)
        return {"u": ["keep", "new"], "v": []}[acct]

    snapshot = fetched_follows(spark, fetch, ["u", "v"])
    assert calls == ["u", "v"]

    follows = spark.createDataFrame(
        [("u", "keep", 1), ("u", "stale", 1), ("u", "muted", 2)],
        "follower string, following string, state short",
    )
    got = {
        (r["follower"], r["following"]): r["state"]
        for r in refresh_follows(follows, snapshot).collect()
    }
    assert got[("u", "keep")] == 1
    assert got[("u", "new")] == 1
    assert got[("u", "stale")] == 0   # soft-removed
    assert got[("u", "muted")] == 2   # mutes survive


def test_fetched_follows_empty(spark):
    from distribution_engine_smt_spark.sources import fetched_follows

    assert fetched_follows(spark, lambda a: [], ["u"]).isEmpty()
