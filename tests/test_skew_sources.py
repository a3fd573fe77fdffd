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
