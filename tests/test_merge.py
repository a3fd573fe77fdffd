"""Tests for the upsert/merge primitive — the engine's foundation
(SURVEY.md §7 Phase 1: idempotency, last-writer-wins, composite keys,
additive counters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark.operators import (
    additive_merge,
    delete_by_keys,
    delete_by_predicate,
    merge_upsert,
)


def _posts(spark, rows):
    return spark.createDataFrame(rows, "authorperm string, token string, title string, children int, seq long")


def test_upsert_insert_and_update(spark):
    target = _posts(spark, [("@a/p1", "T", "old", 0, 1), ("@b/p2", "T", "keep", 1, 1)])
    delta = _posts(spark, [("@a/p1", "T", "new", 5, 2), ("@c/p3", "T", "ins", 0, 2)])
    out = merge_upsert(target, delta, ["authorperm", "token"], seq_col="seq")
    got = {r["authorperm"]: r for r in out.collect()}
    assert len(got) == 3
    assert got["@a/p1"]["title"] == "new"
    assert got["@b/p2"]["title"] == "keep"
    assert got["@c/p3"]["title"] == "ins"


def test_upsert_last_writer_wins_within_delta(spark):
    target = _posts(spark, [])
    delta = _posts(spark, [("@a/p1", "T", "v1", 0, 1), ("@a/p1", "T", "v2", 0, 2)])
    out = merge_upsert(target, delta, ["authorperm", "token"], seq_col="seq")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["title"] == "v2"


def test_upsert_idempotent_replay(spark):
    target = _posts(spark, [("@a/p1", "T", "v1", 0, 1)])
    delta = _posts(spark, [("@a/p1", "T", "v2", 3, 2)])
    once = merge_upsert(target, delta, ["authorperm", "token"], seq_col="seq")
    twice = merge_upsert(once, delta, ["authorperm", "token"], seq_col="seq")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_upsert_composite_key_distinguishes_tokens(spark):
    target = _posts(spark, [("@a/p1", "T1", "t1", 0, 1), ("@a/p1", "T2", "t2", 0, 1)])
    delta = _posts(spark, [("@a/p1", "T1", "t1-new", 0, 2)])
    out = merge_upsert(target, delta, ["authorperm", "token"], seq_col="seq")
    got = {(r["authorperm"], r["token"]): r["title"] for r in out.collect()}
    assert got[("@a/p1", "T1")] == "t1-new"
    assert got[("@a/p1", "T2")] == "t2"


def test_upsert_delta_beats_target_without_seq(spark):
    target = _posts(spark, [("@a/p1", "T", "old", 0, 0)])
    delta = _posts(spark, [("@a/p1", "T", "new", 0, 0)])
    out = merge_upsert(target, delta, ["authorperm", "token"])
    assert out.collect()[0]["title"] == "new"


def test_upsert_partial_update_carries_columns(spark):
    # mirrors vote upserts touching only some columns (vote_storage.py:21-24)
    target = _posts(spark, [("@a/p1", "T", "title-keep", 7, 1)])
    delta = spark.createDataFrame(
        [("@a/p1", "T", 99, 2)], "authorperm string, token string, children int, seq long"
    )
    out = merge_upsert(
        target, delta, ["authorperm", "token"], seq_col="seq", update_cols=["children"]
    )
    row = out.collect()[0]
    assert row["children"] == 99
    assert row["title"] == "title-keep"


def test_additive_merge_counters(spark):
    target = spark.createDataFrame(
        [("@a/p1", 2, "x"), ("@b/p2", 5, "y")], "authorperm string, children int, title string"
    )
    delta = spark.createDataFrame(
        [("@a/p1", 3), ("@c/p3", 1)], "authorperm string, children int"
    )
    out = additive_merge(target, delta, ["authorperm"], add_cols=["children"])
    got = {r["authorperm"]: r for r in out.collect()}
    assert got["@a/p1"]["children"] == 5
    assert got["@a/p1"]["title"] == "x"
    assert got["@b/p2"]["children"] == 5
    assert got["@c/p3"]["children"] == 1 and got["@c/p3"]["title"] is None


def test_additive_merge_set_cols(spark):
    target = spark.createDataFrame(
        [("@a/p1", 10.0, 1.0)], "authorperm string, vote_rshares double, score_trend double"
    )
    delta = spark.createDataFrame(
        [("@a/p1", -4.0, 2.5)], "authorperm string, vote_rshares double, score_trend double"
    )
    out = additive_merge(
        target, delta, ["authorperm"], add_cols=["vote_rshares"], set_cols=["score_trend"]
    )
    row = out.collect()[0]
    assert row["vote_rshares"] == 6.0
    assert row["score_trend"] == 2.5


def test_delete_by_keys(spark):
    target = _posts(spark, [("@a/p1", "T1", "x", 0, 1), ("@a/p1", "T2", "x", 0, 1), ("@b/p2", "T1", "y", 0, 1)])
    dels = spark.createDataFrame([("@a/p1",)], "authorperm string")
    out = delete_by_keys(target, dels, ["authorperm"])
    assert [r["authorperm"] for r in out.collect()] == ["@b/p2"]


def test_delete_by_predicate_retention(spark):
    target = _posts(spark, [("@a/p1", "T", "x", 0, 1), ("@b/p2", "T", "y", 0, 10)])
    out = delete_by_predicate(target, F.col("seq") < 5)
    assert [r["authorperm"] for r in out.collect()] == ["@b/p2"]
