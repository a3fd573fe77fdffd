"""Unit tests for the scalar library (SURVEY.md §2.8) with hand-computed
vectors, mirroring the reference math (engine/utils.py)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from distribution_engine_smt_spark.functions import (
    add_days,
    build_tags_csv,
    construct_authorperm,
    convergent_linear,
    convergent_square_root,
    extract_user,
    is_main_post,
    json_str_field,
    memo_to_authorperm,
    reblogged_by_first,
    resolve_author,
    resolve_permlink,
    score,
    tolerant_json_map,
    truncate,
)
from distribution_engine_smt_spark.functions.dmp import fold_body_edits


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_score_positive(spark):
    # _score(1000, t) = 3 + t/480000 (engine/utils.py:41-46)
    ts = datetime(2024, 1, 1)
    epoch = ts.timestamp()
    df = spark.createDataFrame([(1000.0, ts)], "rshares double, created timestamp")
    got = df.select(score(F.col("rshares"), F.col("created"), 480000).alias("s")).collect()[0]["s"]
    assert got == pytest.approx(3.0 + epoch / 480000, rel=1e-12)


def test_score_negative_and_small(spark):
    ts = datetime(2024, 1, 1)
    epoch = ts.timestamp()
    df = spark.createDataFrame(
        [(-100.0, ts), (0.5, ts), (0.0, ts)], "rshares double, created timestamp"
    )
    got = [r["s"] for r in df.select(score(F.col("rshares"), F.col("created"), 10000).alias("s")).collect()]
    assert got[0] == pytest.approx(-2.0 + epoch / 10000, rel=1e-12)
    # |rshares| < 1 -> log10(max(.,1)) == 0
    assert got[1] == pytest.approx(epoch / 10000, rel=1e-12)
    assert got[2] == pytest.approx(epoch / 10000, rel=1e-12)


def test_convergent_curves(spark):
    # convergent_linear(r,s) = ((r+s)^2 - s^2)/(r+4s) (engine/utils.py:33-34)
    r, s = 1000.0, 50.0
    exp_lin = math.floor(((r + s) ** 2 - s**2) / (r + 4 * s))
    exp_sqrt = math.floor(r / math.floor(math.sqrt(r + 2 * s)))
    df = spark.createDataFrame([(r, s)], "r double, s double")
    row = df.select(
        convergent_linear(F.col("r"), F.col("s")).alias("lin"),
        convergent_square_root(F.col("r"), F.col("s")).alias("sq"),
    ).collect()[0]
    assert row["lin"] == exp_lin
    assert row["sq"] == exp_sqrt


def test_authorperm_roundtrip(spark):
    df = spark.createDataFrame([("alice", "my-post")], "author string, permlink string")
    ap = df.select(construct_authorperm(F.col("author"), F.col("permlink")).alias("ap"))
    assert ap.collect()[0]["ap"] == "@alice/my-post"
    back = ap.select(
        resolve_author(F.col("ap")).alias("a"), resolve_permlink(F.col("ap")).alias("p")
    ).collect()[0]
    assert (back["a"], back["p"]) == ("alice", "my-post")
    # hive-crossposted prefix
    h = spark.createDataFrame([("h@bob/x-1",)], "ap string").select(
        resolve_author(F.col("ap")).alias("a")
    )
    assert h.collect()[0]["a"] == "bob"


def test_build_tags_csv_dedup_order(spark):
    df = spark.createDataFrame(
        [("cat", ["x", "cat", "y", "", "x"])],
        "category string, mtags array<string>",
    )
    got = df.select(build_tags_csv(F.col("category"), F.col("mtags")).alias("t")).collect()[0]["t"]
    assert got == "cat,x,y"


def test_truncate_and_main_post(spark):
    df = spark.createDataFrame([("abcdef", "", "p")], "s string, pa string, pp string")
    row = df.select(
        truncate(F.col("s"), 3).alias("t"),
        is_main_post(F.col("pa"), F.col("pp")).alias("m"),
    ).collect()[0]
    assert row["t"] == "abc" and row["m"] is True


def test_tolerant_json_double_decode(spark):
    plain = '{"a": "1"}'
    double = '"{\\"a\\": \\"2\\"}"'
    bad = "{nope"
    df = spark.createDataFrame([(plain,), (double,), (bad,)], "j string")
    got = [r["m"] for r in df.select(tolerant_json_map(F.col("j")).alias("m")).collect()]
    assert got[0] == {"a": "1"}
    assert got[1] == {"a": "2"}
    assert got[2] is None
    vals = [r["v"] for r in df.select(json_str_field(F.col("j"), "a").alias("v")).collect()]
    assert vals == ["1", "2", None]


def test_extract_user(spark):
    df = spark.createDataFrame(
        [(["p1"], ["a1"]), ([], ["a2"]), (None, ["a3"])],
        "posting array<string>, active array<string>",
    )
    got = [r["u"] for r in df.select(extract_user(F.col("posting"), F.col("active")).alias("u")).collect()]
    assert got == ["p1", "a2", "a3"]


def test_memo_to_authorperm(spark):
    df = spark.createDataFrame(
        [('"promote @alice/my-post"',), ("h@bob/other",), ("no match here",)], "m string"
    )
    got = [r["ap"] for r in df.select(memo_to_authorperm(F.col("m")).alias("ap")).collect()]
    assert got == ["@alice/my-post", "h@bob/other", ""]


def test_reblogged_by_first(spark):
    df = spark.createDataFrame([("u1,u2,u3",)], "csv string")
    assert df.select(reblogged_by_first(F.col("csv")).alias("r")).collect()[0]["r"] == ["u1"]


def test_add_days_preserves_time(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 12, 34, 56), 7)], "ts timestamp, d int"
    )
    got = df.select(add_days(F.col("ts"), F.col("d")).alias("o")).collect()[0]["o"]
    assert got == datetime(2024, 1, 8, 12, 34, 56)


def test_fold_body_edits_ordered_replacement(spark):
    edits = spark.createDataFrame(
        [
            ("@a/p", 10, 0, "first body"),
            ("@a/p", 11, 0, "second body"),
            ("@a/p", 12, 1, "final body"),
            ("@b/q", 10, 0, "only body"),
        ],
        "authorperm string, block_num long, op_seq int, body string",
    )
    got = {r["authorperm"]: r["body"] for r in fold_body_edits(edits).collect()}
    assert got == {"@a/p": "final body", "@b/q": "only body"}
