"""Physical-layout maintenance: small-file compaction and range-sorted
data skipping, proven from the parquet files themselves."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distribution_engine_smt_spark.operators import storage


@pytest.fixture()
def many_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.md5(F.col("id").cast("string").cast("binary")).alias("pad")
    )
    # 40 tiny files: the post-many-micro-batches state of a merge target
    df.repartition(40).write.mode("overwrite").parquet(path)
    return path, df


def test_compact_reduces_file_count_data_identical(spark, many_small_files):
    path, df = many_small_files
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    report = storage.compact_table(spark, path, target_bytes=64 * 1024 * 1024)
    (leaf, (n_before, n_after)), = report.items()
    assert n_before == 40 and n_after < n_before
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == n_after
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before == list(range(20000))


def test_compact_noop_when_already_compact(spark, many_small_files):
    path, _ = many_small_files
    storage.compact_table(spark, path, target_bytes=64 * 1024 * 1024)
    report = storage.compact_table(spark, path, target_bytes=64 * 1024 * 1024)
    (leaf, (n_before, n_after)), = report.items()
    assert n_before == n_after  # second pass must not rewrite


def test_compact_partitioned_leaves_independently(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(0, 8000).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    df.repartition(10).write.mode("overwrite").partitionBy("p").parquet(path)
    report = storage.compact_table(spark, path, target_bytes=64 * 1024 * 1024)
    assert len(report) == 4  # one entry per leaf partition
    assert all(after <= before for before, after in report.values())
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(8000))


def test_range_sorted_write_prunes_row_groups(spark, tmp_path):
    path = str(tmp_path / "sorted")
    df = spark.range(0, 100000).select(F.col("id").alias("key"), (F.col("id") * 3).alias("v"))
    storage.write_range_sorted(df, path, ["key"], n_files=8)
    # disjoint spans: a narrow range must need ~1 of 8 row groups
    stats = storage.pruned_scan_stats(path, "key", 10, 20)
    assert stats["row_groups_total"] >= 8
    assert stats["row_groups_needed"] <= max(1, stats["row_groups_total"] // 8)
    # and the data survives, sorted within each file
    assert spark.read.parquet(path).count() == 100000
    # Spark's own scan sees the predicate at the parquet reader
    plan = (
        spark.read.parquet(path)
        .filter((F.col("key") >= 10) & (F.col("key") <= 20))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(key,10)" in plan


def test_unsorted_write_does_not_prune(spark, tmp_path):
    """Control: hash-shuffled layout leaves every row group overlapping
    the probe range — data skipping is a property of the LAYOUT."""
    path = str(tmp_path / "unsorted")
    df = spark.range(0, 100000).select(F.col("id").alias("key"))
    df.repartition(8).write.mode("overwrite").parquet(path)
    stats = storage.pruned_scan_stats(path, "key", 10, 20)
    assert stats["row_groups_needed"] == stats["row_groups_total"]
