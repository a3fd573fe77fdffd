"""End-to-end curation run: the composed pipeline writes a consistent,
split-partitioned training manifest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.curation import curated_corpus
from distribution_engine_smt_spark.pipeline.run import curate_and_write

from .conftest import SF_DIR_ORACLE


def test_curate_and_write_produces_consistent_manifest(spark, tmp_path):
    out = str(tmp_path / "training_set")
    summary = curate_and_write(spark, SF_DIR_ORACLE, out).collect()
    assert summary

    # physical layout: one directory per split, nothing else at the top
    splits = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert splits <= {"train", "val", "test"} and "train" in splits

    written = spark.read.parquet(out)
    verdicts = curated_corpus(spark, SF_DIR_ORACLE)
    n_kept = verdicts.where(F.col("reason") == "kept").count()

    # every kept document appears exactly once; nothing else sneaks in
    assert written.count() == n_kept
    assert written.select("doc_id").distinct().count() == n_kept
    stray = written.join(
        verdicts.where(F.col("reason") != "kept"), "doc_id", "left_semi"
    )
    assert stray.count() == 0

    # the summary accounts for every written row
    assert sum(r["n_docs"] for r in summary) == n_kept

    # reading one split prunes to that split's directory only
    train = spark.read.parquet(out).where(F.col("split") == "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "split" in plan.split(
        "PartitionFilters: [", 1
    )[1].split("]", 1)[0]
