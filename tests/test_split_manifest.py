"""Incremental split-manifest maintenance: growth never moves an existing
document, late duplicates join their group's split, and ordered-wave
incremental building reproduces the batch build exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark import tables
from distribution_engine_smt_spark.pipeline.curation import (
    split_manifest,
    update_split_manifest,
)

from .conftest import SF_DIR


def _docs(spark):
    return tables.load_tpch(spark, SF_DIR)["documents"].select("doc_id", "text")


def _rows(df):
    return {
        r["doc_id"]: (r["h"], r["group_rep"], r["split"]) for r in df.collect()
    }


def test_ordered_waves_reproduce_batch_build(spark):
    docs = _docs(spark)
    cut = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    wave1 = docs.where(F.col("doc_id") <= cut)
    wave2 = docs.where(F.col("doc_id") > cut)
    batch = _rows(split_manifest(docs))
    incr = _rows(update_split_manifest(split_manifest(wave1), wave2))
    assert incr == batch


def test_existing_rows_never_change_and_late_dups_join_their_group(spark):
    docs = _docs(spark)
    m0 = split_manifest(docs)
    before = _rows(m0)
    # a late wave: re-deliveries of existing docs (must be ignored) plus
    # exact duplicates of existing content under NEW doc_ids (must join the
    # original group and split), plus one genuinely new document
    dups = docs.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    redelivery = docs.limit(3)
    novel = docs.sparkSession.createDataFrame(
        [(2_000_000, "an entirely new document body never seen before")],
        "doc_id long, text string",
    )
    m1 = update_split_manifest(m0, dups.unionByName(redelivery).unionByName(novel))
    after = _rows(m1)
    # invariant 1: existing rows unchanged
    for d, v in before.items():
        assert after[d] == v
    # invariant 2: each late duplicate carries its original group's rep+split
    for r in dups.collect():
        orig = before[r["doc_id"] - 1_000_000]
        assert after[r["doc_id"]] == orig
    # invariant 3: redelivered doc_ids are not duplicated in the manifest
    assert len(after) == len(before) + 5 + 1
    # the novel doc forms its own group with itself as rep
    assert after[2_000_000][1] == 2_000_000
    assert after[2_000_000][2] in {"train", "val", "test"}
