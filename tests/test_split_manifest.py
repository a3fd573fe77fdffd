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
    # original group and split), plus one genuinely new document.
    # Collected ONCE with a pinned order — an unordered limit() would be
    # re-evaluated per action and could pick different rows each time.
    base = docs.orderBy("doc_id").limit(5).collect()
    dup_rows = [(r["doc_id"] + 1_000_000, r["text"]) for r in base]
    redelivery_rows = [(r["doc_id"], r["text"]) for r in base[:3]]
    novel_rows = [(2_000_000, "an entirely new document body never seen before")]
    wave = docs.sparkSession.createDataFrame(
        dup_rows + redelivery_rows + novel_rows, "doc_id long, text string"
    )
    m1 = update_split_manifest(m0, wave)
    after = _rows(m1)
    # invariant 1: existing rows unchanged
    for d, v in before.items():
        assert after[d] == v
    # invariant 2: each late duplicate carries its original group's rep+split
    for new_id, _text in dup_rows:
        orig = before[new_id - 1_000_000]
        assert after[new_id] == orig
    # invariant 3: redelivered doc_ids are not duplicated in the manifest
    assert len(after) == len(before) + 5 + 1
    # the novel doc forms its own group with itself as rep
    assert after[2_000_000][1] == 2_000_000
    assert after[2_000_000][2] in {"train", "val", "test"}
