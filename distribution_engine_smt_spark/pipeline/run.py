"""The end-to-end curation RUN: compose the audited operators into the
job a training-data pipeline actually executes, materializing a packed,
split-partitioned training manifest on disk.

Stages (each individually oracled elsewhere — this module is the glue and
the write discipline):
  1. verdict  — curated_corpus: first-failing-reason per document
                (holdout > quality > exact-dup > contamination > sampling)
  2. split    — split_manifest over the KEPT docs (leakage-free coin on
                the dup-group representative)
  3. pack     — pack_sequences_df: (source, shard, bin) training-sequence
                keys under the token budget
  4. write    — parquet PARTITIONED BY split, so a trainer reads
                split=train with partition pruning and never sees eval

Scale: stages 1-3 are the audited plans (see docs/PLANS.md); the write
adds one exchange (repartition by split+source so each partition
directory gets coherent writer groups instead of a file spray).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t
from .curation import curated_corpus, pack_sequences_df, split_manifest


def curate_and_write(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Run the full curation pipeline and write the training manifest to
    ``out_dir`` partitioned by split. Returns the per-(split, source)
    summary (docs, sequences, tokens) the run would publish as its report.
    """
    docs = _t(spark, sf_dir)["documents"]
    verdicts = curated_corpus(spark, sf_dir)  # (doc_id, reason)
    kept = docs.join(
        verdicts.where(F.col("reason") == "kept").select("doc_id"), "doc_id"
    )
    manifest = split_manifest(kept).select("doc_id", "split")
    packed = pack_sequences_df(kept).join(manifest, "doc_id")
    (
        packed.repartition("split", "source")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    return (
        written.groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source", "shard", "bin").alias("n_sequences"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("split", "source")
    )
