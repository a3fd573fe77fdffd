"""Streaming chunk-level dedup gate (run_chunk_gate_stream): admit/
reject arriving documents by known-chunk fraction, with cross-batch
memory of admitted content and checkpoint-restart draining only new
waves."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from distribution_engine_smt_spark import tables
from distribution_engine_smt_spark.pipeline.curation import (
    chunk_frame,
    run_chunk_gate_stream,
)

from .conftest import SF_DIR

SCHEMA = "doc_id long, text string"


def _write_wave(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        ),
        str(path),
    )


def test_chunk_gate_cross_batch_and_restart(spark, tmp_path):
    docs = tables.load_tpch(spark, SF_DIR)["documents"].select("doc_id", "text")
    corpus_chunks = chunk_frame(docs).select("chunk_md5").distinct().persist()
    corpus_text = docs.first()["text"]

    novel_a = "alpha " * 120  # long enough for multiple chunks
    novel_d = "delta " * 120
    wave1 = [(50_000, corpus_text), (50_001, novel_a)]
    wave2 = [(50_100, novel_a), (50_101, novel_d)]  # 50_100 copies wave-1 doc
    incoming = tmp_path / "in"
    incoming.mkdir()
    _write_wave(incoming / "w1.parquet", wave1)
    _write_wave(incoming / "w2.parquet", wave2)

    store = str(tmp_path / "gate")
    ckpt = str(tmp_path / "ck")
    q = run_chunk_gate_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        corpus_chunks, store, ckpt,
    )
    q.awaitTermination(180)

    v = {r["doc_id"]: r for r in
         spark.read.parquet(f"{store}/verdicts").collect()}
    assert not v[50_000]["admitted"] and v[50_000]["dup_ratio"] == 1.0  # corpus copy
    assert v[50_001]["admitted"] and v[50_001]["n_dup"] == 0  # novel
    assert not v[50_100]["admitted"], "cross-BATCH duplicate admitted"
    assert v[50_101]["admitted"]

    # rejected docs must not pollute the chunk index: the corpus copy's
    # chunks exist only via the corpus side, the rejected wave-2 copy's
    # via wave-1's admitted doc — admitted-chunk store holds only
    # admitted docs' hashes
    stored = {r["chunk_md5"] for r in
              spark.read.parquet(f"{store}/chunks").collect()}
    a_chunks = {
        r["chunk_md5"]
        for r in chunk_frame(
            spark.createDataFrame(wave1[1:], SCHEMA)
        ).collect()
    }
    corpus_set = {r["chunk_md5"] for r in corpus_chunks.collect()}
    assert a_chunks <= stored
    assert not (stored & corpus_set - a_chunks), "corpus-copy chunks leaked in"

    # restart: only the new wave processes; a copy of an admitted doc is
    # rejected, fresh content admitted
    wave3 = [(50_200, novel_d), (50_201, "epsilon " * 120)]
    _write_wave(incoming / "w3.parquet", wave3)
    q2 = run_chunk_gate_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        corpus_chunks, store, ckpt,
    )
    q2.awaitTermination(180)
    v3 = {r["doc_id"]: r for r in
          spark.read.parquet(f"{store}/verdicts").collect()}
    assert not v3[50_200]["admitted"]  # copies wave-2's admitted novel_d
    assert v3[50_201]["admitted"]
    # earlier verdicts untouched by the restart
    assert {k: v3[k]["admitted"] for k in v} == {k: v[k]["admitted"] for k in v}
    corpus_chunks.unpersist()


def test_chunk_gate_replay_idempotent(spark, tmp_path):
    """Simulated replay: re-running a batch whose own chunk partition
    already landed must not see its own content (else every verdict
    flips to rejected)."""
    docs = tables.load_tpch(spark, SF_DIR)["documents"].select("doc_id", "text")
    corpus_chunks = chunk_frame(docs).select("chunk_md5").distinct()
    incoming = tmp_path / "in"
    incoming.mkdir()
    _write_wave(incoming / "w.parquet", [(60_000, "zeta " * 150)])
    store = str(tmp_path / "gate")
    q = run_chunk_gate_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        corpus_chunks, store, str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    first = spark.read.parquet(f"{store}/verdicts").collect()
    assert len(first) == 1 and first[0]["admitted"]
    # replay the same file through a FRESH checkpoint (same batch_id 0):
    # the batch's own partition is excluded from the known set, so the
    # verdict is identical instead of flipping to rejected
    q2 = run_chunk_gate_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        corpus_chunks, store, str(tmp_path / "ck2"),
    )
    q2.awaitTermination(120)
    replay = spark.read.parquet(f"{store}/verdicts").collect()
    assert len(replay) == 1 and replay[0]["admitted"]
