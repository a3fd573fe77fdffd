"""Streaming IVF ingest (run_ivf_ingest_stream): the vector-index
maintenance path as a stream, with probe-visibility and the
checkpoint-restart proof the other stream twins carry."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from distribution_engine_smt_spark.operators.storage import (
    build_ivf_index,
    probe_ivf_index,
    run_ivf_ingest_stream,
)
from distribution_engine_smt_spark.tables import load_tpch

from .conftest import SF_DIR

SCHEMA = "vec_id long, embedding array<float>"


def _write_wave(path, rows):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v for v, _ in rows], pa.int64()),
                "embedding": pa.array(
                    [e for _, e in rows], pa.list_(pa.float32())
                ),
            }
        ),
        str(path),
    )


def test_ivf_ingest_stream_probe_visibility_and_restart(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(spark, SF_DIR, idx)
    emb = load_tpch(spark, SF_DIR)["embeddings"]
    base = spark.read.parquet(idx).count()
    q_vec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]

    incoming = tmp_path / "in"
    incoming.mkdir()
    # two waves of clones of the query vector under fresh ids — each must
    # land in the query's own cell (router == stored assignment)
    _write_wave(incoming / "w1.parquet", [(200_000, q_vec)])
    _write_wave(incoming / "w2.parquet", [(200_001, q_vec)])
    ckpt = str(tmp_path / "ck")
    q = run_ivf_ingest_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        idx, cents, ckpt,
    )
    q.awaitTermination(180)
    assert spark.read.parquet(idx).count() == base + 2
    rows = {r["vec_id"]: r["cos"] for r in
            probe_ivf_index(spark, idx, cents, q_vec, top=5).collect()}
    assert 200_000 in rows and abs(rows[200_000] - 1.0) < 1e-12
    assert 200_001 in rows and abs(rows[200_001] - 1.0) < 1e-12

    # restart with the same checkpoint: only the NEW wave processes —
    # counts prove waves 1-2 were not re-ingested (their stream-N batch
    # partitions would still dedup on replay, but the checkpoint means
    # they aren't even read)
    _write_wave(incoming / "w3.parquet", [(200_002, q_vec)])
    q2 = run_ivf_ingest_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        idx, cents, ckpt,
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(idx).count() == base + 3
    rows = {r["vec_id"]: r["cos"] for r in
            probe_ivf_index(spark, idx, cents, q_vec, top=6).collect()}
    assert 200_002 in rows and abs(rows[200_002] - 1.0) < 1e-12


def test_ivf_ingest_stream_batch_equivalence(spark, tmp_path):
    """Drain-equals-batch: streaming ingest of a wave produces the same
    index content as the batch update_ivf_index call."""
    from distribution_engine_smt_spark.operators.storage import update_ivf_index

    emb = load_tpch(spark, SF_DIR)["embeddings"]
    wave = [
        (300_000 + i, [float(x) for x in r["embedding"]])
        for i, r in enumerate(emb.where("vec_id < 3").collect())
    ]

    idx_s = str(tmp_path / "ivf_s")
    cents = build_ivf_index(spark, SF_DIR, idx_s)
    incoming = tmp_path / "in"
    incoming.mkdir()
    _write_wave(incoming / "w.parquet", wave)
    q = run_ivf_ingest_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        idx_s, cents, str(tmp_path / "ck"),
    )
    q.awaitTermination(120)

    idx_b = str(tmp_path / "ivf_b")
    cents_b = build_ivf_index(spark, SF_DIR, idx_b)
    assert cents_b == cents  # deterministic fit
    update_ivf_index(
        spark, idx_b, cents_b,
        spark.createDataFrame(wave, SCHEMA), "b0",
    )
    key = lambda p: sorted(  # noqa: E731
        (r["vec_id"], r["cid"]) for r in
        spark.read.parquet(p).select("vec_id", "cid").collect()
    )
    assert key(idx_s) == key(idx_b)
