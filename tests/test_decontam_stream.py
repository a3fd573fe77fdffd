"""Streaming decontamination: the flag table maintained incrementally as
benchmark docs arrive must drain to EXACTLY the all-at-once batch answer
(minhash_decontaminate), across a checkpoint restart, with idempotent
replay — the drain-equals-batch discipline every streaming extension
here carries."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as papq

from distribution_engine_smt_spark.pipeline import decontam

from .conftest import SF_DIR


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_agree"], r["best_match"], r["flagged"])
        for r in df.collect()
    )


def test_decontam_flag_stream_drain_equals_batch(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench_ids = sorted(
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if r["doc_id"] % decontam.BENCH_MOD == 0
    )
    assert len(bench_ids) > 4
    # split the bench set into two arrival waves
    w1 = [i for i in bench_ids if (i // decontam.BENCH_MOD) % 2 == 0]
    w2 = [i for i in bench_ids if (i // decontam.BENCH_MOD) % 2 == 1]
    assert w1 and w2

    flag_dir = str(tmp_path / "flags")
    decontam.init_decontam_flags(spark, SF_DIR, flag_dir)
    init = decontam.read_decontam_flags(spark, flag_dir)
    assert init.count() == docs.count()  # everyone starts as train
    assert init.filter("flagged").count() == 0

    incoming = tmp_path / "bench-in"
    incoming.mkdir()
    ckpt = str(tmp_path / "ck")

    def wave(path, ids):
        papq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}), str(path)
        )

    wave(incoming / "w1.parquet", w1)
    q = decontam.run_decontam_flag_stream(
        spark, str(incoming), "doc_id long", SF_DIR, flag_dir, ckpt,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    mid = decontam.read_decontam_flags(spark, flag_dir)
    # wave-1 bench docs left the train universe; wave-2 docs are still in
    mid_ids = {r["doc_id"] for r in mid.select("doc_id").collect()}
    assert not (set(w1) & mid_ids)
    assert set(w2) <= mid_ids

    # restart from the checkpoint for the second wave
    wave(incoming / "w2.parquet", w2)
    q2 = decontam.run_decontam_flag_stream(
        spark, str(incoming), "doc_id long", SF_DIR, flag_dir, ckpt,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)

    drained = decontam.read_decontam_flags(spark, flag_dir)
    batch = decontam.minhash_decontaminate(spark, SF_DIR)
    assert _rows(drained) == _rows(batch)

    # at-least-once replay of the last wave is a no-op (the max-merge is
    # idempotent; the bench ids are already out of the train universe)
    ids_df = spark.createDataFrame([(i,) for i in w2], "doc_id long")
    decontam.update_decontam_flags(spark, SF_DIR, ids_df, flag_dir)
    assert _rows(decontam.read_decontam_flags(spark, flag_dir)) == _rows(batch)
