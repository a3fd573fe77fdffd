"""Ingest → fold → migrate lifecycle for the RHP band store (VERDICT r7
next-round #2): stream-ingested vectors fold back into a GROWABLE corpus
table (idempotent batch-keyed append + store fingerprint refresh), after
which the width migration that previously REFUSED (orphaned stream rows)
succeeds and produces buckets identical to a from-scratch banding of the
grown corpus."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from distribution_engine_smt_spark import tables
from distribution_engine_smt_spark.operators import storage
from distribution_engine_smt_spark.pipeline.similarity import (
    RHP_TABLES,
    rhp_band_frame_at,
)

from .conftest import SF_DIR


@pytest.fixture()
def store_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "stores")
    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", d)
    yield d


def _wave(path, rows):
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


def test_ingest_fold_migrate_lifecycle(spark, store_dir, tmp_path):
    corpus = storage.init_growable_corpus(
        spark, SF_DIR, str(tmp_path / "corpus")
    )
    emb = tables.load_tpch(spark, corpus)["embeddings"]
    n0 = emb.count()
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where("vec_id < 2").collect()
    }

    path = storage.build_rhp_band_store(spark, corpus)
    bits0 = storage.rhp_store_bits(path)

    # two stream waves of new vectors land in the staging area and band
    # incrementally into the store at the STORED width
    incoming = tmp_path / "in"
    incoming.mkdir()
    _wave(incoming / "w1.parquet", [(300_000, vecs[0])])
    _wave(incoming / "w2.parquet", [(300_001, vecs[1])])
    q = storage.run_rhp_band_stream(
        spark,
        str(incoming),
        "vec_id long, embedding array<float>",
        path,
        str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    assert storage.read_rhp_bands(spark, path).count() == (
        (n0 + 2) * RHP_TABLES
    )

    # before the fold: migration REFUSES (stream rows absent from corpus)
    with pytest.raises(ValueError, match="fold"):
        storage.migrate_rhp_band_store(spark, corpus, path, bits0 + 1)

    # seed the per-session fit memos with sentinel entries keyed on this
    # corpus: a stale kmeans/PQ fit surviving the fold would hand every
    # IVF probe a quantizer that excludes the folded vectors (ADVICE r8
    # #1 — the exact "index that forgets rows" failure the fold prevents)
    from distribution_engine_smt_spark.pipeline import clustering
    from distribution_engine_smt_spark.pipeline import pq as pq_mod

    clustering._FIT_CACHE[("app", corpus, 4, 2)] = ("stale-fit",)
    pq_mod._FIT_CACHE[("app", corpus)] = [[0.0]]

    # fold: stream vectors land in the corpus table under per-batch
    # partitions; the store is re-published at the refreshed fingerprint
    new_path = storage.fold_rhp_stream_into_corpus(
        spark, corpus, path, str(incoming)
    )
    assert new_path != path and not os.path.isdir(path)
    assert ("app", corpus, 4, 2) not in clustering._FIT_CACHE
    assert ("app", corpus) not in pq_mod._FIT_CACHE
    emb2 = tables.load_tpch(spark, corpus)["embeddings"]
    assert emb2.count() == n0 + 2
    folded = emb2.where(F.col("vec_id") >= 300_000)
    assert folded.count() == 2 and folded.where("label IS NULL").count() == 2
    # fold is idempotent: a replay rewrites the same partitions
    again = storage.fold_rhp_stream_into_corpus(
        spark, corpus, new_path, str(incoming)
    )
    assert again == new_path
    assert tables.load_tpch(spark, corpus)["embeddings"].count() == n0 + 2

    # migration now succeeds and is bucket-identical to a from-scratch
    # banding of the GROWN corpus at the new width
    migrated_path = storage.ensure_rhp_band_store(spark, corpus, bits0 + 1)
    assert storage.rhp_store_bits(migrated_path) == bits0 + 1
    got = sorted(
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in storage.read_rhp_bands(spark, migrated_path).collect()
    )
    want = sorted(
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in rhp_band_frame_at(spark, corpus, bits0 + 1).collect()
    )
    assert got == want and len(got) == (n0 + 2) * RHP_TABLES

    # crash-replay collision (ADVICE r8 #4): a fold replayed from a
    # pre-rename store copy, when a store for the grown corpus already
    # sits at the refreshed fingerprint path, must keep the existing
    # store and retire the stale one — not OSError on the rename
    import shutil

    stale = migrated_path + "-stale-replay"
    shutil.copytree(migrated_path, stale)
    resolved = storage.fold_rhp_stream_into_corpus(
        spark, corpus, stale, str(incoming)
    )
    assert resolved == migrated_path
    assert not os.path.isdir(stale) and os.path.isdir(migrated_path)
