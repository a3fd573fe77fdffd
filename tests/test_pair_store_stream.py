"""Streaming twin of the materialized pair store (VERDICT r5 #7):
incremental LSH pair maintenance with cross-BATCH detection and the
two-wave checkpoint-restart proof the sketch stores use.

The static-index gate (run_incremental_dedup_stream) cannot pair a
wave-2 arrival with a wave-1 arrival; the pair-store stream accumulates
band/shingle postings per batch, so it can — that cross-batch pair is
the load-bearing assertion here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from distribution_engine_smt_spark import tables
from distribution_engine_smt_spark.pipeline.dedup import (
    minhash_index,
    run_pair_store_stream,
)

from .conftest import SF_DIR

SCHEMA = "doc_id long, text string, source string"


def _write_wave(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in rows], pa.int64()),
                "text": pa.array([t for _, t, _ in rows], pa.string()),
                "source": pa.array([s for _, _, s in rows], pa.string()),
            }
        ),
        str(path),
    )


def test_pair_store_stream_cross_batch_and_restart(spark, tmp_path):
    docs = tables.load_tpch(spark, SF_DIR)["documents"]
    corpus = docs.select("doc_id", "text")
    bands, sh = minhash_index(corpus)
    bands = bands.persist()
    sh = sh.persist()
    corpus_sources = docs.select("doc_id", "source")
    text = {r["doc_id"]: r["text"] for r in corpus.collect()}
    src = {r["doc_id"]: r["source"] for r in corpus_sources.collect()}
    ids = sorted(text)

    # wave1: copy of corpus doc A + a novel doc
    a, b = ids[0], ids[1]
    wave1 = [
        (30_000, text[a], "w1src"),
        (30_001, "utterly novel words never seen in any corpus shingle", "w1src"),
    ]
    # wave2: copy of the WAVE-1 doc 30_000's text (cross-batch pair!)
    wave2 = [(30_100, text[a], "w2src")]
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    _write_wave(incoming / "w1.parquet", wave1)
    _write_wave(incoming / "w2.parquet", wave2)

    store = str(tmp_path / "pairstore")
    ckpt = str(tmp_path / "ckpt")
    q = run_pair_store_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        bands, sh, corpus_sources, store, ckpt,
    )
    q.awaitTermination(180)

    got = {
        (r["d1"], r["d2"]): (r["jaccard"], r["s1"], r["s2"])
        for r in spark.read.parquet(f"{store}/pairs").drop("batch_id").collect()
    }
    # exact copies: corpus pair, and the cross-batch wave1<->wave2 pair
    assert (a, 30_000) in got and got[(a, 30_000)][0] == 1.0
    assert (a, 30_100) in got and got[(a, 30_100)][0] == 1.0
    assert (30_000, 30_100) in got, "cross-BATCH pair missed (static-index gap)"
    # sources resolved from the right side of each pair
    assert got[(a, 30_000)][1:] == (src[a], "w1src")
    assert got[(30_000, 30_100)][1:] == ("w1src", "w2src")
    # novel doc pairs with nothing
    assert not any(30_001 in k for k in got)
    # canonical orientation, no self pairs, no duplicates (dict above
    # would have hidden dupes — check the raw count)
    raw = spark.read.parquet(f"{store}/pairs").collect()
    assert len(raw) == len(got)
    assert all(r["d1"] < r["d2"] for r in raw)

    # --- restart wave: same checkpoint, one new file -> ONLY it processes,
    # and it pairs against corpus AND both prior waves
    wave3 = [(30_200, text[a], "w3src")]
    _write_wave(incoming / "w3.parquet", wave3)
    q2 = run_pair_store_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        bands, sh, corpus_sources, store, ckpt,
    )
    q2.awaitTermination(180)
    got3 = {
        (r["d1"], r["d2"])
        for r in spark.read.parquet(f"{store}/pairs").drop("batch_id").collect()
    }
    for expect in [(a, 30_200), (30_000, 30_200), (30_100, 30_200)]:
        assert expect in got3, f"restart wave missed pair {expect}"
    # prior waves were NOT reprocessed: their pair rows are unchanged
    assert {k for k in got3 if 30_200 not in k} == set(got)

    bands.unpersist()
    sh.unpersist()


def test_pair_store_stream_matches_batch_store_shape(spark, tmp_path):
    """Columns line up with read_dedup_pairs' contract so one reader
    serves both the batch-built and streamed stores."""
    docs = tables.load_tpch(spark, SF_DIR)["documents"]
    corpus = docs.select("doc_id", "text")
    bands, sh = minhash_index(corpus)
    text0 = corpus.first()["text"]
    incoming = tmp_path / "in"
    incoming.mkdir()
    _write_wave(incoming / "w.parquet", [(40_000, text0, "wsrc")])
    store = str(tmp_path / "store")
    q = run_pair_store_stream(
        spark, str(incoming), spark.createDataFrame([], SCHEMA).schema,
        bands, sh, docs.select("doc_id", "source"), store,
        str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(f"{store}/pairs").select(
        "d1", "d2", "jaccard", "s1", "s2"
    )
    assert out.count() >= 1
    row = out.where(F.col("d2") == 40_000).first()
    assert row is not None and row["s2"] == "wsrc"
