"""Incremental near-dup detection: a new batch probed against the indexed
corpus. Verified against exact Python-side Jaccard on the returned pairs,
exact-copy recall, and novel-document silence."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark import tables
from distribution_engine_smt_spark.pipeline.dedup import (
    JACCARD_THRESHOLD,
    minhash_index,
    probe_minhash_index,
)

from .conftest import SF_DIR


def _shingle_set(text: str) -> set:
    toks = text.strip().split(" ")
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def test_probe_finds_exact_copies_and_verifies_jaccard(spark):
    docs = tables.load_tpch(spark, SF_DIR)["documents"].select("doc_id", "text")
    bands, sh = minhash_index(docs)
    bands = bands.persist()
    sh = sh.persist()

    corpus_text = {r["doc_id"]: r["text"] for r in docs.collect()}
    # new batch: exact copies of three corpus docs under fresh ids, one
    # lightly-edited near-dup, one novel document
    base_ids = sorted(corpus_text)[:3]
    near_src = sorted(corpus_text)[3]
    rows = [(10_000 + i, corpus_text[d]) for i, d in enumerate(base_ids)]
    rows.append((10_100, corpus_text[near_src] + " trailing audit token"))
    rows.append((10_200, "completely novel text that matches no corpus shingle at all"))
    new_docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = probe_minhash_index(bands, sh, new_docs).collect()
    got = {(r["new_id"], r["corpus_id"]): r["jaccard"] for r in pairs}

    # every exact copy must pair with its source at jaccard 1.0
    for i, d in enumerate(base_ids):
        key = (10_000 + i, d)
        assert key in got and got[key] == 1.0, (key, got)

    # the novel doc must produce nothing
    assert not any(n == 10_200 for n, _ in got)

    # every returned pair's jaccard is the EXACT set jaccard (python),
    # and every pair clears the threshold
    new_text = dict(rows)
    for (n, c), j in got.items():
        a, b = _shingle_set(new_text[n]), _shingle_set(corpus_text[c])
        exact = len(a & b) / len(a | b)
        assert j == round(exact, 6), ((n, c), j, exact)
        assert exact >= JACCARD_THRESHOLD


def test_probe_width_mismatch_fails_loudly_and_ladder_width_probe_works(spark):
    """A ladder-width index (b=8/r=3 — the rung past 65536 docs) probed at
    the fixture default must raise, not silently find nothing: band values
    at different rows-per-band are md5 of different component counts and
    never collide. Probing at the matching widths finds the exact copy."""
    import pytest

    docs = tables.load_tpch(spark, SF_DIR)["documents"].select("doc_id", "text")
    bands, sh = minhash_index(docs, bands=8, rows=3)  # ladder rung widths
    bands = bands.persist()
    sh = sh.persist()
    src = docs.orderBy("doc_id").first()
    new_docs = spark.createDataFrame(
        [(30_000, src["text"])], "doc_id long, text string"
    )

    with pytest.raises(ValueError, match="width mismatch"):
        probe_minhash_index(bands, sh, new_docs)  # fixture default b=4

    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in probe_minhash_index(
            bands, sh, new_docs, bands=8, rows=3
        ).collect()
    }
    assert got.get((30_000, src["doc_id"])) == 1.0, got


def test_streaming_probe_matches_batch_probe(spark, tmp_path):
    """Drain-equals-batch for the ingest-time near-dup gate: the union of
    per-micro-batch probe outputs equals one batch probe of all waves."""
    from distribution_engine_smt_spark.pipeline.dedup import (
        run_incremental_dedup_stream,
    )

    docs = tables.load_tpch(spark, SF_DIR)["documents"].select("doc_id", "text")
    bands, sh = minhash_index(docs)
    bands = bands.persist()
    sh = sh.persist()
    corpus_text = {r["doc_id"]: r["text"] for r in docs.collect()}
    ids = sorted(corpus_text)

    wave1 = [(20_000 + i, corpus_text[d]) for i, d in enumerate(ids[:2])]
    wave2 = [(20_100, corpus_text[ids[2]] + " extra tail words here"),
             (20_200, "novel body with no corpus overlap whatsoever")]
    schema = "doc_id long, text string"
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    # single parquet FILES (a spark write would create directories, which
    # the file-stream source does not list as input files)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for fname, wave in [("wave1.parquet", wave1), ("wave2.parquet", wave2)]:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in wave], pa.int64()),
                    "text": pa.array([t for _, t in wave], pa.string()),
                }
            ),
            str(stream_dir / fname),
        )
    out = str(tmp_path / "pairs")
    q = run_incremental_dedup_stream(
        spark, str(stream_dir), spark.createDataFrame([], schema).schema,
        bands, sh, out, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    streamed = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(
            bands, sh, spark.createDataFrame(wave1 + wave2, schema)
        ).collect()
    }
    assert streamed == batch and batch  # non-empty and identical
