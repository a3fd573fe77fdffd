"""Property-based tests (hypothesis) for the chunk-dedup family: the
excision decision must satisfy its conservation invariants under
arbitrary corpora, not just the synthetic tables — every distinct chunk
survives in exactly one document (its canonical owner), nothing is kept
twice, and the audit (chunk_dedup) agrees with the decision
(chunk_excise) doc by doc.

A pure-Python reference model recomputes chunking (fixed 500-char
substrings) and ownership; Spark must match it exactly.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.curation import CHUNK_CHARS, chunk_frame

# texts long enough to span multiple chunks, built from a tiny alphabet so
# cross-document chunk collisions actually happen
_word = st.sampled_from(["alpha", "beta", "gamma", "delta"])
_text = st.lists(_word, min_size=1, max_size=400).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=6)


def _py_chunks(text: str) -> list[str]:
    n = max(len(text) - 1, 0) // CHUNK_CHARS
    return [text[i * CHUNK_CHARS:(i + 1) * CHUNK_CHARS] for i in range(n + 1)]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_chunk_frame_matches_python_reference(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_md5"])
        for r in chunk_frame(docs).collect()
    )
    want = sorted(
        (i, j, _md5(c))
        for i, t in enumerate(texts)
        for j, c in enumerate(_py_chunks(t))
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_excision_conservation_invariants(spark, texts):
    """Each distinct chunk hash is kept by exactly its min-doc_id owner;
    kept + excised = total per doc; a doc's clean_md5 replays from the
    reference model byte-for-byte."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ch = chunk_frame(docs).select("doc_id", "chunk_idx", "chunk_md5")
    own = ch.groupBy("chunk_md5").agg(F.min("doc_id").alias("owner"))
    kept = ch.join(own, "chunk_md5").withColumn(
        "kept", F.col("owner") == F.col("doc_id")
    )
    rows = kept.collect()

    # reference ownership
    owner: dict[str, int] = {}
    all_chunks = []
    for i, t in enumerate(texts):
        for j, c in enumerate(_py_chunks(t)):
            h = _md5(c)
            all_chunks.append((i, j, h))
            owner.setdefault(h, i)  # enumerate order == min doc_id order

    got_kept = {(r["doc_id"], r["chunk_idx"]) for r in rows if r["kept"]}
    want_kept = {(i, j) for (i, j, h) in all_chunks if owner[h] == i}
    assert got_kept == want_kept
    # conservation: every distinct hash kept somewhere, only by its owner
    kept_by = {}
    for r in rows:
        if r["kept"]:
            kept_by.setdefault(r["chunk_md5"], set()).add(r["doc_id"])
    assert set(kept_by) == set(owner)
    assert all(v == {owner[h]} for h, v in kept_by.items())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus)
def test_audit_and_decision_agree(spark, texts):
    """chunk_dedup's per-doc dup accounting and chunk_excise's keep
    accounting tell one consistent story: a chunk is 'dup' for the audit
    iff some OTHER doc shares it; it is excised iff a LOWER doc owns it —
    so n_dup >= n_chunks - n_kept for every doc (ownership implies
    sharing), with equality exactly when the doc owns none of its shared
    chunks."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ch = chunk_frame(docs).select("doc_id", "chunk_md5")
    cdf = ch.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").alias("ndocs"),
        F.min("doc_id").alias("owner"),
    )
    j = ch.join(cdf, "chunk_md5")
    per = (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).alias("n_dup"),
            F.sum(F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)).alias(
                "n_kept"
            ),
        )
        .collect()
    )
    for r in per:
        assert 0 <= r["n_kept"] <= r["n"]
        assert r["n_dup"] >= r["n"] - r["n_kept"], r
