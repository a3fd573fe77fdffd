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
