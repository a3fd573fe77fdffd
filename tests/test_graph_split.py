"""Property tests for the round-6 operators: leakage-free splitting and
integer-token PageRank (plus RRF fusion sanity). The DuckDB hash-match in
test_driver_queries.py is the primary correctness gate; these tests pin the
SEMANTIC properties an oracle twin can't express — split purity, mass
conservation, independence from an engine altogether."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.curation import leakage_free_split
from distribution_engine_smt_spark.pipeline.graph import (
    PR_BASE,
    PR_ITERS,
    PR_KEEP,
    graph_pagerank,
)
from distribution_engine_smt_spark.pipeline.search import rrf_hybrid_search
from distribution_engine_smt_spark import tables

from .conftest import SF_DIR


def test_split_assigns_every_document_exactly_once(spark):
    docs = tables.load_tpch(spark, SF_DIR)["documents"]
    out = leakage_free_split(spark, SF_DIR)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    assert set(
        r["split"] for r in out.select("split").distinct().collect()
    ) <= {"train", "val", "test"}


def test_split_never_separates_duplicate_groups(spark):
    docs = tables.load_tpch(spark, SF_DIR)["documents"]
    out = leakage_free_split(spark, SF_DIR)
    joined = out.join(
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h")),
        "doc_id",
    )
    # per content hash: exactly one distinct split label and the declared
    # representative equals the group's min doc_id
    per_group = joined.groupBy("h").agg(
        F.countDistinct("split").alias("n_splits"),
        F.countDistinct("group_rep").alias("n_reps"),
        F.min("doc_id").alias("min_doc"),
        F.first("group_rep").alias("rep"),
    )
    bad = per_group.filter(
        (F.col("n_splits") != 1)
        | (F.col("n_reps") != 1)
        | (F.col("min_doc") != F.col("rep"))
    )
    assert bad.count() == 0


def test_pagerank_matches_pure_python_replay(spark):
    """Engine-independent reference: replay the integer recurrence in plain
    Python dictionaries from the same edge list."""
    t = tables.load_tpch(spark, SF_DIR)
    cs = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .collect()
    )
    edges = defaultdict(list)
    for r in cs:
        a, b = r["c"] * 2, r["s"] * 2 + 1
        edges[a].append(b)
        edges[b].append(a)
    tokens = {n: PR_BASE for n in edges}
    for _ in range(PR_ITERS):
        recv = defaultdict(int)
        for src, nbrs in edges.items():
            contrib = tokens[src] // len(nbrs)
            for dst in nbrs:
                recv[dst] += contrib
        tokens = {n: PR_KEEP + (85 * recv[n]) // 100 for n in recv}
    expect = sorted(tokens.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["node"], r["tokens"])
        for r in graph_pagerank(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_rrf_only_fuses_documents_from_a_ranked_list(spark):
    """Every fused document must come from at least one ranker's top list,
    and a document in both lists must outscore the same-rank doc in one."""
    out = rrf_hybrid_search(spark, SF_DIR).collect()
    assert 0 < len(out) <= 20
    scores = [r["rrf"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # RRF scores are bounded by 2/(60+1) (both ranks = 1) and > 0
    assert all(0 < s <= round(2 / 61, 6) for s in scores)
