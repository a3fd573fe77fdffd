"""Property-based tests (hypothesis) for the round-6 deterministic-math
operators: integer PageRank on arbitrary small graphs and incremental
split-manifest maintenance under arbitrary wave partitions. The sf-data
tests pin behavior on the real corpus; these pin the ALGEBRA (conservation
bounds, stability, wave-order invariance) on adversarial inputs."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.graph import PR_BASE, PR_KEEP

_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
)


def _python_pagerank(pairs, iters=2):
    edges = defaultdict(set)
    for a, b in pairs:
        edges[a].add(b)
        edges[b].add(a)
    edges = {n: sorted(nb) for n, nb in edges.items()}
    tokens = {n: PR_BASE for n in edges}
    for _ in range(iters):
        recv = defaultdict(int)
        for src, nbrs in edges.items():
            c = tokens[src] // len(nbrs)
            for dst in nbrs:
                recv[dst] += c
        tokens = {n: PR_KEEP + (85 * recv[n]) // 100 for n in recv}
    return tokens


def _spark_pagerank(spark, pairs, iters=2):
    cs = spark.createDataFrame(sorted(set(pairs)), "a long, b long")
    e = cs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        cs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    state = deg.select("src", F.lit(PR_BASE).cast("long").alias("tokens"), "deg")
    for _ in range(iters):
        recv = (
            e.join(state, "src")
            .select("dst", F.expr("tokens div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("recv"))
        )
        tokens = recv.select(
            F.col("dst").alias("src"),
            (F.lit(PR_KEEP) + F.expr("(85 * recv) div 100")).cast("long").alias("tokens"),
        )
        state = tokens.join(deg, "src").select("src", "tokens", "deg")
    return {r["src"]: r["tokens"] for r in state.collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_edges)
def test_integer_pagerank_matches_model_on_arbitrary_graphs(spark, pairs):
    """The distributed recurrence equals the sequential model on any graph
    — integer arithmetic makes the per-node sum partitioning-independent,
    so ANY divergence is a logic bug, never 'float noise'."""
    assert _spark_pagerank(spark, pairs) == _python_pagerank(pairs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_edges)
def test_pagerank_mass_is_conserved_up_to_floor_loss(spark, pairs):
    """Damped token mass: each iteration maps total T to 0.15·B·N + 0.85·T
    minus bounded floor losses (< 1 token per node per hop at each of the
    two divisions). Checked on the Python model (== Spark by the test
    above)."""
    tokens = _python_pagerank(pairs)
    n = len(tokens)
    edges = defaultdict(set)
    for a, b in pairs:
        edges[a].add(b)
        edges[b].add(a)
    max_deg = max(len(v) for v in edges.values())
    total = sum(tokens.values())
    exact = n * (PR_KEEP + 0.85 * PR_BASE)  # fixed point of one exact hop
    # two hops of floor losses: each node loses < deg quotient remainders
    # (< deg) at the send and < 1 at the damping divide, 85x-amplified
    slack = 2 * n * (max_deg + 1) * 85
    assert exact - slack <= total <= exact + slack


_texts = st.lists(st.sampled_from(["aaa", "bbb", "ccc", "ddd"]), min_size=1, max_size=10)
_cut = st.integers(0, 10)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, cut=_cut)
def test_split_manifest_waves_never_contradict_batch_groups(spark, texts, cut):
    """For ANY wave split of a corpus (waves in doc_id order), incremental
    manifest building yields exactly the batch manifest: same groups, same
    reps, same splits."""
    from distribution_engine_smt_spark.pipeline.curation import (
        split_manifest,
        update_split_manifest,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    batch = {
        r["doc_id"]: (r["group_rep"], r["split"])
        for r in split_manifest(docs).collect()
    }
    cut = min(cut, len(texts))
    w1 = docs.where(F.col("doc_id") < cut)
    w2 = docs.where(F.col("doc_id") >= cut)
    m = update_split_manifest(split_manifest(w1), w2)
    incr = {r["doc_id"]: (r["group_rep"], r["split"]) for r in m.collect()}
    assert incr == batch
