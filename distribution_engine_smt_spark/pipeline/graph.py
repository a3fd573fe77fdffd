"""Graph analytics over the relational tables: integer-arithmetic PageRank
on the customer–supplier interaction graph.

The reference engine has no graph operator, but a training-data pipeline
uses exactly this shape for influence/importance weighting (source trust
propagation, citation-graph weighting of documents). The interesting part
is the determinism design: classic PageRank sums doubles per target node —
order-dependent, so Spark and an oracle engine disagree in the last ulp
and there is no fixed-order fold available inside a groupBy. This
implementation runs the whole recurrence in BOUNDED INTEGER arithmetic
("token PageRank"): every node starts with 1,000,000 tokens, a node with
out-degree d sends ``tokens div d`` to each neighbour (integer floor), and
the damping update is ``150_000 + (85 * received) div 100`` — every
operation exact and the per-node SUM commutative over integers, so the
result is bit-identical on any engine and any partitioning, at any scale.

Convergence behaviour matches float PageRank to ~6 decimal places (the
floor loses < 1e-6 of mass per hop at this token scale); the fixture test
cross-checks against a pure-Python replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, memoize_df, register
from ..session import tracked_persist

PR_BASE = 1_000_000  # initial tokens per node
PR_KEEP = 150_000  # (1 - d) * BASE with d = 0.85
PR_ITERS = 2
PR_TOP = 20

_EDGE_SQL = """
    cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    e AS (
      SELECT c * 2 AS src, s * 2 + 1 AS dst FROM cs
      UNION ALL
      SELECT s * 2 + 1 AS src, c * 2 AS dst FROM cs
    ),
    deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    )
"""


def _iter_sql(prev: str, out: str) -> str:
    return f"""
    recv_{out} AS (
      SELECT e.dst AS src, CAST(sum({prev}.tokens // d.deg) AS BIGINT) AS recv
      FROM e
      JOIN {prev} ON e.src = {prev}.src
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT src,
             CAST({PR_KEEP} + (85 * recv) // 100 AS BIGINT) AS tokens
      FROM recv_{out}
    )
"""


@register(
    "graph_pagerank",
    f"""
    WITH {_EDGE_SQL},
    r0 AS (SELECT src, CAST({PR_BASE} AS BIGINT) AS tokens FROM deg),
    {_iter_sql('r0', 'r1')},
    {_iter_sql('r1', 'r2')}
    SELECT src AS node, tokens
    FROM r2
    ORDER BY tokens DESC, node ASC
    LIMIT {PR_TOP}
    """,
)
@memoize_df
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped PageRank iterations over the undirected customer–supplier
    graph (an edge per distinct (customer, supplier) trading pair from
    orders ⋈ lineitem; node id = 2·custkey / 2·suppkey+1).

    All-integer recurrence — see the module docstring for why (cross-engine
    float SUM has no defined order; integer SUM is exact and commutative).
    Both iterations are replayed in the oracle's CTEs, so edge derivation,
    degree counts, floor divisions, and damping all cross-check.

    Scale: the edge list is materialized once (one distinct shuffle) and
    is hash-partitioned on ``src``; each iteration is ONE join of the
    node-state frame against the co-partitioned edges plus ONE groupBy on
    ``dst`` with map-side partial sums — the exact spark.graphx
    aggregateMessages shape, expressed relationally. State per node is one
    long; iteration count is fixed, so the lineage stays bounded (no
    checkpoint needed below ~8 iterations; localCheckpoint per iteration
    past that, as operators/recursive.py does for deep trees).
    """
    t = _t(spark, sf_dir)
    # one-parse SQL text (r13): same trees as the old Column-DSL selects
    cs = (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .selectExpr("o_custkey AS c", "l_suppkey AS s")
        .distinct()
    )
    e = (
        cs.selectExpr("(c * 2) AS src", "(s * 2 + 1) AS dst")
        .unionAll(cs.selectExpr("(s * 2 + 1) AS src", "(c * 2) AS dst"))
    )
    # hash-partition the edge list on ``src`` ONCE and attach each source's
    # out-degree to its edge rows before persisting: the degree aggregation
    # reuses the repartition exchange, the deg-attach join is co-partitioned
    # (no exchange on either side), and — the iteration win — node state
    # shrinks to (src, tokens), so each iteration is ONE join against the
    # cached pre-partitioned edges plus ONE groupBy(dst) shuffle. The r11
    # plan carried deg on the state frame instead, which cost a second
    # (state ⋈ deg) SortMergeJoin + exchanges per iteration (6 Exchanges /
    # iteration -> 1; measured 2.37 s -> see OPTIMIZATION_r12.md).
    # explicit partition count (the session's shuffle width, itself derived
    # from SPARK_GRAFT_CPUS / cluster conf): a count-less repartition is
    # AQE-coalescible, which leaves the cached relation's partitioning
    # unrecognizable to EnsureRequirements and re-exchanges the edges at
    # every iteration join. sortWithinPartitions is kept by the cache too,
    # so the per-iteration SortMergeJoin re-sorts only the state side.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window

    # deg via a per-src count window instead of groupBy + self-join: the
    # window's required sort doubles as the cached frame's ordering, so the
    # one-time build is exchange + sort + window (no second join) and every
    # iteration's SortMergeJoin re-sorts only the state side.
    e = (
        e.repartition(n_part, F.col("src"))
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
    )
    e = tracked_persist(e)
    # initial state off the CACHED frame (the r11 plan re-derived the whole
    # orders ⋈ lineitem distinct for it): src-partitioned input means this
    # groupBy needs no exchange
    state = (
        e.select("src")
        .distinct()
        .select("src", F.lit(PR_BASE).cast("long").alias("tokens"))
    )
    for _ in range(PR_ITERS):
        recv = (
            e.join(state, "src")
            .selectExpr("dst", "(tokens div deg) AS contrib")
            .groupBy("dst")
            .agg(F.expr("CAST(sum(contrib) AS BIGINT) AS recv"))
        )
        state = recv.selectExpr(
            "dst AS src",
            f"CAST({PR_KEEP} + ((85 * recv) div 100) AS BIGINT) AS tokens",
        )
    return (
        state.selectExpr("src AS node", "tokens")
        .orderBy(F.col("tokens").desc(), F.col("node").asc())
        .limit(PR_TOP)
    )
