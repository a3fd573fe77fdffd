"""Bounded recursive tree expansion (reply threads).

The reference walks a reply tree with a Postgres recursive CTE bounded at
depth 8 (reference: engine/post_storage.py:303-309). Spark 4 has recursive
CTE support in SQL, but the depth bound here is a small constant, so an
iterative self-join loop is both simpler and gives Catalyst a fully static
plan per level (each level is one broadcast-able equi-join on
``parent_authorperm``).

Scale: each iteration joins the (small) frontier against the child index;
with ``child_col`` as the join key the frontier side is broadcast, so the
whole walk is depth × one broadcast join — no shuffles of the big table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_tree(
    edges: DataFrame,
    roots: DataFrame,
    id_col: str,
    parent_col: str,
    max_depth: int = 8,
) -> DataFrame:
    """Return all rows of ``edges`` reachable from ``roots`` by following
    ``parent_col -> id_col`` child links, up to ``max_depth`` levels,
    plus a ``depth`` column (roots = 0).

    ``roots`` must contain ``id_col``.
    """
    frontier = roots.select(F.col(id_col)).distinct().withColumn("depth", F.lit(0))
    result = frontier
    for level in range(1, max_depth + 1):
        children = (
            edges.join(
                F.broadcast(frontier.select(F.col(id_col).alias(parent_col))),
                on=parent_col,
                how="inner",
            )
            .select(F.col(id_col))
            .distinct()
            .withColumn("depth", F.lit(level))
        )
        # drop already-seen ids (cycle guard; reply trees are acyclic but
        # cheap insurance against bad data)
        children = children.join(result.select(id_col), on=id_col, how="left_anti")
        children = children.withColumn("depth", F.lit(level))
        if children.isEmpty():
            break
        result = result.unionByName(children)
        frontier = children.select(id_col, "depth")
    return result
