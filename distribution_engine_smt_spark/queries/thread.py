"""Reply-thread expansion (reference: engine/post_storage.py:296-311
recursive CTE, depth ≤ 8; endpoint server/app.py:497-531)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import expand_tree


def get_thread(
    state: dict[str, DataFrame], token: str, authorperm: str, max_depth: int = 8
) -> DataFrame:
    """All descendants of a post (bounded walk over
    post_metadata.parent_authorperm), joined back to the token's post rows —
    the driver-side-loop equivalent of the reference's WITH RECURSIVE."""
    meta = state["post_metadata"]
    edges = meta.select(
        F.col("authorperm").alias("id"),
        F.col("parent_authorperm").alias("parent"),
    )
    roots = meta.filter(F.col("authorperm") == authorperm).select(
        F.col("authorperm").alias("id")
    )
    tree = expand_tree(edges, roots, "id", "parent", max_depth=max_depth)
    return (
        tree.withColumnRenamed("id", "authorperm")
        .join(
            state["posts"].filter(F.col("token") == token.upper()),
            "authorperm",
            "inner",
        )
        .orderBy(F.col("depth").asc(), F.col("created").asc(), F.col("authorperm").asc())
    )
