"""API-edge result shaping — the reference's per-row post-processing
(reference: server/app.py:266-281,380-447 ``format_feed_data``) done
in-plan instead of in a Python loop over fetched rows.

Covers SURVEY.md §2: P9 (projection/rename/add-constant), F11 (wire time
format), F15 (reblogged_by CSV -> first element), F16 (vote-after-cashout
suppression happens in get_post_with_votes), S11 (JSON row sink via
``df.toJSON``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import format_time, reblogged_by_first, resolve_author, resolve_permlink


def format_discussion_rows(df: DataFrame) -> DataFrame:
    """Shape a discussion-query result for the wire: split authorperm back
    into author/permlink, ISO-format the timestamps, reduce reblogged_by to
    its first element, tag rows with the hive marker, drop internal
    columns — the reference does all of this per row in Python."""
    out = df
    cols = set(df.columns)
    out = out.withColumn("author", resolve_author(F.col("authorperm")))
    out = out.withColumn("permlink", resolve_permlink(F.col("authorperm")))
    out = out.withColumn("hive", F.col("authorperm").startswith("h@"))
    for ts_col in ("created", "cashout_time", "last_payout"):
        if ts_col in cols:
            out = out.withColumn(ts_col, format_time(F.col(ts_col)))
    if "reblogged_by" in cols:
        out = out.withColumn(
            "reblogged_by",
            F.when(
                F.col("reblogged_by").isNull() | (F.col("reblogged_by") == ""),
                F.array().cast("array<string>"),
            ).otherwise(reblogged_by_first(F.col("reblogged_by"))),
        )
    drop = [c for c in ("display_t", "desc") if c in cols]
    if drop:
        out = out.drop(*drop)
    return out


def to_json_rows(df: DataFrame, limit: int = 1000) -> list[str]:
    """Result sink (S11): JSON string per row at the HTTP boundary. The
    limit guard mirrors the reference's page caps."""
    return df.limit(limit).toJSON().collect()
