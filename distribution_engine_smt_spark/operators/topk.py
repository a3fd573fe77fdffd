"""Top-k / pagination operators.

The reference paginates with ORDER BY ... LIMIT plus keyset anchors
(reference: engine/post_storage.py:171-189,378-380) and one client-side
offset emulation (engine/account_history_storage.py:82-120). Spark compiles
``orderBy().limit(k)`` to TakeOrderedAndProject — a per-partition top-k plus
a driver merge, no full sort, no full shuffle — which is exactly the plan we
want at 100 TB.

Determinism: every sort gets a unique tie-breaker column so results (and the
DuckDB oracle hash) are stable (SURVEY.md §7 "nondeterminism parity").
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    tiebreak: str | None = None,
) -> DataFrame:
    cols = list(order)
    if tiebreak is not None:
        cols.append(F.col(tiebreak).asc())
    return df.orderBy(*cols).limit(k)


def keyset_page_by_time(
    df: DataFrame,
    time_col: str,
    anchor_ts,
    k: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Keyset pagination: rows at-or-before the anchor timestamp, newest
    first (reference: engine/post_storage.py:181,220-221). Avoids OFFSET —
    each page is a fresh pushed-down range predicate + top-k."""
    page = df
    if anchor_ts is not None:
        page = page.filter(F.col(time_col) <= F.lit(anchor_ts))
    return top_k(page, [F.col(time_col).desc()], k, tiebreak=tiebreak)


def offset_page(
    df: DataFrame,
    order: Sequence[Column],
    limit: int,
    offset: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Offset emulation: fetch limit+offset then skip — the reference does
    the skip client-side (engine/account_history_storage.py:82-120); here a
    row_number filter keeps it in-plan. limit is clamped to 1000 like the
    reference (account_history_storage.py:79-80)."""
    limit = min(int(limit), 1000)
    cols = list(order)
    if tiebreak is not None:
        cols.append(F.col(tiebreak).asc())
    from pyspark.sql import Window

    head = df.orderBy(*cols).limit(limit + offset)
    w = Window.orderBy(*cols)
    return (
        head.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > offset)
        .drop("__rn")
    )
