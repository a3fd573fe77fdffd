"""Skew-mitigation primitives for hot keys.

At 100 TB a handful of keys (viral posts' votes, a mega-tag, one token's
account_history) can dwarf every other partition. AQE's skew-join splitting
handles the JOIN case automatically; these helpers cover the two cases AQE
does not:

- ``salted_aggregate``: two-phase aggregation for skewed groupBy keys —
  partial-aggregate on (key, salt), then final-aggregate on key. The first
  shuffle spreads a hot key over ``buckets`` reducers.
- ``salted_broadcast_left``: replicate a small/medium build side ``buckets``
  times so a hot probe key hashes across executors even when the join can't
  broadcast outright (e.g. medium dimension + extreme fact skew).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the decomposable aggregates; avg is
    sum/count at the call site). Example::

        salted_aggregate(votes, ["authorperm", "token"],
                         {"rshares_sum": ("rshares", "sum"),
                          "n": ("*", "count")})
    """
    keys = list(keys)
    salted = df.withColumn(SALT, (F.rand(seed=42) * buckets).cast("int"))

    partial_cols = []
    final_cols = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_cols.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
            final_cols.append(F.sum(out).alias(out))
        elif fn == "sum":
            partial_cols.append(F.sum(col).alias(out))
            final_cols.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_cols.append(F.min(col).alias(out))
            final_cols.append(F.min(out).alias(out))
        elif fn == "max":
            partial_cols.append(F.max(col).alias(out))
            final_cols.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    partial = salted.groupBy(*keys, SALT).agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "left",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with the fact side salted and the
    dim side replicated ``buckets`` times, so one hot fact key spreads over
    ``buckets`` shuffle partitions instead of one reducer."""
    on = list(on)
    f = fact.withColumn(SALT, (F.rand(seed=42) * buckets).cast("int"))
    d = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, on + [SALT], how).drop(SALT)
