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

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"

# Session conf governing the ingestion folds' salting (see hot_key_aggregate).
SALT_BUCKETS_CONF = "spark.engine.skew.saltBuckets"
DEFAULT_SALT_BUCKETS = 16

AggSpec = dict[str, tuple[Union[str, Column], str]]


def _agg_exprs(aggs: AggSpec) -> tuple[list[Column], list[Column]]:
    """Build (partial, final) aggregate expression lists for a two-phase
    decomposable aggregation. ``aggs`` maps output column -> (input, fn)
    with fn in {'sum', 'count', 'min', 'max'} and input a column name, a
    Column expression (conditional sums etc.), or '*' for count."""
    partial_cols: list[Column] = []
    final_cols: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            src = F.lit(1) if isinstance(col, str) and col == "*" else col
            partial_cols.append(F.count(src).alias(out))
            final_cols.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            partial_cols.append(getattr(F, fn)(col).alias(out))
            final_cols.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    return partial_cols, final_cols


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: AggSpec,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column or Column expression, fn)
    with fn in {'sum', 'count', 'min', 'max'} (the decomposable aggregates;
    avg is sum/count at the call site). Example::

        salted_aggregate(votes, ["authorperm", "token"],
                         {"rshares_sum": ("rshares", "sum"),
                          "n": ("*", "count")})
    """
    keys = list(keys)
    salted = df.withColumn(SALT, (F.rand(seed=42) * buckets).cast("int"))
    partial_cols, final_cols = _agg_exprs(aggs)
    partial = salted.groupBy(*keys, SALT).agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)


def hot_key_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: AggSpec,
    buckets: int | None = None,
) -> DataFrame:
    """Ingestion-fold aggregation with skew salting on by default.

    The hot-key folds (vote deltas, reply counters, reward accumulation —
    processors/l1.py, l2.py) group by authorperm: one viral post at 100 TB
    sends every one of its votes/replies through a single reducer under a
    plain ``groupBy``. This routes them through :func:`salted_aggregate`.

    ``buckets=None`` reads the session conf ``spark.engine.skew.saltBuckets``
    (default 16); ``<= 1`` (via arg or conf) selects the plain single-phase
    plan. The switch is a session conf rather than a per-batch row-count
    threshold deliberately: counting the batch to decide would cost a
    driver-side job per micro-batch, while the salted plan's overhead on a
    small batch is one extra exchange carrying at most
    ``distinct_keys x buckets`` pre-aggregated rows — noise. Salting is
    therefore always-on; flip the conf to 1 to A/B the plain plan.
    """
    if buckets is None:
        buckets = int(df.sparkSession.conf.get(SALT_BUCKETS_CONF, str(DEFAULT_SALT_BUCKETS)))
    if buckets <= 1:
        partial_cols, _ = _agg_exprs(aggs)
        return df.groupBy(*list(keys)).agg(*partial_cols)
    return salted_aggregate(df, keys, aggs, buckets)


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
