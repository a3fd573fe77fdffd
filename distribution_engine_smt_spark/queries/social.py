"""Follow / tag queries (reference: engine/follow_storage.py:68-110,
engine/post_storage.py:403-405; endpoints server/app.py:874-980)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_following(
    state: dict[str, DataFrame],
    account: str,
    start_name: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """Accounts ``account`` follows (state=1), keyset-paged by name
    (reference: follow_storage.py:68-88, server/app.py:930-962)."""
    df = state["follows"].filter(
        (F.col("follower") == account) & (F.col("state") == 1)
    )
    if start_name:
        df = df.filter(F.col("following") >= start_name)
    return df.select("follower", "following").orderBy(F.col("following").asc()).limit(limit)


def get_follow_count(state: dict[str, DataFrame], account: str) -> DataFrame:
    """One aggregation pass for both counts (reference runs two scalar
    queries — follow_storage.py:90-110, A4)."""
    f = state["follows"].filter(F.col("state") == 1)
    return (
        f.select(
            F.when(F.col("follower") == account, F.lit(1)).alias("fg"),
            F.when(F.col("following") == account, F.lit(1)).alias("fr"),
        )
        .agg(
            F.count("fg").alias("following_count"),
            F.count("fr").alias("follower_count"),
        )
        .withColumn("account", F.lit(account))
    )


def get_trending_tags(
    state: dict[str, DataFrame], token: str, limit: int = 20, now: datetime | None = None
) -> DataFrame:
    """Explode tags CSV, sum payouts over the 2-week cashout window, top-k
    (reference: engine/post_storage.py:403-405; A3). Payout sums stay in
    decimal — exact at any scale."""
    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    cutoff = now - timedelta(days=14)
    return (
        state["posts"]
        .filter((F.col("token") == token.upper()) & (F.col("cashout_time") > F.lit(cutoff)))
        .select(
            F.explode(F.split(F.col("tags"), ",")).alias("tag"),
            F.col("total_payout_value").alias("tpv"),
        )
        .filter(F.col("tag") != "")
        .groupBy("tag")
        .agg(F.sum("tpv").alias("total_payout_value"))
        .orderBy(F.col("total_payout_value").desc(), F.col("tag").asc())
        .limit(limit)
    )
