"""Account / history / state queries (reference: server/app.py:83-353,
engine/account_history_storage.py:76-175)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def get_account_history(
    state: dict[str, DataFrame],
    token: str,
    account: str | None = None,
    author: str | None = None,
    type_filter: str | None = None,
    limit: int = 20,
    offset: int = 0,
) -> DataFrame:
    """Newest-first history page with the reference's client-side offset
    emulation done in-plan (reference: account_history_storage.py:76-175;
    T5/T6/J9). Limit clamps at 1000."""
    limit = min(int(limit), 1000)
    df = state["account_history"].filter(F.col("token") == token.upper())
    if account:
        df = df.filter(F.col("account") == account)
    if author:
        # author column derived from authorperm (J9 denormalized filter)
        from ..functions import resolve_author

        df = df.filter(resolve_author(F.col("authorperm")) == author)
    if type_filter:
        df = df.filter(F.col("type") == type_filter)
    order = [F.col("id").desc()]
    head = df.orderBy(*order).limit(limit + offset)
    w = Window.orderBy(*order)
    return (
        head.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > offset)
        .drop("__rn")
    )


def get_account_map(state: dict[str, DataFrame], account: str) -> DataFrame:
    """Per-token account state (reference: server/app.py:287-311)."""
    return (
        state["accounts"]
        .filter(F.col("name") == account)
        .orderBy(F.col("symbol").asc())
    )


def get_post_with_votes(
    state: dict[str, DataFrame], token: str, authorperm: str
) -> DataFrame:
    """One post + its votes aggregated in the same plan — the reference's
    N+1 per-post vote query collapsed (reference: server/app.py:314-353,
    407-423; J6). Votes cast after cashout are hidden (F16)."""
    p = state["posts"].filter(
        (F.col("token") == token.upper()) & (F.col("authorperm") == authorperm)
    )
    v = state["votes"].filter(
        (F.col("token") == token.upper()) & (F.col("authorperm") == authorperm)
    )
    vote_structs = (
        v.join(p.select("authorperm", "cashout_time"), "authorperm", "left_semi")
        .join(p.select("authorperm", "cashout_time"), "authorperm")
        .filter(F.col("timestamp") <= F.col("cashout_time"))
        .groupBy("authorperm")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("voter", "rshares", "percent", "timestamp"))
            ).alias("active_votes"),
            F.count("*").alias("vote_count"),
        )
    )
    return p.join(vote_structs, "authorperm", "left").withColumn(
        "vote_count", F.coalesce(F.col("vote_count"), F.lit(0))
    )


def get_state_lag(state: dict[str, DataFrame], now: datetime | None = None) -> DataFrame:
    """Stream lag metric (reference: server/app.py:83-121; F18): seconds
    since each chain's last streamed timestamp."""
    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    cfg = state["configuration"]
    return cfg.select(
        "id",
        "name",
        "last_streamed_block",
        "last_streamed_timestamp",
        F.timestamp_diff(
            "SECOND", F.col("last_streamed_timestamp"), F.lit(now)
        ).alias("lag_seconds"),
    ).orderBy("id")


def get_token_config(state: dict[str, DataFrame], token: str | None = None) -> DataFrame:
    """/config and the indexed part of /info (reference:
    server/app.py:125-222): token_config lookup or full scan. The external
    reward-pool RPC enrichment of /info is out of engine scope (S9)."""
    df = state["token_config"]
    if token:
        df = df.filter(F.col("token") == token.upper())
    return df.orderBy(F.col("token").asc())
