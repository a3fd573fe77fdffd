"""Discussion list queries (reference: engine/post_storage.py:171-401,
server/app.py:534-871).

Shared semantics across the family:
- muted suppression (P4): posts ⟕ accounts on (author=name, token=symbol);
  a post passes when post.muted is false AND (no account row OR account not
  muted) — reference: post_storage.py:189.
- hive_select (P5): authorperm LIKE 'h@%' toggles cross-posts —
  post_storage.py:182-186.
- 30-day scan bound (P2): created >= now-30d — post_storage.py:171-173.
- metadata join (J2): pulls json_metadata per row.
- deterministic tie-break: every sort ends in authorperm
  (SURVEY.md §7 #6; the reference leaves ties to Postgres).

Plan shape at scale: posts is token-partitioned parquet, so token equality
prunes partitions; accounts/follows broadcast; top-k is TakeOrdered.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCORE_KEYS = ("score_trend", "score_hot", "vote_rshares", "promoted", "total_payout_value")


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def _visible(posts: DataFrame, accounts: DataFrame) -> DataFrame:
    """Muted suppression via broadcast left join (J1 + P4)."""
    acc = F.broadcast(
        accounts.select(
            F.col("name").alias("author"),
            F.col("symbol").alias("token"),
            F.col("muted").alias("__acct_muted"),
        )
    )
    return (
        posts.join(acc, ["author", "token"], "left")
        .filter(
            (F.coalesce(F.col("muted"), F.lit(False)) == F.lit(False))
            & (F.coalesce(F.col("__acct_muted"), F.lit(False)) == F.lit(False))
        )
        .drop("__acct_muted")
    )


def _hive_select(df: DataFrame, hive_select: str) -> DataFrame:
    """'include' (default), 'exclude' (no h@ cross-posts), 'only'."""
    if hive_select == "exclude":
        return df.filter(~F.col("authorperm").startswith("h@"))
    if hive_select == "only":
        return df.filter(F.col("authorperm").startswith("h@"))
    return df


def _with_metadata(df: DataFrame, post_metadata: DataFrame) -> DataFrame:
    return df.join(
        post_metadata.select("authorperm", "json_metadata"), "authorperm", "left"
    )


def _topk_with_metadata(
    df: DataFrame, post_metadata: DataFrame, order_cols, limit: int
) -> DataFrame:
    """Top-k FIRST, metadata join on the k survivors (VERDICT r7 #9):
    the J2 join is key-unique (one metadata row per authorperm), so
    joining after the ``orderBy().limit()`` boundary is semantically
    identical to joining the whole 30-day window — but the join now
    touches k rows instead of the window (at 100x the window is the
    scan, and with post_metadata bucketed by authorperm the k-row probe
    is shuffle-free on the metadata side). The final orderBy re-sorts
    only the k joined rows."""
    top = df.orderBy(*order_cols).limit(limit)
    return _with_metadata(top, post_metadata).orderBy(*order_cols)


def get_discussions_by_created(
    state: dict[str, DataFrame],
    token: str,
    limit: int = 20,
    tag: str | None = None,
    anchor_ts=None,
    hive_select: str = "include",
    main_post: bool = True,
    now: datetime | None = None,
) -> DataFrame:
    """reference: engine/post_storage.py:171-189, server/app.py:599-639."""
    now = now or _now()
    cutoff = now - timedelta(days=30)
    df = state["posts"].filter(
        (F.col("token") == token.upper())
        & (F.col("main_post") == main_post)
        & (F.col("created") >= F.lit(cutoff))
    )
    # `is not None`, not truthiness: the reference applies the tag clause for
    # tag="" too (post_storage.py:178 `if tag is not None`; Flask passes
    # blank query values through), so ?tag= filters to tags containing ""
    if tag is not None:
        df = df.filter(F.array_contains(F.split(F.col("tags"), ","), tag))
    if anchor_ts is not None:
        df = df.filter(F.col("created") <= F.lit(anchor_ts))
    df = _hive_select(_visible(df, state["accounts"]), hive_select)
    return _topk_with_metadata(
        df, state["post_metadata"],
        [F.col("created").desc(), F.col("authorperm").asc()], limit,
    )


def get_discussions_by_score(
    state: dict[str, DataFrame],
    token: str,
    score_key: str = "score_trend",
    limit: int = 20,
    tag: str | None = None,
    anchor_authorperm: str | None = None,
    hive_select: str = "include",
    now: datetime | None = None,
    main_post: bool = True,
) -> DataFrame:
    """by_trending / by_hot / by_promoted / by_payout (reference:
    engine/post_storage.py:360-401, server/app.py:642-709). Keyset bound via
    scalar aggregate broadcast (J8). ``main_post=False`` is the
    get_comment_discussions_by_payout variant (reference:
    post_storage.py main_post flag threaded from app.py:642)."""
    assert score_key in SCORE_KEYS, score_key
    now = now or _now()
    cutoff = now - timedelta(days=30)
    posts = state["posts"]
    df = posts.filter(
        (F.col("token") == token.upper())
        & (F.col("main_post") == F.lit(main_post))
        & (F.col("created") >= F.lit(cutoff))
    )
    if score_key == "promoted":
        # promoted list: pending + actually-promoted only
        # (post_storage.py:386-387)
        df = df.filter(
            (F.col("promoted") > 0)
            & (F.col("last_payout") == F.lit(datetime(1970, 1, 1)))
        )
    if tag is not None:  # matches reference's tag="" semantics (see by_created)
        df = df.filter(F.array_contains(F.split(F.col("tags"), ","), tag))
    if anchor_authorperm:
        anchor = posts.filter(
            (F.col("token") == token.upper())
            & F.col("authorperm").isin(anchor_authorperm, f"h{anchor_authorperm}")
        ).agg(F.max(score_key).alias("__bound"))
        df = df.crossJoin(F.broadcast(anchor)).filter(
            F.col(score_key) <= F.col("__bound")
        ).drop("__bound")
    df = _hive_select(_visible(df, state["accounts"]), hive_select)
    return _topk_with_metadata(
        df, state["post_metadata"],
        [F.col(score_key).desc(), F.col("authorperm").asc()], limit,
    )


def _reblog_union_index(
    posts: DataFrame, reblogs: DataFrame, account_filter: Column
) -> DataFrame:
    """U1+A1: authored ∪ reblogged -> earliest display time + rebloggers CSV
    per authorperm (reference: engine/post_storage.py:230,338). string_agg
    order is pinned (sorted) for determinism."""
    authored = posts.filter(account_filter).select(
        "authorperm", F.col("created").alias("t"), F.lit(None).cast("string").alias("account")
    )
    reblogged = reblogs.select(
        "authorperm", F.col("timestamp").alias("t"), "account"
    )
    u = authored.unionByName(reblogged)
    return u.groupBy("authorperm").agg(
        F.min("t").alias("display_t"),
        F.concat_ws(
            ",", F.array_sort(F.collect_list("account"))
        ).alias("reblogged_by"),
    )


def get_discussions_by_blog(
    state: dict[str, DataFrame],
    token: str,
    account: str,
    limit: int = 20,
    anchor_ts=None,
    hive_select: str = "include",
) -> DataFrame:
    """reference: engine/post_storage.py:211-230, server/app.py:712-771:
    account's own main posts ∪ posts they reblogged, by earliest of
    (created, reblog time)."""
    posts = state["posts"].filter(
        (F.col("token") == token.upper()) & (F.col("main_post") == F.lit(True))
    )
    reblogs = state["reblogs"].filter(F.col("account") == account)
    idx = _reblog_union_index(posts, reblogs, F.col("author") == account)
    df = posts.join(idx, "authorperm", "inner").filter(
        # self-reblogs don't duplicate (J3 residual r.account != p.author)
        (F.col("reblogged_by") == "") | (F.col("reblogged_by") != F.col("author"))
    )
    if anchor_ts is not None:
        df = df.filter(F.col("display_t") <= F.lit(anchor_ts))
    df = _hive_select(_visible(df, state["accounts"]), hive_select)
    return _topk_with_metadata(
        df, state["post_metadata"],
        [F.col("display_t").desc(), F.col("authorperm").asc()], limit,
    )


def get_discussions_by_feed(
    state: dict[str, DataFrame],
    token: str,
    account: str,
    limit: int = 20,
    anchor_ts=None,
    hive_select: str = "include",
) -> DataFrame:
    """reference: engine/post_storage.py:313-338, server/app.py:534-596:
    posts authored or reblogged by accounts the viewer follows (state=1)."""
    following = (
        state["follows"]
        .filter((F.col("follower") == account) & (F.col("state") == 1))
        .select(F.col("following"))
    )
    posts = state["posts"].filter(
        (F.col("token") == token.upper()) & (F.col("main_post") == F.lit(True))
    )
    followed_posts = posts.join(
        F.broadcast(following.withColumnRenamed("following", "author")),
        "author",
        "left_semi",
    )
    followed_reblogs = state["reblogs"].join(
        F.broadcast(following.withColumnRenamed("following", "account")),
        "account",
        "left_semi",
    )
    idx = _reblog_union_index(
        followed_posts, followed_reblogs, F.lit(True)
    )
    df = posts.join(idx, "authorperm", "inner")
    if anchor_ts is not None:
        df = df.filter(F.col("display_t") <= F.lit(anchor_ts))
    df = _hive_select(_visible(df, state["accounts"]), hive_select)
    return _topk_with_metadata(
        df, state["post_metadata"],
        [F.col("display_t").desc(), F.col("authorperm").asc()], limit,
    )


def get_discussions_by_comments(
    state: dict[str, DataFrame], token: str, account: str, limit: int = 20, anchor_ts=None
) -> DataFrame:
    """The account's comments, newest first (reference: server/app.py:774-821)."""
    df = state["posts"].filter(
        (F.col("token") == token.upper())
        & (F.col("main_post") == F.lit(False))
        & (F.col("author") == account)
    )
    if anchor_ts is not None:
        df = df.filter(F.col("created") <= F.lit(anchor_ts))
    return _topk_with_metadata(
        _visible(df, state["accounts"]), state["post_metadata"],
        [F.col("created").desc(), F.col("authorperm").asc()], limit,
    )


def get_discussions_by_replies(
    state: dict[str, DataFrame], token: str, account: str, limit: int = 20, anchor_ts=None
) -> DataFrame:
    """Replies TO the account's posts, excluding self-replies (reference:
    server/app.py:824-871; P7 parent_author in + P8 author not in)."""
    df = state["posts"].filter(
        (F.col("token") == token.upper())
        & (F.col("main_post") == F.lit(False))
        & (F.col("parent_author") == account)
        & (F.col("author") != account)
    )
    if anchor_ts is not None:
        df = df.filter(F.col("created") <= F.lit(anchor_ts))
    return _topk_with_metadata(
        _visible(df, state["accounts"]), state["post_metadata"],
        [F.col("created").desc(), F.col("authorperm").asc()], limit,
    )
