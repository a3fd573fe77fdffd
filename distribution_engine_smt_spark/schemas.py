"""Explicit schemas for the engine's state tables and event streams.

Mirrors the reference DDL (reference: sql/engine.sql:3-165) and the two
event-stream shapes (reference: stream_blocks.py:225-257,
stream_engine_sidechain_blocks.py:44-98), re-typed for Spark per
SURVEY.md §1.2:

- Postgres ``numeric`` (unbounded)  -> DecimalType(38, 10)  (documented cap)
- ``timestamp`` (naive, UTC)        -> TimestampType with session TZ = UTC
- ``character varying(N)`` / text   -> StringType
- ``smallint``                      -> ShortType
- ``real`` (lossy scores)           -> DoubleType (scores are recomputed
  Column expressions here; double keeps ordering stable across engines)

The reference stores ``tags`` as a comma-separated varchar and queries it
with STRING_TO_ARRAY (sql/engine.sql:82, engine/post_storage.py:179); we keep
the CSV string column for wire compatibility and split on demand.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

NUMERIC = DecimalType(38, 10)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- state tables (reference: sql/engine.sql) --------------------------------

# key (authorperm, token)  [reference: sql/engine.sql:77-116, post_storage.py:35]
POSTS = _st(
    ("authorperm", StringType()),
    ("author", StringType()),
    ("created", TimestampType()),
    ("tags", StringType()),
    ("app", StringType()),
    ("main_post", BooleanType()),
    ("decline_payout", BooleanType()),
    ("token", StringType()),
    ("vote_rshares", NUMERIC),
    ("cashout_time", TimestampType()),
    ("last_payout", TimestampType()),
    ("total_payout_value", NUMERIC),
    ("curator_payout_value", NUMERIC),
    ("score_trend", DoubleType()),
    ("score_hot", DoubleType()),
    ("beneficiaries_payout_value", LongType()),
    ("promoted", NUMERIC),
    ("title", StringType()),
    ("desc", StringType()),
    ("children", IntegerType()),
    ("parent_author", StringType()),
    ("parent_permlink", StringType()),
    ("score_promoted", DoubleType()),
    ("muted", BooleanType()),
)

# key (authorperm)  [reference: sql/engine.sql:61-74, post_metadata_storage.py:33]
POST_METADATA = _st(
    ("authorperm", StringType()),
    ("body", StringType()),
    ("json_metadata", StringType()),
    ("tags", StringType()),
    ("children", IntegerType()),
    ("parent_authorperm", StringType()),
    ("url", StringType()),
    ("depth", ShortType()),
)

# key (authorperm, token, voter)  [reference: sql/engine.sql:151-162, vote_storage.py:24]
VOTES = _st(
    ("authorperm", StringType()),
    ("voter", StringType()),
    ("timestamp", TimestampType()),
    ("token", StringType()),
    ("rshares", NUMERIC),
    ("percent", ShortType()),
)

# key (name, symbol)  [reference: sql/engine.sql:19-28, account_storage.py:38]
ACCOUNTS = _st(
    ("name", StringType()),
    ("symbol", StringType()),
    ("last_post", TimestampType()),
    ("last_root_post", TimestampType()),
    ("muted", BooleanType()),
    ("last_follow_refresh_time", TimestampType()),
)

# key (follower, following); state 0 none / 1 follow / 2 mute
# [reference: sql/engine.sql:50-58, follow_storage.py:33-38]
FOLLOWS = _st(
    ("follower", StringType()),
    ("following", StringType()),
    ("state", ShortType()),
)

# key (account, authorperm)  [reference: sql/engine.sql:119-128, reblog_storage.py:33]
REBLOGS = _st(
    ("account", StringType()),
    ("authorperm", StringType()),
    ("timestamp", TimestampType()),
)

# append log with monotonic id  [reference: sql/engine.sql:3-16,
# account_history_storage.py:30-38 — prod table has a dataset-added serial id]
ACCOUNT_HISTORY = _st(
    ("id", LongType()),
    ("account", StringType()),
    ("token", StringType()),
    ("timestamp", TimestampType()),
    ("quantity", NUMERIC),
    ("trx", StringType()),
    ("type", StringType()),
    ("authorperm", StringType()),
)

# key (token)  [reference: sql/engine.sql:131-148, token_config_storage.py:52]
TOKEN_CONFIG = _st(
    ("token", StringType()),
    ("cashout_window_days", IntegerType()),
    ("curation_reward_percentage", IntegerType()),
    ("author_curve_exponent", DecimalType(10, 4)),
    ("curation_curve_exponent", DecimalType(10, 4)),
    ("beneficiaries_reward_percentage", IntegerType()),
    ("beneficiaries_account", StringType()),
    ("promoted_post_account", StringType()),
    ("reward_pool_id", IntegerType()),
    ("token_account", StringType()),
    ("vote_regeneration_days", IntegerType()),
    ("downvote_regeneration_days", IntegerType()),
    ("disable_downvoting", BooleanType()),
    ("ignore_decline_payout", BooleanType()),
)

# key (id); rows 1=HIVED, 2=ENGINE_SIDECHAIN  [reference: sql/engine.sql:35-48]
CONFIGURATION = _st(
    ("id", IntegerType()),
    ("last_streamed_block", LongType()),
    ("last_streamed_timestamp", TimestampType()),
    ("last_engine_streamed_block", LongType()),
    ("last_engine_streamed_timestamp", TimestampType()),
    ("name", StringType()),
)

STATE_TABLES: dict[str, StructType] = {
    "posts": POSTS,
    "post_metadata": POST_METADATA,
    "votes": VOTES,
    "accounts": ACCOUNTS,
    "follows": FOLLOWS,
    "reblogs": REBLOGS,
    "account_history": ACCOUNT_HISTORY,
    "token_config": TOKEN_CONFIG,
    "configuration": CONFIGURATION,
}

# Upsert keys per table (reference DAO layer, SURVEY.md §1.3).
UPSERT_KEYS: dict[str, list[str]] = {
    "posts": ["authorperm", "token"],
    "post_metadata": ["authorperm"],
    "votes": ["authorperm", "token", "voter"],
    "accounts": ["name", "symbol"],
    "follows": ["follower", "following"],
    "reblogs": ["account", "authorperm"],
    "account_history": ["token", "account", "id"],
    "token_config": ["token"],
    "configuration": ["id"],
}


# --- event streams (reference: stream shapes, FIXTURES.md §2) ----------------

# Hive L1 op log: one row per op, with block/seq ordering columns injected
# [reference: stream_blocks.py:225-234,250-257]
OPS_L1 = _st(
    ("block_num", LongType()),
    ("op_seq", IntegerType()),
    ("timestamp", TimestampType()),
    ("type", StringType()),           # comment | custom_json | delete_comment
    ("author", StringType()),
    ("permlink", StringType()),
    ("parent_author", StringType()),
    ("parent_permlink", StringType()),
    ("title", StringType()),
    ("body", StringType()),
    ("json_metadata", StringType()),
    ("id", StringType()),             # custom_json id: follow | reblog | ...
    ("json", StringType()),           # custom_json payload
    ("required_posting_auths", ArrayType(StringType())),
    ("required_auths", ArrayType(StringType())),
)

# Engine sidechain (L2) transaction log: one row per transaction
# [reference: stream_engine_sidechain_blocks.py:44-98]
TXS_L2 = _st(
    ("blockNumber", LongType()),
    ("timestamp", TimestampType()),
    ("tx_seq", IntegerType()),
    ("contract", StringType()),       # comments | tokens | ...
    ("action", StringType()),
    ("sender", StringType()),
    ("transactionId", StringType()),
    ("payload", StringType()),        # JSON string
    ("logs", StringType()),           # JSON: {"errors": [...]} | {"events": [...]}
)

# Parsed shape of one L2 log event after explode
# [reference: processors/engine_comments_contract_processor.py:51-54]
L2_EVENT = _st(
    ("contract", StringType()),
    ("event", StringType()),          # newComment | newVote | updateVote | ...
    ("data", StringType()),           # kept as JSON string; fields pulled on demand
)
