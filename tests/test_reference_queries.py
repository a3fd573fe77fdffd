"""End-to-end: synthetic L2+L1 event replay -> materialized state -> the
17-endpoint read-query library. This is the full reference lifecycle
(ingest -> state -> query) in one test module."""

from __future__ import annotations

import json
from datetime import datetime, timedelta
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from distribution_engine_smt_spark import queries, schemas, tables
from distribution_engine_smt_spark.processors import apply_l1_batch, apply_l2_batch

pytestmark = pytest.mark.slow  # reference-parity integration suite (multi-minute state fixture) -- full battery tier (VERDICT r12 #1); run with -m "slow or not slow"

NOW = datetime(2024, 1, 10, 0, 0, 0)
T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(event, **data):
    return {"contract": "comments", "event": event, "data": data}


@pytest.fixture(scope="module")
def state(spark):
    """Replay a small world: 3 posts (one cross-posted from hive), replies,
    votes, rewards, follows, reblogs, a muted account."""
    s = {name: tables.empty_table(spark, name) for name in schemas.STATE_TABLES}
    s["token_config"] = spark.createDataFrame(
        [("TKN", 7, 50, Decimal(1), Decimal(1), 0, None, "promo", 1, None, 5, 5, False, False)],
        schemas.TOKEN_CONFIG,
    )
    s["configuration"] = spark.createDataFrame(
        [(1, 100, NOW - timedelta(seconds=30), None, None, "HIVED"),
         (2, 900, NOW - timedelta(seconds=9), None, None, "ENGINE_SIDECHAIN")],
        schemas.CONFIGURATION,
    )

    def tx(i, block, ts, payload, logs, contract="comments", action="x", sender="s"):
        return (block, ts, i, contract, action, sender, f"t{block}-{i}", json.dumps(payload), json.dumps(logs))

    l2 = spark.createDataFrame(
        [
            tx(0, 1, T0, {"author": "alice", "permlink": "post1"}, {"events": [_ev("newComment", symbol="TKN")]}),
            tx(1, 1, T0, {"author": "bob", "permlink": "post2"}, {"events": [_ev("newComment", symbol="TKN")]}),
            tx(2, 1, T0, {"author": "troll", "permlink": "spam"}, {"events": [_ev("newComment", symbol="TKN")]}),
            tx(0, 2, T0 + timedelta(minutes=1), {"author": "carol", "permlink": "re-post1"}, {"events": [_ev("newComment", symbol="TKN")]}),
            # votes
            tx(0, 3, T0 + timedelta(minutes=5), {"author": "alice", "permlink": "post1", "voter": "bob", "weight": 10000},
               {"events": [_ev("newVote", symbol="TKN", rshares="100000")]}),
            tx(1, 3, T0 + timedelta(minutes=6), {"author": "bob", "permlink": "post2", "voter": "alice", "weight": 5000},
               {"events": [_ev("newVote", symbol="TKN", rshares="5000")]}),
            # rewards for alice's post
            tx(0, 4, T0 + timedelta(hours=1), {"author": "x", "permlink": "y"},
               {"events": [
                   _ev("curationReward", symbol="TKN", authorperm="@alice/post1", quantity="2.0", account="bob"),
                   _ev("authorReward", symbol="TKN", authorperm="@alice/post1", quantity="5.0", account="alice"),
               ]}),
            # mute the troll
            tx(0, 5, T0, {"account": "troll", "rewardPoolId": 1, "mute": True}, {}, action="setMute"),
        ],
        "blockNumber long, timestamp timestamp, tx_seq int, contract string, action string, sender string, transactionId string, payload string, logs string",
    )
    s = apply_l2_batch(s, l2)

    def l1op(i, block, ts, typ, **kw):
        return (
            block, i, ts, typ,
            kw.get("author"), kw.get("permlink"),
            kw.get("parent_author", ""), kw.get("parent_permlink", ""),
            kw.get("title"), kw.get("body"), kw.get("json_metadata"),
            kw.get("id"), json.dumps(kw["json"]) if "json" in kw else None,
            kw.get("posting", [kw.get("author") or "u"]), [],
        )

    l1 = spark.createDataFrame(
        [
            l1op(0, 10, T0, "comment", author="alice", permlink="post1",
                 parent_permlink="life", title="Alice Post", body="alice body text",
                 json_metadata=json.dumps({"tags": ["life", "tkn"]})),
            l1op(1, 10, T0, "comment", author="bob", permlink="post2",
                 parent_permlink="news", title="Bob Post", body="bob body",
                 json_metadata=json.dumps({"tags": ["news"]})),
            l1op(2, 10, T0 + timedelta(minutes=1), "comment", author="carol", permlink="re-post1",
                 parent_author="alice", parent_permlink="post1", body="nice post!",
                 json_metadata="{}"),
            l1op(3, 11, T0, "custom_json", id="follow", posting=["dave"],
                 json=["follow", {"follower": "dave", "following": "alice", "what": ["blog"]}]),
            l1op(4, 11, T0, "custom_json", id="reblog", posting=["dave"],
                 json=["reblog", {"account": "dave", "author": "bob", "permlink": "post2"}]),
        ],
        schemas.OPS_L1,
    )
    s = apply_l1_batch(s, l1)
    # materialize once: every query below reads this state
    return {k: v.localCheckpoint(eager=True) if not v.isEmpty() else v for k, v in s.items()}


def test_by_created(state):
    rows = queries.get_discussions_by_created(state, "tkn", now=NOW).collect()
    aps = [r["authorperm"] for r in rows]
    # main posts only, troll suppressed (muted account); equal created ->
    # deterministic authorperm tie-break puts alice first
    assert aps == ["@alice/post1", "@bob/post2"]
    assert rows[0]["title"] == "Alice Post"
    assert rows[0]["json_metadata"] is not None


def test_by_trending_and_payout(state):
    rows = queries.get_discussions_by_score(state, "TKN", "score_trend", now=NOW).collect()
    # alice got an authorReward -> rshares/score reset to 0; bob's live vote wins
    assert [r["authorperm"] for r in rows][0] == "@bob/post2"
    pay = queries.get_discussions_by_score(state, "TKN", "total_payout_value", now=NOW).collect()
    assert pay[0]["authorperm"] == "@alice/post1"
    assert pay[0]["total_payout_value"] == Decimal(7)


def test_keyset_anchor(state):
    rows = queries.get_discussions_by_score(
        state, "TKN", "score_trend", anchor_authorperm="@bob/post2", now=NOW
    ).collect()
    assert rows[0]["authorperm"] == "@bob/post2"


def test_blog_and_feed(state):
    blog = queries.get_discussions_by_blog(state, "TKN", "dave").collect()
    assert [r["authorperm"] for r in blog] == ["@bob/post2"]
    assert blog[0]["reblogged_by"] == "dave"
    # dave follows alice only -> feed shows alice's post (dave's own reblog
    # of bob's post does NOT feed himself — reblogs count when made by
    # accounts the viewer follows)
    feed = queries.get_discussions_by_feed(state, "TKN", "dave").collect()
    assert {r["authorperm"] for r in feed} == {"@alice/post1"}


def test_comments_and_replies(state):
    com = queries.get_discussions_by_comments(state, "TKN", "carol").collect()
    assert [r["authorperm"] for r in com] == ["@carol/re-post1"]
    rep = queries.get_discussions_by_replies(state, "TKN", "alice").collect()
    assert [r["authorperm"] for r in rep] == ["@carol/re-post1"]


def test_thread(state):
    t = queries.get_thread(state, "TKN", "@alice/post1").collect()
    assert [(r["authorperm"], r["depth"]) for r in t] == [("@alice/post1", 0), ("@carol/re-post1", 1)]


def test_trending_tags(state):
    tags = queries.get_trending_tags(state, "TKN", now=NOW).collect()
    by_tag = {r["tag"]: r["total_payout_value"] for r in tags}
    # alice's post carries tags life,tkn with 7.0 payout
    assert by_tag["life"] == Decimal(7) and by_tag["tkn"] == Decimal(7)


def test_follow_queries(state):
    fol = queries.get_following(state, "dave").collect()
    assert [r["following"] for r in fol] == ["alice"]
    cnt = queries.get_follow_count(state, "alice").collect()[0]
    assert cnt["follower_count"] == 1 and cnt["following_count"] == 0


def test_account_history(state):
    h = queries.get_account_history(state, "TKN", account="bob").collect()
    assert len(h) == 1 and h[0]["type"] == "curation_reward" and h[0]["quantity"] == Decimal(2)
    h2 = queries.get_account_history(state, "TKN", author="alice").collect()
    assert {r["account"] for r in h2} == {"bob", "alice"}


def test_account_map_and_post_votes(state):
    m = queries.get_account_map(state, "troll").collect()
    assert m[0]["muted"] is True
    pv = queries.get_post_with_votes(state, "TKN", "@alice/post1").collect()[0]
    assert pv["vote_count"] == 1
    assert pv["active_votes"][0]["voter"] == "bob"


def test_state_lag(state):
    lag = {r["name"]: r["lag_seconds"] for r in queries.get_state_lag(state, now=NOW).collect()}
    assert lag == {"HIVED": 30, "ENGINE_SIDECHAIN": 9}


def test_api_edge_formatting(state):
    df = queries.get_discussions_by_blog(state, "TKN", "dave")
    shaped = queries.format_discussion_rows(df)
    rows = shaped.collect()
    assert rows and rows[0]["author"] == "bob" and rows[0]["permlink"] == "post2"
    assert rows[0]["hive"] is False
    assert rows[0]["reblogged_by"] == ["dave"]
    assert rows[0]["created"].startswith("2024-01-01T")
    js = queries.to_json_rows(shaped, limit=10)
    import json as _json

    parsed = _json.loads(js[0])
    assert parsed["authorperm"] == "@bob/post2"
