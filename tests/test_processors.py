"""Replay tests for the ingestion processors: synthetic op-log fixtures ->
processors -> expected table snapshots (SURVEY.md §5). Covers the L2 event
loop (newComment, votes with rshares deltas, reward accumulation, pools,
mutes, promotions) and the L1 comment/follow/reblog/delete path, including
batch determinism."""

from __future__ import annotations

import json
from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from distribution_engine_smt_spark import schemas, tables
from distribution_engine_smt_spark.processors import apply_l1_batch, apply_l2_batch

T0 = datetime(2024, 1, 1, 12, 0, 0)
T1 = datetime(2024, 1, 1, 12, 0, 3)
T2 = datetime(2024, 1, 1, 12, 0, 6)


pytestmark = pytest.mark.slow  # L1/L2 batch-processor soaks over the state fixture -- full battery tier (VERDICT r12 #1); run with -m "slow or not slow"

@pytest.fixture()
def state(spark):
    s = {name: tables.empty_table(spark, name) for name in schemas.STATE_TABLES}
    s["token_config"] = spark.createDataFrame(
        [("TKN", 7, 50, Decimal(1), Decimal(1), 0, None, "promo-acct", 1, None, 5, 5, False, False)],
        schemas.TOKEN_CONFIG,
    )
    return s


def _tx(spark, rows):
    df = spark.createDataFrame(
        [
            (
                r.get("block", 1),
                r.get("ts", T0),
                r.get("tx_seq", i),
                r.get("contract", "comments"),
                r.get("action", "vote"),
                r.get("sender", "someone"),
                r.get("trx", f"tx{i}"),
                json.dumps(r["payload"]),
                json.dumps(r["logs"]),
            )
            for i, r in enumerate(rows)
        ],
        "blockNumber long, timestamp timestamp, tx_seq int, contract string, action string, sender string, transactionId string, payload string, logs string",
    )
    return df


def _ev(contract, event, **data):
    return {"contract": contract, "event": event, "data": data}


def test_new_comment_and_vote_flow(spark, state):
    txs = _tx(
        spark,
        [
            {  # newComment creates the post
                "payload": {"author": "alice", "permlink": "p1"},
                "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]},
                "ts": T0,
            },
            {  # alice's post gets a vote
                "payload": {"author": "alice", "permlink": "p1", "voter": "bob", "weight": 10000},
                "logs": {"events": [_ev("comments", "newVote", symbol="TKN", rshares="1000")]},
                "ts": T1,
                "tx_seq": 1,
            },
        ],
    )
    out = apply_l2_batch(state, txs)
    posts = out["posts"].collect()
    assert len(posts) == 1
    p = posts[0]
    assert p["authorperm"] == "@alice/p1" and p["token"] == "TKN"
    assert p["created"] == T0
    assert p["cashout_time"] == datetime(2024, 1, 8, 12, 0, 0)  # +7 days
    assert p["vote_rshares"] == Decimal(1000)
    # score = log10(1000) + epoch(T1)/480000
    assert p["score_trend"] == pytest.approx(3.0 + T1.timestamp() / 480000, rel=1e-12)
    votes = out["votes"].collect()
    assert len(votes) == 1 and votes[0]["voter"] == "bob" and votes[0]["percent"] == 10000


def test_update_vote_delta_not_double_count(spark, state):
    base = _tx(
        spark,
        [
            {"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}},
            {"payload": {"author": "a", "permlink": "p", "voter": "v", "weight": 100}, "logs": {"events": [_ev("comments", "newVote", symbol="TKN", rshares="500")]}, "tx_seq": 1},
        ],
    )
    s1 = apply_l2_batch(state, base)
    # same voter updates the vote in a later batch: delta = 200 - 500
    upd = _tx(
        spark,
        [{"payload": {"author": "a", "permlink": "p", "voter": "v", "weight": 100}, "logs": {"events": [_ev("comments", "updateVote", symbol="TKN", rshares="200")]}, "block": 2, "ts": T2}],
    )
    s2 = apply_l2_batch(s1, upd)
    p = s2["posts"].collect()[0]
    assert p["vote_rshares"] == Decimal(200)
    v = s2["votes"].collect()
    assert len(v) == 1 and v[0]["rshares"] == Decimal(200)


def test_vote_before_and_update_same_batch(spark, state):
    txs = _tx(
        spark,
        [
            {"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}},
            {"payload": {"author": "a", "permlink": "p", "voter": "v", "weight": 1}, "logs": {"events": [_ev("comments", "newVote", symbol="TKN", rshares="500")]}, "tx_seq": 1},
            {"payload": {"author": "a", "permlink": "p", "voter": "v", "weight": 1}, "logs": {"events": [_ev("comments", "updateVote", symbol="TKN", rshares="300")]}, "tx_seq": 2},
        ],
    )
    out = apply_l2_batch(state, txs)
    # net effect = last value only (intermediate 500 cancels)
    assert out["posts"].collect()[0]["vote_rshares"] == Decimal(300)


def test_reward_accumulation_and_history(spark, state):
    setup = _tx(
        spark,
        [{"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}}],
    )
    s1 = apply_l2_batch(state, setup)
    rewards = _tx(
        spark,
        [
            {
                "payload": {"author": "x", "permlink": "y"},
                "logs": {
                    "events": [
                        _ev("comments", "curationReward", symbol="TKN", authorperm="@a/p", quantity="1.5", account="curator1"),
                        _ev("comments", "curationReward", symbol="TKN", authorperm="@a/p", quantity="2.5", account="curator2"),
                        _ev("comments", "authorReward", symbol="TKN", authorperm="@a/p", quantity="6.0", account="a"),
                    ]
                },
                "block": 2,
                "ts": T1,
            }
        ],
    )
    s2 = apply_l2_batch(s1, rewards)
    p = s2["posts"].collect()[0]
    assert p["total_payout_value"] == Decimal("10.0")
    assert p["curator_payout_value"] == Decimal("4.0")
    assert p["last_payout"] == T1
    assert p["vote_rshares"] == Decimal(0) and p["score_trend"] == 0.0
    hist = sorted(s2["account_history"].collect(), key=lambda r: r["id"])
    assert [h["account"] for h in hist] == ["curator1", "curator2", "a"]
    assert [h["type"] for h in hist] == ["curation_reward", "curation_reward", "author_reward"]
    # ids: unique, and ORDER BY id equals event order (the DAO contract —
    # reference: engine/account_history_storage.py:72-74 needs monotonicity,
    # not density; ids derive from (block, tx, event) coordinates map-side)
    ids = [h["id"] for h in hist]
    assert len(set(ids)) == 3 and ids == sorted(ids)


def test_bulk_payout_tx_ids_unique_across_tx_boundary(spark, state):
    """A bulk payout tx with >1000 events (curationReward per voter on a
    viral post — the catch-up scenario) must not collide with the next
    transaction's id slot.  Regression: id = seq*1000 + ev_seq made
    tx N's event 1000 equal tx N+1's event 0."""
    setup = _tx(
        spark,
        [{"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}}],
    )
    s1 = apply_l2_batch(state, setup)
    bulk = [
        _ev("comments", "curationReward", symbol="TKN", authorperm="@a/p",
            quantity="0.1", account=f"curator{i:04d}")
        for i in range(1100)
    ]
    rewards = _tx(
        spark,
        [
            {"payload": {}, "logs": {"events": bulk}, "block": 2, "ts": T1, "tx_seq": 0},
            {
                "payload": {},
                "logs": {"events": [_ev("comments", "authorReward", symbol="TKN", authorperm="@a/p", quantity="6.0", account="a")]},
                "block": 2,
                "ts": T1,
                "tx_seq": 1,
            },
        ],
    )
    s2 = apply_l2_batch(s1, rewards)
    hist = sorted(s2["account_history"].collect(), key=lambda r: r["id"])
    assert len(hist) == 1101
    ids = [h["id"] for h in hist]
    assert len(set(ids)) == 1101, "ids must be unique across the tx boundary"
    # ORDER BY id == event order: all 1100 bulk rewards precede tx 1's row
    assert [h["account"] for h in hist[:3]] == ["curator0000", "curator0001", "curator0002"]
    assert hist[-1]["account"] == "a" and hist[-1]["type"] == "author_reward"


def test_event_order_slot_overflow_raises(spark, state):
    """ev_seq >= 10000 must fail loudly (raise_error inside the id
    expression), never silently collide."""
    setup = _tx(
        spark,
        [{"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}}],
    )
    s1 = apply_l2_batch(state, setup)
    bulk = [
        _ev("comments", "curationReward", symbol="TKN", authorperm="@a/p",
            quantity="0.1", account=f"c{i}")
        for i in range(10_001)
    ]
    rewards = _tx(spark, [{"payload": {}, "logs": {"events": bulk}, "block": 2, "ts": T1}])
    s2 = apply_l2_batch(s1, rewards)
    with pytest.raises(Exception, match="event-order slot overflow"):
        s2["account_history"].collect()


def test_error_logs_skipped(spark, state):
    txs = _tx(
        spark,
        [
            {"payload": {"author": "a", "permlink": "p"}, "logs": {"errors": ["boom"]}},
        ],
    )
    out = apply_l2_batch(state, txs)
    assert out["posts"].isEmpty()


def test_reward_pool_update(spark, state):
    txs = _tx(
        spark,
        [
            {
                "payload": {
                    "symbol": "TKN",
                    "config": {
                        "postRewardCurveParameter": "1.03",
                        "curationRewardCurveParameter": "0.5",
                        "curationRewardPercentage": 50,
                        "cashoutWindowDays": 10,
                        "voteRegenerationDays": 3,
                        "downvoteRegenerationDays": 3,
                        "disableDownvote": True,
                    },
                },
                "action": "updateRewardPool",
                "logs": {"events": [_ev("comments", "updateRewardPool", _id="1")]},
            }
        ],
    )
    out = apply_l2_batch(state, txs)
    cfg = out["token_config"].collect()[0]
    assert cfg["cashout_window_days"] == 10
    assert cfg["author_curve_exponent"] == Decimal("1.03")
    assert cfg["disable_downvoting"] is True
    assert cfg["promoted_post_account"] == "promo-acct"  # untouched column


def test_promotion(spark, state):
    setup = _tx(
        spark,
        [{"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}}],
    )
    s1 = apply_l2_batch(state, setup)
    promo = _tx(
        spark,
        [
            {
                "contract": "tokens",
                "action": "transfer",
                "payload": {"symbol": "TKN", "to": "promo-acct", "quantity": "12.5", "memo": '"promote @a/p"'},
                "logs": {"events": []},
                "block": 3,
            },
            {  # transfer to someone else: ignored
                "contract": "tokens",
                "action": "transfer",
                "payload": {"symbol": "TKN", "to": "other", "quantity": "99", "memo": "@a/p"},
                "logs": {"events": []},
                "block": 3,
                "tx_seq": 1,
            },
        ],
    )
    s2 = apply_l2_batch(s1, promo)
    p = s2["posts"].collect()[0]
    assert p["promoted"] == Decimal("12.5")
    exp = 1.0969100130080565 + T0.timestamp() / 480000  # log10(12.5) + epoch/ts
    assert p["score_promoted"] == pytest.approx(exp, rel=1e-12)


def test_set_mute(spark, state):
    setup = _tx(
        spark,
        [{"payload": {"author": "a", "permlink": "p"}, "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]}}],
    )
    s1 = apply_l2_batch(state, setup)
    mutes = _tx(
        spark,
        [
            {"action": "setMute", "payload": {"account": "troll", "rewardPoolId": 1, "mute": True}, "logs": {}, "block": 2},
            {"action": "setPostMute", "payload": {"authorperm": "@a/p", "rewardPoolId": 1, "mute": True}, "logs": {}, "block": 2, "tx_seq": 1},
        ],
    )
    s2 = apply_l2_batch(s1, mutes)
    acct = {r["name"]: r for r in s2["accounts"].collect()}
    assert acct["troll"]["muted"] is True and acct["troll"]["symbol"] == "TKN"
    assert s2["posts"].collect()[0]["muted"] is True


# --- L1 ---------------------------------------------------------------------

def _l1(spark, rows):
    return spark.createDataFrame(
        [
            (
                r.get("block", 10),
                r.get("op_seq", i),
                r.get("ts", T1),
                r["type"],
                r.get("author"),
                r.get("permlink"),
                r.get("parent_author", ""),
                r.get("parent_permlink", ""),
                r.get("title"),
                r.get("body"),
                r.get("json_metadata"),
                r.get("id"),
                json.dumps(r["json"]) if "json" in r else None,
                r.get("posting", [r.get("author") or "u"]),
                r.get("active", []),
            )
            for i, r in enumerate(rows)
        ],
        schemas.OPS_L1,
    )


def _seed_post(spark, state, ap="@alice/p1", author="alice", token="TKN", main=True):
    row = [(ap, author, T0, None, None, main, False, token, Decimal(0), None,
            None, Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), None, None, 0,
            "" if main else "parent", "" if main else "pp", 0.0, False)]
    state = dict(state)
    state["posts"] = spark.createDataFrame(row, schemas.POSTS)
    return state


def test_l1_comment_updates_existing_post(spark, state):
    state = _seed_post(spark, state)
    ops = _l1(
        spark,
        [
            {
                "type": "comment",
                "author": "alice",
                "permlink": "p1",
                "parent_permlink": "hive-123",
                "title": "My Title",
                "body": "hello world body",
                "json_metadata": json.dumps({"tags": ["tag1", "hive-123"], "app": "x"}),
            }
        ],
    )
    out = apply_l1_batch(state, ops)
    p = out["posts"].collect()[0]
    assert p["title"] == "My Title"
    assert p["tags"] == "hive-123,tag1"
    assert p["desc"] == "hello world body"
    assert p["main_post"] is True
    assert p["author"] == "alice"  # carried
    m = out["post_metadata"].collect()[0]
    assert m["body"] == "hello world body"
    assert m["depth"] == 0
    assert m["url"] == "/hive-123/@alice/p1"
    a = out["accounts"].collect()[0]
    assert a["last_root_post"] == T1 and a["last_post"] is None


def test_l1_comment_on_unknown_post_ignored(spark, state):
    ops = _l1(spark, [{"type": "comment", "author": "ghost", "permlink": "nope", "body": "x", "json_metadata": "{}"}])
    out = apply_l1_batch(state, ops)
    assert out["posts"].isEmpty() and out["post_metadata"].isEmpty()


def test_l1_reply_increments_children(spark, state):
    state = _seed_post(spark, state)
    # the reply post row must exist too (created by L2 newComment)
    reply_row = spark.createDataFrame(
        [("@bob/r1", "bob", T1, None, None, False, False, "TKN", Decimal(0), None,
          None, Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), None, None, 0,
          "alice", "p1", 0.0, False)],
        schemas.POSTS,
    )
    state["posts"] = state["posts"].unionByName(reply_row)
    ops = _l1(
        spark,
        [
            {"type": "comment", "author": "bob", "permlink": "r1",
             "parent_author": "alice", "parent_permlink": "p1",
             "body": "a reply", "json_metadata": "{}"}
        ],
    )
    out = apply_l1_batch(state, ops)
    posts = {r["authorperm"]: r for r in out["posts"].collect()}
    assert posts["@alice/p1"]["children"] == 1
    assert posts["@bob/r1"]["children"] == 0
    assert posts["@bob/r1"]["main_post"] is False


def test_l1_delete_removes_all_token_rows(spark, state):
    state = _seed_post(spark, state)
    extra = spark.createDataFrame(
        [("@alice/p1", "alice", T0, None, None, True, False, "OTHER", Decimal(0), None,
          None, Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), None, None, 0,
          "", "", 0.0, False)],
        schemas.POSTS,
    )
    state["posts"] = state["posts"].unionByName(extra)
    ops = _l1(spark, [{"type": "delete_comment", "author": "alice", "permlink": "p1"}])
    out = apply_l1_batch(state, ops)
    assert out["posts"].isEmpty()


def test_l1_follow_states(spark, state):
    ops = _l1(
        spark,
        [
            {"type": "custom_json", "id": "follow", "posting": ["u1"],
             "json": ["follow", {"follower": "u1", "following": "u2", "what": ["blog"]}]},
            {"type": "custom_json", "id": "follow", "posting": ["u1"],
             "json": ["follow", {"follower": "u1", "following": "u3", "what": ["ignore"]}]},
            {"type": "custom_json", "id": "follow", "posting": ["u1"],
             "json": ["follow", {"follower": "u1", "following": "u2", "what": []}]},  # unfollow (later op wins)
            {"type": "custom_json", "id": "follow", "posting": ["attacker"],
             "json": ["follow", {"follower": "victim", "following": "x", "what": ["blog"]}]},  # forged: dropped
        ],
    )
    out = apply_l1_batch(state, ops)
    follows = {(r["follower"], r["following"]): r["state"] for r in out["follows"].collect()}
    assert follows == {("u1", "u2"): 0, ("u1", "u3"): 2}


def test_l1_reblog_and_delete(spark, state):
    state = _seed_post(spark, state)
    ops = _l1(
        spark,
        [
            {"type": "custom_json", "id": "reblog", "posting": ["bob"],
             "json": ["reblog", {"account": "bob", "author": "alice", "permlink": "p1"}]},
            {"type": "custom_json", "id": "follow", "posting": ["carol"],
             "json": ["reblog", {"account": "carol", "author": "alice", "permlink": "p1"}]},
        ],
    )
    out = apply_l1_batch(state, ops)
    rb = {r["account"] for r in out["reblogs"].collect()}
    assert rb == {"bob", "carol"}
    # delete carol's reblog in a later batch
    ops2 = _l1(
        spark,
        [{"type": "custom_json", "id": "reblog", "posting": ["carol"], "block": 11,
          "json": ["reblog", {"account": "carol", "author": "alice", "permlink": "p1", "delete": "delete"}]}],
    )
    out2 = apply_l1_batch(out, ops2)
    assert {r["account"] for r in out2["reblogs"].collect()} == {"bob"}


def test_l1_batch_deterministic(spark, state):
    state = _seed_post(spark, state)
    ops = _l1(
        spark,
        [
            {"type": "comment", "author": "alice", "permlink": "p1", "title": "v1",
             "body": "b1", "json_metadata": "{}", "block": 10},
            {"type": "comment", "author": "alice", "permlink": "p1", "title": "v2",
             "body": "b2", "json_metadata": "{}", "block": 11},
        ],
    )
    a = apply_l1_batch(state, ops)["posts"].collect()
    b = apply_l1_batch(state, ops)["posts"].collect()
    assert a == b
    assert a[0]["title"] == "v2" and a[0]["desc"] == "b2"


def test_refresh_follows_keeps_mute_when_pair_in_fetched(spark):
    """A muted (state=2) pair appearing in the fetched authoritative list
    must STAY muted — the refresh reconciles follows, never mutes."""
    from distribution_engine_smt_spark.processors.l1 import refresh_follows

    follows = spark.createDataFrame(
        [("u", "muted-acct", 2), ("u", "kept", 1), ("u", "dropped", 1)],
        "follower string, following string, state short",
    )
    fetched = spark.createDataFrame(
        [("u", "muted-acct"), ("u", "kept"), ("u", "new")],
        "follower string, following string",
    )
    out = {
        (r["follower"], r["following"]): r["state"]
        for r in refresh_follows(follows, fetched).collect()
    }
    assert out[("u", "muted-acct")] == 2  # mute survives the refresh
    assert out[("u", "kept")] == 1
    assert out[("u", "new")] == 1
    assert out[("u", "dropped")] == 0


# --- skew-salted hot-key folds ----------------------------------------------
# One viral post receiving ~all votes/replies in a batch must not funnel
# through a single reducer: the folds route through
# operators/skew.py hot_key_aggregate (two-phase, partial on (key, salt)).

def test_viral_post_vote_fold_is_salted_and_correct(spark, state):
    n_voters = 120
    rows = [
        {"payload": {"author": "alice", "permlink": "p1"},
         "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]},
         "ts": T0},
        {"payload": {"author": "bob", "permlink": "p2"},
         "logs": {"events": [_ev("comments", "newComment", symbol="TKN")]},
         "ts": T0, "tx_seq": 1},
    ]
    # the viral batch: every voter hits @alice/p1
    for i in range(n_voters):
        rows.append({
            "payload": {"author": "alice", "permlink": "p1",
                        "voter": f"v{i}", "weight": 10000},
            "logs": {"events": [_ev("comments", "newVote", symbol="TKN",
                                    rshares=str(10 + i))]},
            "ts": T1, "tx_seq": 2 + i,
        })
    rows.append({  # control: one vote on the quiet post
        "payload": {"author": "bob", "permlink": "p2", "voter": "z",
                    "weight": 10000},
        "logs": {"events": [_ev("comments", "newVote", symbol="TKN",
                                rshares="7")]},
        "ts": T1, "tx_seq": 2 + n_voters,
    })
    out = apply_l2_batch(state, _tx(spark, rows))
    # the salted exchange is in the lineage: partial agg on (key, __salt)
    assert "__salt" in out["posts"]._jdf.queryExecution().toString()
    posts = {r["authorperm"]: r for r in out["posts"].collect()}
    assert posts["@alice/p1"]["vote_rshares"] == Decimal(
        sum(10 + i for i in range(n_voters))
    )
    assert posts["@bob/p2"]["vote_rshares"] == Decimal(7)


def test_viral_reply_flood_children_fold_is_salted_and_correct(spark, state):
    state = _seed_post(spark, state)
    n = 80
    reply_rows = [
        (f"@u{i}/r", f"u{i}", T1, None, None, False, False, "TKN", Decimal(0),
         None, None, Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), None,
         None, 0, "alice", "p1", 0.0, False)
        for i in range(n)
    ]
    state["posts"] = state["posts"].unionByName(
        spark.createDataFrame(reply_rows, schemas.POSTS)
    )
    ops = _l1(spark, [
        {"type": "comment", "author": f"u{i}", "permlink": "r",
         "parent_author": "alice", "parent_permlink": "p1",
         "body": "reply", "json_metadata": "{}", "op_seq": i}
        for i in range(n)
    ])
    out = apply_l1_batch(state, ops)
    assert "__salt" in out["posts"]._jdf.queryExecution().toString()
    posts = {r["authorperm"]: r for r in out["posts"].collect()}
    assert posts["@alice/p1"]["children"] == n
    assert posts["@u0/r"]["children"] == 0
