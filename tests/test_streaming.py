"""Streaming wrapper tests: real file-source readStream -> foreachBatch ->
processors -> persisted state, plus the two gates (15 s head delay,
L2-leads-L1 alignment) and checkpoint resume."""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timedelta
from decimal import Decimal

import pytest

from distribution_engine_smt_spark import schemas, tables
from distribution_engine_smt_spark.queries import get_state_lag
from distribution_engine_smt_spark.streaming import (
    DualStreamRunner,
    head_delay_filter,
    l2_alignment_bound,
    run_l1_stream,
    run_l2_stream,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)
NOW = datetime(2024, 1, 1, 13, 0, 0)


pytestmark = pytest.mark.slow  # end-to-end dual-stream runner soaks -- full battery tier (VERDICT r12 #1); run with -m "slow or not slow"

def _write_l2_file(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _l2_row(block, tx_seq, payload, logs, ts=T0, contract="comments", action="x"):
    return {
        "blockNumber": block,
        "timestamp": ts.isoformat(),
        "tx_seq": tx_seq,
        "contract": contract,
        "action": action,
        "sender": "s",
        "transactionId": f"t{block}-{tx_seq}",
        "payload": json.dumps(payload),
        "logs": json.dumps(logs),
    }


def _l1_row(block, op_seq, typ, ts=T0, **kw):
    return {
        "block_num": block,
        "op_seq": op_seq,
        "timestamp": ts.isoformat(),
        "type": typ,
        **kw,
    }


@pytest.fixture()
def runner(spark, tmp_path):
    r = DualStreamRunner(spark, str(tmp_path))
    state = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    state["token_config"] = spark.createDataFrame(
        [("TKN", 7, 50, Decimal(1), Decimal(1), 0, None, "promo", 1, None, 5, 5, False, False)],
        schemas.TOKEN_CONFIG,
    )
    r.save_state(state)
    return r


def test_l2_stream_end_to_end(spark, runner, tmp_path):
    src = tmp_path / "l2src"
    src.mkdir()
    _write_l2_file(
        src / "b1.json",
        [
            _l2_row(1, 0, {"author": "alice", "permlink": "p1"},
                    {"events": [{"contract": "comments", "event": "newComment", "data": {"symbol": "TKN"}}]}),
            _l2_row(1, 1, {"author": "alice", "permlink": "p1", "voter": "bob", "weight": 100},
                    {"events": [{"contract": "comments", "event": "newVote", "data": {"symbol": "TKN", "rshares": "777"}}]}),
        ],
    )
    q = run_l2_stream(runner, str(src), available_now=True)
    q.awaitTermination(120)
    state = runner.load_state()
    posts = state["posts"].collect()
    assert len(posts) == 1 and posts[0]["vote_rshares"] == Decimal(777)
    cfg = {r["id"]: r for r in state["configuration"].collect()}
    assert cfg[2]["last_engine_streamed_block"] == 1
    assert cfg[2]["last_engine_streamed_timestamp"] == T0


def test_l1_gated_by_l2_clock_then_released(spark, runner, tmp_path):
    # L2 has streamed up to T0; an L1 op AT T0 must NOT commit (needs
    # op.ts < l2_clock), an op before T0 must commit
    src = tmp_path / "l1src"
    src.mkdir()
    early = T0 - timedelta(seconds=30)
    _write_l1_follow_ops(src / "ops.json", early, T0)

    # seed L2 checkpoint at T0
    state = runner.load_state()
    ckpt = spark.createDataFrame(
        [(2, None, None, 100, T0, "ENGINE_SIDECHAIN")], schemas.CONFIGURATION
    )
    from distribution_engine_smt_spark.operators import merge_upsert

    state["configuration"] = merge_upsert(state["configuration"], ckpt, ["id"])
    runner.save_state(state, only=["configuration"])

    q = run_l1_stream(runner, str(src), available_now=True)
    q.awaitTermination(120)
    follows = {r["following"] for r in runner.load_state()["follows"].collect()}
    assert follows == {"early-target"}  # the T0 op was held back


def _write_l1_follow_ops(path, early_ts, late_ts):
    rows = [
        _l1_row(10, 0, "custom_json", ts=early_ts, id="follow",
                json=json.dumps(["follow", {"follower": "u", "following": "early-target", "what": ["blog"]}]),
                required_posting_auths=["u"], required_auths=[]),
        _l1_row(11, 0, "custom_json", ts=late_ts, id="follow",
                json=json.dumps(["follow", {"follower": "u", "following": "late-target", "what": ["blog"]}]),
                required_posting_auths=["u"], required_auths=[]),
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ops_df(spark, rows):
    return spark.read.schema(schemas.OPS_L1).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows] or ["{}"])
    ).filter("block_num is not null")


def test_l1_holdback_parks_and_releases_gated_ops(spark, runner):
    # L2 clock at T0: an op AT T0 fails the alignment gate. It must be
    # parked in the holdback, not dropped, and commit once L2 advances.
    from distribution_engine_smt_spark.operators import merge_upsert

    state = runner.load_state()
    ckpt = spark.createDataFrame(
        [(2, None, None, 100, T0, "ENGINE_SIDECHAIN")], schemas.CONFIGURATION
    )
    state["configuration"] = merge_upsert(state["configuration"], ckpt, ["id"])
    runner.save_state(state, only=["configuration"])

    op = _l1_row(11, 0, "custom_json", ts=T0, id="follow",
                 json=json.dumps(["follow", {"follower": "u", "following": "held-target", "what": ["blog"]}]),
                 required_posting_auths=["u"], required_auths=[])
    runner.process_l1_batch(_ops_df(spark, [op]), 0, now=NOW)
    assert runner.load_state()["follows"].isEmpty()
    held = runner._load_holdback("l1", schemas.OPS_L1)
    assert held is not None and held.count() == 1

    # L2 advances past T0 -> an empty next batch releases the parked op
    ckpt2 = spark.createDataFrame(
        [(2, None, None, 101, T0 + timedelta(seconds=60), "ENGINE_SIDECHAIN")],
        schemas.CONFIGURATION,
    )
    state = runner.load_state()
    state["configuration"] = merge_upsert(state["configuration"], ckpt2, ["id"])
    runner.save_state(state, only=["configuration"])
    runner.process_l1_batch(_ops_df(spark, []), 1, now=NOW)
    follows = {r["following"] for r in runner.load_state()["follows"].collect()}
    assert follows == {"held-target"}
    assert runner._load_holdback("l1", schemas.OPS_L1).isEmpty()


def test_l2_holdback_parks_young_txs(spark, runner):
    # a tx younger than the 15 s head delay is parked, then committed
    # once enough wall-clock has passed
    young = _l2_row(9, 0, {"author": "carol", "permlink": "py"},
                    {"events": [{"contract": "comments", "event": "newComment", "data": {"symbol": "TKN"}}]},
                    ts=NOW - timedelta(seconds=5))
    txs = spark.read.schema(schemas.TXS_L2).json(
        spark.sparkContext.parallelize([json.dumps(young)])
    )
    runner.process_l2_batch(txs, 0, now=NOW)
    assert runner.load_state()["posts"].isEmpty()
    assert runner._load_holdback("l2", schemas.TXS_L2).count() == 1

    empty = spark.createDataFrame([], schemas.TXS_L2)
    runner.process_l2_batch(empty, 1, now=NOW + timedelta(seconds=30))
    authors = {r["author"] for r in runner.load_state()["posts"].collect()}
    assert authors == {"carol"}
    assert runner._load_holdback("l2", schemas.TXS_L2).isEmpty()


def test_head_delay_filter(spark):
    now = NOW
    df = spark.createDataFrame(
        [(1, now - timedelta(seconds=60)), (2, now - timedelta(seconds=5))],
        "block_num long, timestamp timestamp",
    )
    kept = head_delay_filter(df, now=now).collect()
    assert [r["block_num"] for r in kept] == [1]


def test_alignment_bound_reads_l2_checkpoint(spark, runner):
    state = runner.load_state()
    assert l2_alignment_bound(state) is None
    ckpt = spark.createDataFrame(
        [(2, None, None, 7, T0, "ENGINE_SIDECHAIN")], schemas.CONFIGURATION
    )
    from distribution_engine_smt_spark.operators import merge_upsert

    state["configuration"] = merge_upsert(state["configuration"], ckpt, ["id"])
    assert l2_alignment_bound(state) == T0


def test_state_lag_from_stream_checkpoints(spark, runner, tmp_path):
    src = tmp_path / "l2src2"
    src.mkdir()
    _write_l2_file(
        src / "b.json",
        [_l2_row(5, 0, {"author": "a", "permlink": "p"},
                 {"events": [{"contract": "comments", "event": "newComment", "data": {"symbol": "TKN"}}]})],
    )
    q = run_l2_stream(runner, str(src), available_now=True)
    q.awaitTermination(120)
    lag = get_state_lag(runner.load_state(), now=T0 + timedelta(seconds=42)).collect()
    by_name = {r["name"]: r for r in lag if r["name"] == "ENGINE_SIDECHAIN"}
    assert by_name["ENGINE_SIDECHAIN"]["last_streamed_block"] is None  # L2 uses engine columns


# ---------------------------------------------------------------------------
# round-2 hardening: replay idempotence (block HWM), atomic state swap
# recovery, mute-only touched partitions, NULL-timestamp routing
# ---------------------------------------------------------------------------
def test_l2_replay_does_not_double_apply_additive_state(spark, runner):
    """foreachBatch is at-least-once: re-delivering the same batch must not
    re-add payouts/rshares (block high-water mark in configuration)."""
    txs = spark.read.schema(schemas.TXS_L2).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in [
            _l2_row(1, 0, {"author": "a", "permlink": "p"},
                    {"events": [{"contract": "comments", "event": "newComment", "data": {"symbol": "TKN"}}]}),
            _l2_row(2, 0, {"author": "x", "permlink": "y"},
                    {"events": [{"contract": "comments", "event": "curationReward",
                                 "data": {"symbol": "TKN", "authorperm": "@a/p", "quantity": "2.5", "account": "cur"}}]}),
        ]])
    )
    runner.process_l2_batch(txs, 0, now=NOW)
    p1 = runner.load_state()["posts"].collect()[0]
    assert p1["total_payout_value"] == Decimal("2.5")
    # crash-replay: the exact same batch arrives again
    runner.process_l2_batch(txs, 0, now=NOW)
    state = runner.load_state()
    p2 = state["posts"].collect()[0]
    assert p2["total_payout_value"] == Decimal("2.5")  # NOT 5.0
    assert state["account_history"].count() == 1
    cfg = {r["id"]: r for r in state["configuration"].collect()}
    assert cfg[2]["last_engine_streamed_block"] == 2


def test_l1_replay_does_not_double_count_children(spark, runner):
    state = runner.load_state()
    state["posts"] = spark.createDataFrame(
        [("@a/parent", "a", T0, None, None, True, False, "TKN", Decimal(0), None, None,
          Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), "t", "d", 0, "", "", 0.0, False),
         ("@b/reply", "b", T0, None, None, False, False, "TKN", Decimal(0), None, None,
          Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), "t", "d", 0, "a", "parent", 0.0, False)],
        schemas.POSTS,
    )
    runner.save_state(state, only=["posts"])
    op = _l1_row(5, 0, "comment", ts=T0, author="b", permlink="reply",
                 parent_author="a", parent_permlink="parent", title="t", body="body",
                 json_metadata="{}")
    ops = _ops_df(spark, [op])
    runner.process_l1_batch(ops, 0, now=NOW)
    runner.process_l1_batch(ops, 0, now=NOW)  # replay
    posts = {r["authorperm"]: r for r in runner.load_state()["posts"].collect()}
    assert posts["@a/parent"]["children"] == 1  # NOT 2
    cfg = {r["id"]: r for r in runner.load_state()["configuration"].collect()}
    assert cfg[1]["last_streamed_block"] == 5


def test_mute_only_batch_persists_touched_partitions(spark, runner):
    """setPostMute payloads carry rewardPoolId, not symbol; a mutes-only
    batch must still write the posts/accounts partitions it updated
    (reference: engine_comments_contract_processor.py:33-49)."""
    state = runner.load_state()
    state["posts"] = spark.createDataFrame(
        [("@a/p", "a", T0, None, None, True, False, "TKN", Decimal(0), None, None,
          Decimal(0), Decimal(0), 0.0, 0.0, 0, Decimal(0), "t", "d", 0, "", "", 0.0, False)],
        schemas.POSTS,
    )
    runner.save_state(state, only=["posts"])
    mute = _l2_row(3, 0, {"authorperm": "@a/p", "rewardPoolId": 1, "mute": True},
                   {"events": []}, action="setPostMute")
    txs = spark.read.schema(schemas.TXS_L2).json(
        spark.sparkContext.parallelize([json.dumps(mute)])
    )
    runner.process_l2_batch(txs, 0, now=NOW)
    p = runner.load_state()["posts"].collect()[0]
    assert p["muted"] is True  # silently lost before the pool-id resolution


def test_null_timestamp_ops_are_processed_not_dropped(spark, runner):
    """Three-valued logic must not swallow NULL-timestamp ops: the reference
    processes every op of a block, so they route to the eligible side."""
    op = {"block_num": 7, "op_seq": 0, "timestamp": None, "type": "custom_json",
          "id": "follow",
          "json": json.dumps(["follow", {"follower": "u", "following": "null-ts", "what": ["blog"]}]),
          "required_posting_auths": ["u"], "required_auths": []}
    runner.process_l1_batch(_ops_df(spark, [op]), 0, now=NOW)
    follows = {r["following"] for r in runner.load_state()["follows"].collect()}
    assert follows == {"null-ts"}
    held = runner._load_holdback("l1", schemas.OPS_L1)
    assert held is None or held.isEmpty()


def test_pending_swap_rolls_forward_on_start(spark, runner, tmp_path):
    """A crash between the intent journal and the directory renames must
    roll FORWARD on the next start — state + HWM promote together."""
    import json as _json
    import os

    # stage a replacement configuration table by hand, as save_state would
    staging = os.path.join(runner.root, "_staging")
    staged_tbl = os.path.join(staging, "data", "configuration")
    new_cfg = spark.createDataFrame(
        [(1, 99, T0, None, None, "HIVED")], schemas.CONFIGURATION
    )
    tables.write_table(new_cfg, os.path.join(staging, "data"), "configuration")
    dst = os.path.join(runner.state_dir, "configuration")
    with open(os.path.join(staging, "INTENT.json"), "w") as f:
        _json.dump({"moves": [[staged_tbl, dst]]}, f)
    # "crash" happened here; a fresh runner must complete the swap
    r2 = DualStreamRunner(spark, runner.root)
    cfg = {r["id"]: r for r in r2.load_state()["configuration"].collect()}
    assert cfg[1]["last_streamed_block"] == 99
    assert not os.path.exists(staging)
