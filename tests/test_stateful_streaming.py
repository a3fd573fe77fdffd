"""applyInPandasWithState vote deltas over a real stream: state is one
last-rshares row per (post, voter) key — bounded, TTL-able — and the
per-post total is a downstream additive fold. An updateVote replaces (not
adds) the voter's contribution."""

from __future__ import annotations

import json
from decimal import Decimal

from distribution_engine_smt_spark.streaming.stateful import (
    apply_vote_deltas,
    sum_vote_deltas,
    vote_delta_stream,
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, src, ckpt, totals):
    stream = (
        spark.readStream.schema(
            "authorperm string, token string, voter string, rshares decimal(38,10), seq long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    deltas = vote_delta_stream(stream)

    def sink(df, batch_id):
        apply_vote_deltas(totals, sum_vote_deltas(df).collect())

    q = (
        deltas.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_vote_deltas_replace_across_batches(spark, tmp_path):
    src = tmp_path / "votes"
    src.mkdir()
    totals: dict = {}

    _write(src / "b1.json", [
        {"authorperm": "@a/p", "token": "T", "voter": "v1", "rshares": "100", "seq": 1},
        {"authorperm": "@a/p", "token": "T", "voter": "v2", "rshares": "50", "seq": 2},
    ])
    _run_stream(spark, src, tmp_path / "ckpt", totals)
    assert totals[("@a/p", "T")] == Decimal(150)

    # batch 2: v1 UPDATES the vote (replace, not add) + new post appears;
    # v2's contribution survives in the per-voter state
    _write(src / "b2.json", [
        {"authorperm": "@a/p", "token": "T", "voter": "v1", "rshares": "10", "seq": 3},
        {"authorperm": "@b/q", "token": "T", "voter": "v3", "rshares": "7", "seq": 4},
    ])
    _run_stream(spark, src, tmp_path / "ckpt", totals)
    assert totals[("@a/p", "T")] == Decimal(60)   # 10 (v1 replaced) + 50 (v2)
    assert totals[("@b/q", "T")] == Decimal(7)


def test_viral_post_state_stays_per_voter(spark, tmp_path):
    """Thousands of voters on ONE post: state is N tiny keys, not one
    monolithic map — the batch completes and the total is exact."""
    src = tmp_path / "viral"
    src.mkdir()
    totals: dict = {}
    n = 2_000
    _write(src / "b1.json", [
        {"authorperm": "@hot/post", "token": "T", "voter": f"v{i}", "rshares": "1", "seq": i}
        for i in range(n)
    ])
    _run_stream(spark, src, tmp_path / "ckpt-viral", totals)
    assert totals[("@hot/post", "T")] == Decimal(n)

    # one of the voters updates their vote: only that voter's delta flows
    _write(src / "b2.json", [
        {"authorperm": "@hot/post", "token": "T", "voter": "v0", "rshares": "5", "seq": n + 1},
    ])
    _run_stream(spark, src, tmp_path / "ckpt-viral", totals)
    assert totals[("@hot/post", "T")] == Decimal(n + 4)
