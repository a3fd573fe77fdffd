"""applyInPandasWithState running vote totals over a real stream: state
carries per-voter last-rshares across micro-batches; an updateVote replaces
(not adds) the voter's contribution."""

from __future__ import annotations

import json
import time

from distribution_engine_smt_spark.streaming.stateful import running_vote_totals


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_vote_totals_across_batches(spark, tmp_path):
    src = tmp_path / "votes"
    src.mkdir()
    out: list = []

    stream = (
        spark.readStream.schema(
            "authorperm string, token string, voter string, rshares decimal(38,10), seq long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    totals = running_vote_totals(stream)

    def sink(df, batch_id):
        out.extend(df.collect())

    _write(src / "b1.json", [
        {"authorperm": "@a/p", "token": "T", "voter": "v1", "rshares": "100", "seq": 1},
        {"authorperm": "@a/p", "token": "T", "voter": "v2", "rshares": "50", "seq": 2},
    ])
    q = (
        totals.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert out and out[-1]["vote_rshares"] == 150

    # batch 2: v1 UPDATES the vote (replace, not add) + new post appears
    out.clear()
    _write(src / "b2.json", [
        {"authorperm": "@a/p", "token": "T", "voter": "v1", "rshares": "10", "seq": 3},
        {"authorperm": "@b/q", "token": "T", "voter": "v3", "rshares": "7", "seq": 4},
    ])
    q = (
        totals.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["authorperm"], r["token"]): r["vote_rshares"] for r in out}
    assert got[("@a/p", "T")] == 60   # 10 (v1 replaced) + 50 (v2 from state)
    assert got[("@b/q", "T")] == 7
