"""Live JSON-RPC enrichment (S9) against a real local HTTP server.

The stub server implements JSON-RPC 2.0 (single + batch) over stdlib
ThreadingHTTPServer with a per-method handler table, a configurable
fail-first-N flake counter (proves the reference's 5-attempt retry loop),
and a request log. The executor-side mapInPandas path runs against it
in-process (local mode), exercising the exact transport production uses.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from distribution_engine_smt_spark.rpc import (
    enrich_comments_rpc,
    json_rpc_batch,
    json_rpc_call,
    rpc_following_fetcher,
    rpc_holder_pager,
)
from distribution_engine_smt_spark.sources import fetched_follows, paged_source

POSTS = {
    "@alice/hello": {
        "body": "hello world",
        "json_metadata": {"tags": ["intro"]},
        "parent_authorperm": None,
        "depth": 0,
        "main_post": True,
    },
    "@bob/reply": {
        "body": "nice post",
        "json_metadata": None,
        "parent_authorperm": "@alice/hello",
        "depth": 1,
        "main_post": False,
    },
}
FOLLOWS = {"alice": ["bob", "carol"], "bob": []}
HOLDERS = [{"account": f"acct{i}", "symbol": "TKN", "stake": float(i % 3)} for i in range(25)]


class _RpcState:
    def __init__(self):
        self.fail_next = 0  # fail this many requests before succeeding
        self.item_error_next = 0  # per-item JSON-RPC errors on first item
        self.requests = 0
        self.lock = threading.Lock()


def _dispatch(method, params):
    if method == "get_content":
        return POSTS.get(params[0])
    if method == "get_following":
        return FOLLOWS.get(params[0], [])
    if method == "get_holder":
        limit, offset = params
        return HOLDERS[offset : offset + limit]
    raise ValueError(f"unknown method {method}")


@pytest.fixture(scope="module")
def rpc_server():
    state = _RpcState()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            with state.lock:
                state.requests += 1
                if state.fail_next > 0:
                    state.fail_next -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
            if isinstance(body, list):
                with state.lock:
                    flake_first = state.item_error_next > 0
                    if flake_first:
                        state.item_error_next -= 1
                out = []
                for j, c in enumerate(body):
                    if flake_first and j == 0:
                        out.append(
                            {"jsonrpc": "2.0", "id": c["id"],
                             "error": {"code": -32603, "message": "transient"}}
                        )
                    else:
                        out.append(
                            {"jsonrpc": "2.0", "id": c["id"],
                             "result": _dispatch(c["method"], c["params"])}
                        )
            else:
                out = {"jsonrpc": "2.0", "id": body["id"],
                       "result": _dispatch(body["method"], body["params"])}
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/"
    yield url, state
    srv.shutdown()


def test_single_call_roundtrip(rpc_server):
    url, _ = rpc_server
    r = json_rpc_call(url, "get_content", ["@alice/hello"])
    assert r["body"] == "hello world"


def test_retry_survives_transient_failures(rpc_server):
    url, state = rpc_server
    with state.lock:
        state.fail_next = 3  # < RPC_ATTEMPTS: must still succeed
    r = json_rpc_call(url, "get_following", ["alice"], backoff_s=0.01)
    assert r == ["bob", "carol"]


def test_retry_bound_gives_up(rpc_server):
    url, state = rpc_server
    with state.lock:
        state.fail_next = 99
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        json_rpc_call(url, "get_content", ["@alice/hello"], attempts=2, backoff_s=0.01)
    with state.lock:
        state.fail_next = 0


def test_batch_preserves_order(rpc_server):
    url, _ = rpc_server
    rs = json_rpc_batch(url, "get_content", [["@bob/reply"], ["@alice/hello"], ["@nobody/x"]])
    assert rs[0]["body"] == "nice post"
    assert rs[1]["body"] == "hello world"
    assert rs[2] is None


def test_batch_retries_per_item_errors(rpc_server):
    """A transient per-item JSON-RPC error must be retried like a
    transport failure, not conflated with a missing result."""
    url, state = rpc_server
    with state.lock:
        state.item_error_next = 1
    rs = json_rpc_batch(
        url, "get_content", [["@alice/hello"], ["@bob/reply"]], backoff_s=0.01
    )
    assert rs[0]["body"] == "hello world"  # recovered on retry
    assert rs[1]["body"] == "nice post"


def test_batch_exhausted_item_errors_degrade_to_none(rpc_server):
    url, state = rpc_server
    with state.lock:
        state.item_error_next = 99
    rs = json_rpc_batch(
        url, "get_content", [["@alice/hello"], ["@bob/reply"]],
        attempts=2, backoff_s=0.01,
    )
    assert rs[0] is None          # errored through the attempt budget
    assert rs[1]["body"] == "nice post"  # healthy item still returned
    with state.lock:
        state.item_error_next = 0


def test_empty_object_result_is_not_found(spark, rpc_server):
    """Endpoints that answer {} for a deleted post must not produce
    fetch_ok=true with all-null fields."""
    url, _ = rpc_server
    POSTS["@deleted/post"] = {}
    try:
        keys = spark.createDataFrame([("@deleted/post",)], "authorperm string")
        row = enrich_comments_rpc(keys, url).collect()[0]
        assert row["fetch_ok"] is False
        assert row["body"] is None
    finally:
        del POSTS["@deleted/post"]


def test_enrich_comments_distributed(spark, rpc_server):
    url, _ = rpc_server
    keys = spark.createDataFrame(
        [("@alice/hello",), ("@bob/reply",), ("@ghost/missing",)],
        "authorperm string",
    ).repartition(2)
    out = enrich_comments_rpc(keys, url, batch_size=2).orderBy("authorperm")
    rows = {r["authorperm"]: r for r in out.collect()}
    assert rows["@alice/hello"]["body"] == "hello world"
    assert rows["@alice/hello"]["fetch_ok"] is True
    assert json.loads(rows["@alice/hello"]["json_metadata"]) == {"tags": ["intro"]}
    assert rows["@bob/reply"]["parent_authorperm"] == "@alice/hello"
    assert rows["@bob/reply"]["main_post"] is False
    # missing key degrades per-row (reference fallback), never fails the task
    assert rows["@ghost/missing"]["fetch_ok"] is False
    assert rows["@ghost/missing"]["body"] is None


def test_enrich_unreachable_endpoint_degrades(spark):
    keys = spark.createDataFrame([("@a/b",)], "authorperm string")
    out = enrich_comments_rpc(
        keys, "http://127.0.0.1:1/", attempts=1, timeout=0.2
    ).collect()
    assert out[0]["fetch_ok"] is False


def test_following_fetcher_feeds_existing_adapter(spark, rpc_server):
    url, _ = rpc_server
    df = fetched_follows(spark, rpc_following_fetcher(url), ["alice", "bob"])
    got = {(r["follower"], r["following"]) for r in df.collect()}
    assert got == {("alice", "bob"), ("alice", "carol")}


def test_holder_pager_feeds_paged_source(spark, rpc_server):
    url, state = rpc_server
    df = paged_source(
        spark,
        rpc_holder_pager(url),
        "account string, symbol string, stake double",
        page_size=10,
    )
    assert df.count() == 25
    assert df.filter(F.col("stake") > 0).count() == 16  # 25 minus stake==0 rows


def test_enrichment_stream_drains_equal_to_batch(spark, rpc_server, tmp_path):
    """Two key waves through the checkpointed stream == one batch fetch
    over the union of keys; the second drain must not re-emit wave 1."""
    from distribution_engine_smt_spark.rpc import run_enrichment_stream

    url, _ = rpc_server
    src = str(tmp_path / "keys")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "enriched")
    wave1 = ["@alice/hello", "@ghost/missing"]
    wave2 = ["@bob/reply"]
    spark.createDataFrame([(k,) for k in wave1], "authorperm string").write.parquet(
        src, mode="append"
    )
    q = run_enrichment_stream(
        spark, src, url, ckpt, query_name="rpc_enrich_t1", output_dir=out
    )
    q.awaitTermination(60)
    got1 = spark.read.parquet(out).collect()
    assert {r["authorperm"] for r in got1} == set(wave1)

    spark.createDataFrame([(k,) for k in wave2], "authorperm string").write.parquet(
        src, mode="append"
    )
    q = run_enrichment_stream(
        spark, src, url, ckpt, query_name="rpc_enrich_t2", output_dir=out
    )
    q.awaitTermination(60)
    got_all = spark.read.parquet(out).collect()
    # resumed from checkpoint: wave 1 NOT re-fetched/re-appended
    assert {r["authorperm"] for r in got_all} == set(wave1 + wave2)
    assert len(got_all) == len(wave1) + len(wave2)

    keys = spark.createDataFrame(
        [(k,) for k in wave1 + wave2], "authorperm string"
    )
    batch = {
        r["authorperm"]: r for r in enrich_comments_rpc(keys, url).collect()
    }
    for r in got_all:
        assert r.asDict() == batch[r["authorperm"]].asDict()
