"""Serving shell: TTL cache expiry, limit clamps, param validation, and the
wired endpoints over a loaded state (reference: server/app.py:44-54 cache
config, :237-247 limit parsing, :83 /state)."""

from __future__ import annotations

import json
from datetime import datetime
from decimal import Decimal

import pytest

from distribution_engine_smt_spark import schemas, tables
from distribution_engine_smt_spark.processors.l1 import refresh_follows
from distribution_engine_smt_spark.serving import (
    MAX_LIMIT,
    ParamError,
    QueryServer,
    TTLCache,
    build_state_server,
    clamp_limit,
    parse_offset,
    require_token,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


# ---------------------------------------------------------------------------
# param validation (reference: app.py:237-263 int() + fallback, 1000 cap)
# ---------------------------------------------------------------------------
def test_clamp_limit_parses_and_clamps():
    assert clamp_limit(None) == 20
    assert clamp_limit("50") == 50
    assert clamp_limit(5000) == MAX_LIMIT
    assert clamp_limit(-3) == 20
    with pytest.raises(ParamError):
        clamp_limit("abc")


def test_parse_offset_and_token():
    assert parse_offset(None) == 0
    assert parse_offset("7") == 7
    assert parse_offset(-2) == 0
    with pytest.raises(ParamError):
        parse_offset("x")
    assert require_token({"token": "tkn"}) == "TKN"
    with pytest.raises(ParamError):
        require_token({})


# ---------------------------------------------------------------------------
# TTL cache with injectable clock
# ---------------------------------------------------------------------------
def test_ttl_cache_expires_without_sleeping():
    now = [0.0]
    cache = TTLCache(clock=lambda: now[0])
    k = cache.key("ep", {"a": 1})
    assert cache.get(k) is None
    cache.put(k, ["row"], ttl=60)
    assert cache.get(k) == ["row"]
    now[0] = 59.9
    assert cache.get(k) == ["row"]
    now[0] = 60.1
    assert cache.get(k) is None  # expired
    assert cache.misses == 2 and cache.hits == 2


def test_ttl_cache_key_is_param_order_insensitive():
    assert TTLCache.key("e", {"a": 1, "b": 2}) == TTLCache.key("e", {"b": 2, "a": 1})
    assert TTLCache.key("e", {"a": 1}) != TTLCache.key("e", {"a": 2})


def test_ttl_cache_eviction_bounds_entries():
    now = [0.0]
    cache = TTLCache(clock=lambda: now[0], max_entries=4)
    for i in range(8):
        cache.put(f"k{i}", i, ttl=100 + i)
    assert len(cache._data) <= 4
    assert cache.get("k7") == 7  # newest survives


# ---------------------------------------------------------------------------
# QueryServer: cache hits skip Spark, unknown endpoint/params rejected
# ---------------------------------------------------------------------------
def test_query_server_caches_and_validates(spark):
    calls = []
    now = [0.0]
    srv = QueryServer(TTLCache(clock=lambda: now[0]))

    def handler(params):
        calls.append(params)
        return spark.createDataFrame([(1, "x")], "id int, v string")

    srv.register("ep", handler, ttl=30, params=("token",))
    r1 = srv.handle("ep", {"token": "T"})
    r2 = srv.handle("ep", {"token": "T"})
    assert r1 == r2 == [{"id": 1, "v": "x"}]
    assert len(calls) == 1  # second hit served from cache
    now[0] = 31.0
    srv.handle("ep", {"token": "T"})
    assert len(calls) == 2  # recomputed after expiry
    with pytest.raises(ParamError):
        srv.handle("nope", {})
    with pytest.raises(ParamError):
        srv.handle("ep", {"token": "T", "bogus": 1})


def test_build_state_server_serves_state_and_pages(spark):
    state = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    state["posts"] = spark.createDataFrame(
        [("@a/p", "a", datetime.utcnow(), "tag1", None, True, False, "TKN",
          Decimal(0), None, None, Decimal(0), Decimal(0), 1.0, 1.0, 0,
          Decimal(0), "t", "d", 0, "", "", 0.0, False)],
        schemas.POSTS,
    )
    srv = build_state_server(state)
    assert "state" in srv.endpoints()
    rows = srv.handle("get_discussions_by_created", {"token": "tkn", "limit": "10"})
    assert len(rows) == 1 and rows[0]["authorperm"] == "@a/p"
    with pytest.raises(ParamError):
        srv.handle("get_discussions_by_created", {})  # token required
    # /state is a single object (reference app.py:107-119 jsonify(dict));
    # {} when no checkpoints exist yet
    assert srv.handle("state") == {}


# ---------------------------------------------------------------------------
# follow-refresh reconciliation (reference: engine/follow_storage.py:35-65)
# ---------------------------------------------------------------------------
def test_refresh_follows_set_diff_semantics(spark):
    follows = spark.createDataFrame(
        [("u", "keep", 1), ("u", "stale", 1), ("u", "muted", 2),
         ("other", "x", 1)],
        schemas.FOLLOWS,
    )
    fetched = spark.createDataFrame(
        [("u", "keep"), ("u", "new")], "follower string, following string"
    )
    got = {
        (r["follower"], r["following"]): r["state"]
        for r in refresh_follows(follows, fetched).collect()
    }
    assert got[("u", "keep")] == 1       # unchanged
    assert got[("u", "new")] == 1        # added
    assert got[("u", "stale")] == 0      # soft-removed, not deleted
    assert got[("u", "muted")] == 2      # mutes untouched
    assert got[("other", "x")] == 1      # follower not in snapshot: untouched


def test_cache_hits_are_isolated_from_caller_mutation(spark):
    """handle() must hand out copies: a caller slicing or annotating the
    result (offset pagination, response decoration) must not corrupt the
    cached rows for later requests."""
    from distribution_engine_smt_spark.serving import QueryServer, TTLCache

    clock = [0.0]
    srv = QueryServer(TTLCache(clock=lambda: clock[0]))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    srv.register("q", lambda p: df, ttl=60)

    first = srv.handle("q")
    del first[0]               # caller-side offset slicing
    first[0]["v"] = "mutated"  # caller-side row decoration

    second = srv.handle("q")   # cache hit — must be pristine
    assert second == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]


# ---------------------------------------------------------------------------
# HTTP shim e2e (reference: server/app.py:83-121 routes; :243-247 bad input
# -> jsonify([]))
# ---------------------------------------------------------------------------
def test_http_shim_serves_reference_wire_shape(spark):
    import urllib.request

    from distribution_engine_smt_spark.http_shim import serve

    state = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    state["posts"] = spark.createDataFrame(
        [("@a/p", "a", datetime.utcnow(), "tag1", None, True, False, "TKN",
          Decimal(0), None, None, Decimal(0), Decimal(0), 1.0, 1.0, 0,
          Decimal(0), "t", "d", 0, "", "", 0.0, False)],
        schemas.POSTS,
    )
    httpd = serve(build_state_server(state))
    port = httpd.server_address[1]
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                assert r.headers["Content-Type"] == "application/json"
                return r.status, json.loads(r.read().decode())

        # happy path: one post page, wire fields present — the api_edge
        # shaping splits authorperm and ISO-formats timestamps like the
        # reference's format_feed_data (app.py:380-447)
        status, rows = get("/get_discussions_by_created?token=tkn&limit=10")
        assert status == 200 and len(rows) == 1
        assert rows[0]["authorperm"] == "@a/p"
        assert rows[0]["author"] == "a" and rows[0]["permlink"] == "p"
        assert rows[0]["hive"] is False
        assert "T" in rows[0]["created"]  # ISO wire format, not raw timestamp
        # bad input (missing token) -> 200 + [] like the reference
        status, rows = get("/get_discussions_by_created")
        assert status == 200 and rows == []
        # unknown endpoint -> 200 + []
        status, rows = get("/no_such_endpoint")
        assert status == 200 and rows == []
        # /state is an object (reference jsonify(dict)); {} with no checkpoints
        status, rows = get("/state")
        assert status == 200 and rows == {}
        # blank param values survive parsing (?tag= -> tag="", like Flask's
        # request.args), rather than being dropped to "no tag filter"
        status, rows = get("/get_discussions_by_created?token=tkn&tag=&limit=10")
        assert status == 200 and rows == []  # tag="" matches no post
    finally:
        httpd.shutdown()


def test_full_endpoint_surface_served(spark):
    """Every indexed reference route (SURVEY §2.11) is registered and
    servable over HTTP, including the /@account path-param routes."""
    import urllib.request

    from distribution_engine_smt_spark.http_shim import serve

    state = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    state["posts"] = spark.createDataFrame(
        [("@a/p", "a", datetime.utcnow(), datetime.utcnow(), None, True, False,
          "TKN", Decimal(0), None, None, Decimal(0), Decimal(0), 1.0, 1.0, 0,
          Decimal(0), "t", "d", 0, "", "", 0.0, False)],
        schemas.POSTS,
    )
    srv = build_state_server(state)
    assert set(srv.endpoints()) == {
        "state", "config",
        "get_discussions_by_created", "get_discussions_by_trending",
        "get_discussions_by_hot", "get_discussions_by_promoted",
        "get_discussions_by_payout", "get_comment_discussions_by_payout",
        "get_discussions_by_blog", "get_feed",
        "get_discussions_by_comments", "get_discussions_by_replies",
        "get_thread", "get_account_history", "get_account", "get_post",
        "get_trending_tags", "get_follow_count", "get_following",
    }

    httpd = serve(srv)
    port = httpd.server_address[1]
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, json.loads(r.read().decode())

        # path-param routes map onto flat endpoints
        status, rows = get("/@a")
        assert status == 200 and rows == []  # accounts table empty
        status, rows = get("/@a/p?token=tkn")
        assert status == 200 and len(rows) == 1
        assert rows[0]["authorperm"] == "@a/p" and rows[0]["vote_count"] == 0
        # /config: array without token, object with it (reference
        # app.py:212-220; {} for an unknown token)
        status, rows = get("/config")
        assert status == 200 and isinstance(rows, list)
        status, obj = get("/config?token=nope")
        assert status == 200 and obj == {}
        # single-object endpoints
        status, obj = get("/get_follow_count?account=a")
        assert status == 200
        assert (obj["following_count"], obj["follower_count"]) == (0, 0)
        # representative list endpoints across the families
        for path in (
            "/config",
            "/get_thread?token=tkn&author=a&permlink=p",
            "/get_account_history?token=tkn&account=a",
            "/get_trending_tags?token=tkn",
            "/get_following?follower=a",
            "/get_feed?token=tkn&account=a",
            "/get_comment_discussions_by_payout?token=tkn",
        ):
            status, rows = get(path)
            assert status == 200 and isinstance(rows, list), path
    finally:
        httpd.shutdown()


def test_served_keyset_pagination_start_params(spark):
    """start_author/start_permlink page anchoring like the reference
    (app.py:599-639): the anchor post's created time bounds the page, and
    one param without the other is rejected to [] (app.py:616-619)."""
    from datetime import timedelta

    state = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}

    def post(ap, author, created):
        return (ap, author, created, created + timedelta(days=7), None, True,
                False, "TKN", Decimal(0), None, None, Decimal(0), Decimal(0),
                1.0, 1.0, 0, Decimal(0), "t", "d", 0, "", "", 0.0, False)

    t0 = datetime.utcnow()
    state["posts"] = spark.createDataFrame(
        [post("@a/new", "a", t0),
         post("@b/mid", "b", t0 - timedelta(hours=1)),
         post("@c/old", "c", t0 - timedelta(hours=2))],
        schemas.POSTS,
    )
    srv = build_state_server(state)

    full = srv.handle("get_discussions_by_created", {"token": "TKN"})
    assert [r["authorperm"] for r in full] == ["@a/new", "@b/mid", "@c/old"]

    page2 = srv.handle(
        "get_discussions_by_created",
        {"token": "TKN", "start_author": "b", "start_permlink": "mid"},
    )
    assert [r["authorperm"] for r in page2] == ["@b/mid", "@c/old"]

    with pytest.raises(ParamError):  # one start param without the other
        srv.handle(
            "get_discussions_by_created",
            {"token": "TKN", "start_author": "b"},
        )

    # score-family anchor: keyset bound via the anchor post's score
    trending = srv.handle(
        "get_discussions_by_trending",
        {"token": "TKN", "start_author": "b", "start_permlink": "mid"},
    )
    assert {r["authorperm"] for r in trending} <= {"@a/new", "@b/mid", "@c/old"}


def test_ttl_cache_is_thread_safe_under_churn():
    """ThreadingHTTPServer shares one TTLCache across handler threads
    (round-3 ADVICE): concurrent get-on-expired (double-del KeyError) and
    evict-while-insert (dict-changed-size RuntimeError) must not raise."""
    import threading

    now = [0.0]
    cache = TTLCache(clock=lambda: now[0], max_entries=64)
    errors = []

    def churn(tid):
        try:
            for i in range(2000):
                k = f"k{i % 100}"
                cache.put(k, f"v{tid}", ttl=0.5)
                cache.get(k)
                if i % 50 == 0:
                    now[0] += 0.3  # roll time so entries expire mid-churn
                if i % 400 == 0:
                    cache.invalidate("k1")
        except Exception as e:  # pragma: no cover - the failure being tested
            errors.append(e)

    threads = [threading.Thread(target=churn, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []


def test_cache_stores_wire_string_hits_do_no_row_work(spark):
    """The cache holds the serialized JSON string (round-3 verdict #4): a
    hit returns the identical immutable str object — zero per-row work."""
    clock = [0.0]
    srv = QueryServer(TTLCache(clock=lambda: clock[0]))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    srv.register("q", lambda p: df, ttl=60)

    s1 = srv.handle_json("q")
    s2 = srv.handle_json("q")
    assert isinstance(s1, str) and s1 is s2  # same cached object, no copy
    assert json.loads(s1) == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]


def test_cache_hits_are_isolated_at_nested_depth(spark):
    """Rows come from asDict(recursive=True) and can nest dicts/lists; a
    shallow copy would let a caller's nested annotation corrupt the cache
    (round-3 ADVICE) — handle() must deep-copy."""
    from distribution_engine_smt_spark.serving import QueryServer, TTLCache

    clock = [0.0]
    srv = QueryServer(TTLCache(clock=lambda: clock[0]))
    df = spark.createDataFrame(
        [(1, {"a": 1}, ["x", "y"])],
        "id int, meta map<string,int>, tags array<string>",
    )
    srv.register("q", lambda p: df, ttl=60)

    first = srv.handle("q")
    first[0]["meta"]["a"] = 999       # nested dict mutation
    first[0]["tags"].append("evil")   # nested list mutation

    second = srv.handle("q")          # cache hit — nested values pristine
    assert second == [{"id": 1, "meta": {"a": 1}, "tags": ["x", "y"]}]


# ---------------------------------------------------------------------------
# live-RPC composite endpoints: /get_staked_accounts (S10) + /info (S9)
# against a real local HTTP JSON-RPC fixture server
# ---------------------------------------------------------------------------
@pytest.fixture()
def engine_rpc_server():
    """Minimal engine-API JSON-RPC server: get_holder pages + find_one
    contract lookups, with a fail-first-N flake counter so degradation
    paths are provable (reference transports: Token.get_holder,
    engine_api.find_one)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    holders = [
        {"account": f"acct{i}", "symbol": "TKN", "stake": float(i % 5)}
        for i in range(2500)
    ]
    tables_ = {
        ("comments", "rewardPools"): [
            {"_id": 7, "pendingClaims": "123.4567", "rewardPool": "9876.5"}
        ],
        ("tokens", "tokens"): [
            {"symbol": "TKN", "precision": 8, "issuer": "tribe-issuer"}
        ],
    }
    state = {"fail_next": 0, "requests": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            with lock:
                state["requests"] += 1
                if state["fail_next"] > 0:
                    state["fail_next"] -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
            req = body if isinstance(body, dict) else body[0]
            method, params = req["method"], req["params"]
            if method == "get_holder":
                limit, offset = params
                result = holders[offset : offset + limit]
            elif method == "find_one":
                contract, table, query = params
                rows = tables_.get((contract, table), [])
                key, val = next(iter(query.items()))
                result = [r for r in rows if r.get(key) == val]
            else:
                result = None
            out = {"jsonrpc": "2.0", "id": req.get("id"), "result": result}
            payload = json.dumps(out if isinstance(body, dict) else [out]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", state
    httpd.shutdown()


def test_get_staked_accounts_served_full_list(spark, engine_rpc_server):
    """S10 wired end-to-end (reference app.py:356-377): the endpoint pages
    the holder scan to exhaustion (1000/page like the reference), returns
    the FULL positive-stake list unpaged, and the 24 h TTL caches it —
    the second call does zero RPC work."""
    from distribution_engine_smt_spark.rpc import rpc_holder_pager

    url, state = engine_rpc_server
    tstate = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    srv = build_state_server(
        tstate, fetch_holder_page=rpc_holder_pager(url)
    )
    assert "get_staked_accounts" in srv.endpoints()
    rows = srv.handle("get_staked_accounts", {"token": "TKN"})
    # 2500 holders, stake = i % 5 -> 4/5 have positive stake; FULL list,
    # not a 2*MAX_LIMIT page
    assert len(rows) == 2000
    assert rows[0] == {"name": "acct1", "staked_tokens": 1.0}
    n_rpc = state["requests"]
    assert n_rpc >= 3  # 2500 holders / 1000-page = 3 pages
    again = srv.handle("get_staked_accounts", {"token": "TKN"})
    assert len(again) == 2000 and state["requests"] == n_rpc  # TTL cache hit


def test_info_composes_indexed_config_with_live_reward_pool(spark, engine_rpc_server):
    """S9 wired end-to-end (reference app.py:125-196): /info joins the
    indexed token_config row with the live reward-pool + token-metadata
    find_one lookups; object shape with ?token=, array without."""
    from distribution_engine_smt_spark.rpc import rpc_find_one_fetcher

    url, _ = engine_rpc_server
    tstate = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    tstate["token_config"] = spark.createDataFrame(
        [("TKN", 7, 50, Decimal("1.0"), Decimal("0.5"), 0, None, None, 7,
          "tkn-acct", 5, 5, False, False)],
        schemas.TOKEN_CONFIG,
    )
    srv = build_state_server(tstate, find_one=rpc_find_one_fetcher(url))
    assert "info" in srv.endpoints()
    obj = srv.handle("info", {"token": "TKN"})
    assert obj["pending_rshares"] == 123.4567
    assert obj["reward_pool"] == 9876.5
    assert obj["precision"] == 8 and obj["issuer"] == "tribe-issuer"
    arr = srv.handle("info")
    assert isinstance(arr, list) and arr[0]["token"] == "TKN"


def test_info_degrades_to_zero_shape_when_rpc_unreachable(spark):
    """The reference's 'predictable shape for the frontend' (app.py:140-144):
    an unreachable engine API yields zero-valued pool fields and fallback
    precision 0 instead of a 500."""
    from distribution_engine_smt_spark.rpc import rpc_find_one_fetcher

    tstate = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    tstate["token_config"] = spark.createDataFrame(
        [("TKN", 7, 50, Decimal("1.0"), Decimal("0.5"), 0, None, None, 7,
          "tkn-acct", 5, 5, False, False)],
        schemas.TOKEN_CONFIG,
    )
    dead = rpc_find_one_fetcher(
        "http://127.0.0.1:9", timeout=0.2, attempts=1  # nothing listens
    )
    srv = build_state_server(tstate, find_one=dead)
    obj = srv.handle("info", {"token": "TKN"})
    assert obj["pending_rshares"] == 0 and obj["reward_pool"] == 0
    assert obj["precision"] == 0 and obj["issuer"] is None


def test_http_shim_gzips_large_bodies(spark):
    """Wire parity with the reference's flask-compress (server/app.py:44):
    bodies >= GZIP_MIN_BYTES gzip when the client advertises support;
    small bodies and no-Accept-Encoding clients get identity."""
    import gzip as _gzip
    import urllib.request

    from distribution_engine_smt_spark.http_shim import serve

    state = {n: tables.empty_table(spark, n) for n in schemas.STATE_TABLES}
    state["posts"] = spark.createDataFrame(
        [
            (f"@a/p{i}", "a", datetime.utcnow(), "tag1", None, True, False,
             "TKN", Decimal(0), None, None, Decimal(0), Decimal(0), 1.0, 1.0,
             0, Decimal(0), "t", "d", 0, "", "", 0.0, False)
            for i in range(10)
        ],
        schemas.POSTS,
    )
    httpd = serve(build_state_server(state))
    port = httpd.server_address[1]
    try:
        big = f"http://127.0.0.1:{port}/get_discussions_by_created?token=tkn&limit=10"
        req = urllib.request.Request(big, headers={"Accept-Encoding": "gzip"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Encoding"] == "gzip"
            rows = json.loads(_gzip.decompress(r.read()).decode())
            assert len(rows) == 10
        # same resource without Accept-Encoding: identity bytes
        with urllib.request.urlopen(big) as r:
            assert r.headers.get("Content-Encoding") is None
            assert len(json.loads(r.read().decode())) == 10
        # tiny body (bad input -> []) stays identity even when accepted
        small = urllib.request.Request(
            f"http://127.0.0.1:{port}/no_such_endpoint",
            headers={"Accept-Encoding": "gzip"},
        )
        with urllib.request.urlopen(small) as r:
            assert r.headers.get("Content-Encoding") is None
            assert json.loads(r.read().decode()) == []
        # q-value refusal: "gzip;q=0" means NO gzip (flask-compress /
        # werkzeug parse q-values; a substring check would compress)
        refuse = urllib.request.Request(
            big, headers={"Accept-Encoding": "gzip;q=0, identity"}
        )
        with urllib.request.urlopen(refuse) as r:
            assert r.headers.get("Content-Encoding") is None
            assert len(json.loads(r.read().decode())) == 10
        # Vary: Accept-Encoding is sent on the IDENTITY response too, so a
        # cache never serves the uncompressed body to a gzip client keyless
        with urllib.request.urlopen(big) as r:
            assert r.headers.get("Vary") == "Accept-Encoding"
        # wildcard acceptance compresses
        wild = urllib.request.Request(big, headers={"Accept-Encoding": "*"})
        with urllib.request.urlopen(wild) as r:
            assert r.headers["Content-Encoding"] == "gzip"
    finally:
        httpd.shutdown()
