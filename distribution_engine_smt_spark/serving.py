"""Serving shell over the query library: param validation, limit clamps,
and a TTL result cache — the Spark-side equivalent of the reference's
read-path HTTP server (reference: server/app.py:42-54 flask-caching with
CACHE_DEFAULT_TIMEOUT=300, per-endpoint TTLs 60 s (/info, app.py:125) to
86400 s (/get_trending_tags, app.py:875; /get_staked_accounts, app.py:357);
4 gunicorn workers in run-prod-api-server.sh:6).

Design: the engine stays a library — this module owns everything an HTTP
frontend (Flask, FastAPI, a Spark Connect client...) would need besides the
socket itself, so the frontend is a 10-line shim. Results are cached as
materialized row lists keyed by (endpoint, sorted params), exactly like
flask-caching's query_string=True keying; Spark is only consulted on a
miss. At scale the cache sits in front of a long-lived SparkSession with
the state tables registered, and hot endpoints (trending/hot pages) are
answered entirely from cache between 3 s stream ticks.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame


def json_default(value):
    """Row values json.dumps can't encode natively: Decimal amounts and any
    timestamp that skipped the in-plan wire formatting."""
    import datetime
    import decimal

    if isinstance(value, decimal.Decimal):
        return float(value)
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    raise TypeError(f"not JSON serializable: {type(value)!r}")

# reference TTLs (seconds): default 300 (app.py:46), /info 60 (app.py:125),
# trending tags / staked accounts 86400 (app.py:357,875)
DEFAULT_TTL = 300
MAX_LIMIT = 1000  # the reference's hard page cap (engine/post_storage.py)


class ParamError(ValueError):
    """Invalid request parameter — the frontend maps this to the reference's
    empty-result response (app.py:243-247 returns jsonify([]))."""


def clamp_limit(value, default: int = 20, max_limit: int = MAX_LIMIT) -> int:
    """Parse + clamp a limit param the way every reference endpoint does
    (int() with fallback, then the storage layer's 1000 cap)."""
    if value is None:
        return default
    try:
        limit = int(value)
    except (TypeError, ValueError):
        raise ParamError(f"limit is not an integer: {value!r}")
    if limit < 1:
        return default
    return min(limit, max_limit)


def parse_offset(value, default: int = 0) -> int:
    if value is None:
        return default
    try:
        offset = int(value)
    except (TypeError, ValueError):
        raise ParamError(f"offset is not an integer: {value!r}")
    return max(offset, 0)


def require_token(params: dict) -> str:
    """token is mandatory and case-normalized (reference upper()s it at
    every endpoint, e.g. app.py:236)."""
    token = params.get("token")
    if not token:
        raise ParamError("token is required")
    return str(token).upper()


@dataclass
class _Entry:
    expires_at: float
    value: Any


class TTLCache:
    """(endpoint, params) -> materialized result with per-entry TTL.
    The clock is injectable so expiry is unit-testable without sleeping.

    Thread-safe: the HTTP shim serves from a ThreadingHTTPServer (like the
    reference's 4 gunicorn workers, run-prod-api-server.sh:6), so get/put/
    evict race without a lock — two threads expiring the same key would
    double-del (KeyError), and eviction iterating while another thread
    inserts would raise RuntimeError. One plain Lock; the critical sections
    are dict ops on at most max_entries items, never Spark work."""

    def __init__(self, clock: Callable[[], float] = time.monotonic, max_entries: int = 10_000):
        self._clock = clock
        self._max = max_entries
        self._data: dict[str, _Entry] = {}
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(endpoint: str, params: dict) -> str:
        # sorted-params JSON == flask-caching's query_string=True keying
        return endpoint + "?" + json.dumps(params, sort_keys=True, default=str)

    def get(self, key: str):
        with self._lock:
            e = self._data.get(key)
            if e is None or e.expires_at <= self._clock():
                if e is not None:
                    del self._data[key]
                self.misses += 1
                return None
            self.hits += 1
            return e.value

    def put(self, key: str, value, ttl: float) -> None:
        with self._lock:
            if len(self._data) >= self._max:
                self._evict_locked()
            self._data[key] = _Entry(self._clock() + ttl, value)

    def _evict_locked(self) -> None:
        # caller holds self._lock
        now = self._clock()
        expired = [k for k, e in self._data.items() if e.expires_at <= now]
        for k in expired:
            del self._data[k]
        while len(self._data) >= self._max:  # oldest-expiry out first
            k = min(self._data, key=lambda k: self._data[k].expires_at)
            del self._data[k]

    def invalidate(self, prefix: str | None = None) -> None:
        with self._lock:
            if prefix is None:
                self._data.clear()
            else:
                for k in [k for k in self._data if k.startswith(prefix)]:
                    del self._data[k]


@dataclass
class Endpoint:
    """One served query: handler(params) -> DataFrame, plus cache TTL and
    the declared params it accepts (unknown params are rejected early so a
    typo'd param never silently returns page 1 of everything).

    ``single_row=True`` emits the first row as one JSON object instead of an
    array — the reference's ``/state`` wire shape (server/app.py:83-121
    ``jsonify(data)`` of a dict, not a list); ``{}`` when the query is empty.
    A callable ``single_row(params) -> bool`` decides per request — the
    reference's ``/config`` is an array without ``token`` and an object with
    it (app.py:212-220).
    """

    handler: Callable[[dict], DataFrame]
    ttl: float = DEFAULT_TTL
    params: tuple[str, ...] = ()
    single_row: bool | Callable[[dict], bool] = False
    # rows materialized per response; None = the 2*MAX_LIMIT page default.
    # /get_staked_accounts overrides: the reference returns the FULL holder
    # list (server/app.py:356-377), not a page
    row_cap: int | None = None


class QueryServer:
    """Transport-agnostic serving core: register endpoints, call
    ``handle(endpoint, params)``, get JSON-ready rows. Mirrors the
    reference server's behavior contract:

    - unknown endpoint / bad params -> ParamError (frontend: empty JSON)
    - results cached (endpoint, params)-keyed with per-endpoint TTL
    - every result fully materialized and row-capped at MAX_LIMIT * 2
      (discussions endpoints fetch limit+offset rows, both clamped)
    """

    def __init__(self, cache: TTLCache | None = None):
        self.cache = cache or TTLCache()
        self._endpoints: dict[str, Endpoint] = {}

    def register(self, name: str, handler: Callable[[dict], DataFrame],
                 ttl: float = DEFAULT_TTL, params: tuple[str, ...] = (),
                 single_row: bool = False, row_cap: int | None = None) -> None:
        self._endpoints[name] = Endpoint(handler, ttl, params, single_row, row_cap)

    def endpoints(self) -> list[str]:
        return sorted(self._endpoints)

    def handle_json(self, name: str, params: dict | None = None) -> str:
        """Serve an endpoint as its final JSON wire string.

        The cache stores the serialized string, not row dicts: a hit is a
        single immutable-string return — zero per-row Python work and
        corruption-proof by construction (an HTTP frontend writes the string
        straight to the socket; the reference re-serializes per request via
        jsonify, so caching post-serialization strictly dominates)."""
        params = params or {}
        ep = self._endpoints.get(name)
        if ep is None:
            raise ParamError(f"unknown endpoint: {name}")
        if ep.params:
            unknown = set(params) - set(ep.params)
            if unknown:
                raise ParamError(f"unknown params for {name}: {sorted(unknown)}")
        key = self.cache.key(name, params)
        cached = self.cache.get(key)
        if cached is not None:
            return cached
        df = ep.handler(params)
        capped = df.limit(ep.row_cap if ep.row_cap is not None else 2 * MAX_LIMIT)
        rows = [r.asDict(recursive=True) for r in capped.collect()]
        single = ep.single_row(params) if callable(ep.single_row) else ep.single_row
        payload: Any = (rows[0] if rows else {}) if single else rows
        body = json.dumps(payload, default=json_default)
        self.cache.put(key, body, ep.ttl)
        return body

    def handle(self, name: str, params: dict | None = None):
        """Serve an endpoint as Python objects (list of row dicts; a single
        dict for ``single_row`` endpoints). Decoded fresh from the cached
        JSON string each call, so callers can mutate freely without
        corrupting the cache."""
        return json.loads(self.handle_json(name, params))


def require_param(params: dict, key: str) -> str:
    value = params.get(key)
    if not value:
        raise ParamError(f"{key} is required")
    return str(value)


def build_state_server(
    state: dict[str, DataFrame],
    cache: TTLCache | None = None,
    *,
    fetch_holder_page: Callable[[int, int], list[dict]] | None = None,
    find_one: Callable[[str, str, dict], dict | None] | None = None,
) -> QueryServer:
    """Wire the FULL endpoint surface over a loaded state dict — every
    reference route the engine indexes (SURVEY.md §2.11; reference:
    server/app.py:83-962), plus the two live-RPC composites when their
    transports are supplied:

    - ``fetch_holder_page`` (``rpc.rpc_holder_pager``) serves
      /get_staked_accounts (S10: paged holder scan, 24 h TTL —
      app.py:356-377);
    - ``find_one`` (``rpc.rpc_find_one_fetcher``) serves /info (S9: the
      indexed token_config row composed with the live reward-pool and
      token-metadata lookups, 60 s TTL, zero-valued predictable shape
      when the RPC is unreachable — app.py:125-196).

    Without them the server covers the indexed surface only (/config is
    the indexed part of /info)."""
    from .queries import get_state_lag
    from .queries.accounts import (
        get_account_history,
        get_account_map,
        get_post_with_votes,
        get_token_config,
    )
    from .queries.api_edge import format_discussion_rows
    from .queries.discussions import (
        get_discussions_by_blog,
        get_discussions_by_comments,
        get_discussions_by_created,
        get_discussions_by_feed,
        get_discussions_by_replies,
        get_discussions_by_score,
    )
    from .queries.social import get_follow_count, get_following, get_trending_tags
    from .queries.thread import get_thread

    srv = QueryServer(cache)
    srv.register(
        "state",
        lambda p: get_state_lag(state),
        ttl=3,  # refreshes with the stream tick; effectively uncached
        params=(),
        single_row=True,  # reference /state is one JSON object (app.py:107-119)
    )
    srv.register(
        "config",  # indexed part of /info + /config (app.py:125-222);
        # array without token, single object (or {}) with it (app.py:212-220)
        lambda p: get_token_config(state, p.get("token")),
        ttl=60,
        params=("token",),
        single_row=lambda p: bool(p.get("token")),
    )
    def _start_authorperm(p: dict) -> str | None:
        """Keyset-pagination anchor from start_author/start_permlink — the
        reference rejects one without the other (app.py:616-619 jsonify([]))."""
        sa, sp = p.get("start_author"), p.get("start_permlink")
        if sa is None and sp is None:
            return None
        if not sa or not sp:
            raise ParamError("start_author and start_permlink go together")
        return f"@{sa}/{sp}"

    def _anchor_ts(token: str, p: dict):
        """Resolve the anchor post's created time like the reference's
        get_token_post pre-query (app.py:624-630); unknown anchor -> no
        bound, matching the reference's None fallthrough."""
        ap = _start_authorperm(p)
        if ap is None:
            return None
        from pyspark.sql import functions as F

        row = (
            state["posts"]
            .filter(
                (F.col("token") == token)
                & F.col("authorperm").isin(ap, f"h{ap}")
            )
            .select("created")
            .first()
        )
        return row["created"] if row else None

    _PAGE_PARAMS = ("token", "tag", "limit", "start_author", "start_permlink")

    # every discussion page goes through the api_edge wire shaping, like
    # the reference's format_feed_data per-row pass (app.py:380-447)
    srv.register(
        "get_discussions_by_created",
        lambda p: (lambda tok: format_discussion_rows(get_discussions_by_created(
            state, tok, tag=p.get("tag"),
            limit=clamp_limit(p.get("limit")), anchor_ts=_anchor_ts(tok, p),
        )))(require_token(p)),
        ttl=DEFAULT_TTL,
        params=_PAGE_PARAMS,
    )
    for route, score_key, main in (
        ("get_discussions_by_trending", "score_trend", True),
        ("get_discussions_by_hot", "score_hot", True),
        ("get_discussions_by_promoted", "promoted", True),
        ("get_discussions_by_payout", "total_payout_value", True),
        ("get_comment_discussions_by_payout", "total_payout_value", False),
    ):
        srv.register(
            route,
            lambda p, sk=score_key, mp=main: format_discussion_rows(
                get_discussions_by_score(
                    state, require_token(p), sk, tag=p.get("tag"),
                    limit=clamp_limit(p.get("limit")), main_post=mp,
                    anchor_authorperm=_start_authorperm(p),
                )
            ),
            ttl=DEFAULT_TTL,
            params=_PAGE_PARAMS,
        )
    for route, fn in (
        ("get_discussions_by_blog", get_discussions_by_blog),
        ("get_feed", get_discussions_by_feed),
        ("get_discussions_by_comments", get_discussions_by_comments),
        ("get_discussions_by_replies", get_discussions_by_replies),
    ):
        srv.register(
            route,
            lambda p, f=fn: (lambda tok: format_discussion_rows(f(
                state, tok, require_param(p, "account"),
                limit=clamp_limit(p.get("limit")), anchor_ts=_anchor_ts(tok, p),
            )))(require_token(p)),
            ttl=DEFAULT_TTL,
            params=("token", "account", "limit", "start_author", "start_permlink"),
        )
    srv.register(
        "get_thread",  # app.py:497-531 — author + permlink params like the reference
        lambda p: get_thread(
            state, require_token(p),
            f"@{require_param(p, 'author')}/{require_param(p, 'permlink')}",
        ),
        ttl=DEFAULT_TTL,
        params=("token", "author", "permlink"),
    )
    srv.register(
        "get_account_history",  # app.py:225-284
        lambda p: get_account_history(
            state, require_token(p), account=p.get("account"),
            author=p.get("author"), type_filter=p.get("type"),
            limit=clamp_limit(p.get("limit")), offset=parse_offset(p.get("offset")),
        ),
        ttl=DEFAULT_TTL,
        params=("token", "account", "author", "type", "limit", "offset"),
    )
    srv.register(
        "get_account",  # /@<account> (app.py:287-311); shim maps the path
        lambda p: get_account_map(state, require_param(p, "account")),
        ttl=DEFAULT_TTL,
        params=("account",),
    )
    srv.register(
        "get_post",  # /@<account>/<permlink> (app.py:314-353); shim-mapped
        lambda p: get_post_with_votes(
            state, require_token(p),
            f"@{require_param(p, 'account')}/{require_param(p, 'permlink')}",
        ),
        ttl=DEFAULT_TTL,
        params=("token", "account", "permlink"),
    )
    srv.register(
        "get_trending_tags",  # app.py:875 — 24 h cache like the reference
        lambda p: get_trending_tags(
            state, require_token(p), limit=clamp_limit(p.get("limit")),
        ),
        ttl=86400,
        params=("token", "limit"),
    )
    srv.register(
        "get_follow_count",  # app.py (A4)
        lambda p: get_follow_count(state, require_param(p, "account")),
        ttl=DEFAULT_TTL,
        params=("account",),
        single_row=True,
    )
    srv.register(
        "get_following",  # app.py:930-962 — follower param, limit default 1000
        lambda p: get_following(
            state, require_param(p, "follower"), start_name=p.get("start"),
            limit=clamp_limit(p.get("limit"), default=1000),
        ),
        ttl=DEFAULT_TTL,
        params=("follower", "start", "limit"),
    )

    if fetch_holder_page is not None:
        from .sources import staked_accounts

        def _staked(p: dict) -> DataFrame:
            from pyspark.sql import functions as F

            spark = next(iter(state.values())).sparkSession
            # the supplied pager is bound to the deployment's token (the
            # reference is deployed per tribe); the token param rides in
            # the cache key for wire compatibility (app.py:357 query_string)
            return staked_accounts(spark, fetch_holder_page).select(
                F.col("account").alias("name"),
                F.col("stake").cast("decimal(38,10)").alias("staked_tokens"),
            )

        srv.register(
            "get_staked_accounts",  # app.py:356-377 — 24 h TTL, FULL list
            _staked,
            ttl=86400,
            params=("token",),
            row_cap=10_000_000,  # reference returns every holder, unpaged
        )

    if find_one is not None:

        def _info(p: dict) -> DataFrame:
            from decimal import Decimal

            spark = next(iter(state.values())).sparkSession
            cfg = get_token_config(state, p.get("token"))
            out = []
            for r in cfg.collect():  # token_config is a tiny dim table
                # the reference's "predictable shape for the frontend":
                # zero-valued pool when config/RPC gives nothing
                # (app.py:140-144)
                pending, pool_val = Decimal(0), Decimal(0)
                precision, issuer = 0, None
                pool_id = r["reward_pool_id"]
                if pool_id is not None:
                    try:
                        pool = find_one(
                            "comments", "rewardPools", {"_id": int(pool_id)}
                        )
                    except Exception:  # degrade, don't fail the endpoint
                        pool = None
                    if isinstance(pool, dict):
                        pending = Decimal(str(pool["pendingClaims"]))
                        pool_val = Decimal(str(pool["rewardPool"]))
                try:
                    tok = find_one("tokens", "tokens", {"symbol": r["token"]})
                except Exception:
                    tok = None
                if isinstance(tok, dict):
                    precision = int(tok.get("precision", 0))
                    issuer = tok.get("issuer")
                out.append((r["token"], pending, pool_val, precision, issuer))
            return spark.createDataFrame(
                out,
                "token string, pending_rshares decimal(38,10), "
                "reward_pool decimal(38,10), precision int, issuer string",
            )

        srv.register(
            "info",  # app.py:125-196 — 60 s TTL; object with token, array without
            _info,
            ttl=60,
            params=("token",),
            single_row=lambda p: bool(p.get("token")),
        )

    return srv
