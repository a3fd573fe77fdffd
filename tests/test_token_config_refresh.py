"""Bulk token-config refresh (reference update_token_config.py:17-23):
GET /config -> one set-based merge_upsert keyed on ``token``.

Fixture mirrors test_rpc.py's discipline: a real local HTTP server, a
configurable failure budget, so the retry loop and the partial-update
(``dataset.upsert``) semantics are proven against live sockets."""

from __future__ import annotations

import json
import threading
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from distribution_engine_smt_spark.rpc import http_get_json, rpc_config_fetcher
from distribution_engine_smt_spark.schemas import TOKEN_CONFIG
from distribution_engine_smt_spark.sources import refresh_token_config

CONFIGS = [
    # existing token: payload updates SOME fields, omits the rest
    {"token": "ALPHA", "cashout_window_days": 10, "reward_pool_id": 7},
    # brand-new token: only payload fields present, others NULL-fill
    {"token": "BETA", "cashout_window_days": 3, "curation_reward_percentage": 50,
     "author_curve_exponent": 1.5},
    # junk rows the reference's per-row upsert would crash on; we skip
    {"no_token_key": True},
]


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.fail_next = 0
        self.requests = 0


@pytest.fixture(scope="module")
def config_server():
    state = _State()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            with state.lock:
                state.requests += 1
                if state.fail_next > 0:
                    state.fail_next -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
            data = json.dumps(CONFIGS).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/config", state
    srv.shutdown()


def _seed_token_config(spark):
    return spark.createDataFrame(
        [
            (
                "ALPHA", 7, 75, Decimal("1.0"), Decimal("0.5"), 0, "null",
                "promo-acct", 1, "alpha-acct", 5, 5, False, False,
            )
        ],
        TOKEN_CONFIG,
    )


def test_refresh_upserts_and_keeps_omitted_columns(spark, config_server):
    url, _ = config_server
    out = refresh_token_config(
        spark, _seed_token_config(spark), rpc_config_fetcher(url)
    ).orderBy("token")
    rows = {r["token"]: r for r in out.collect()}
    assert set(rows) == {"ALPHA", "BETA"}  # junk row skipped
    a = rows["ALPHA"]
    # updated fields take the payload value
    assert a["cashout_window_days"] == 10 and a["reward_pool_id"] == 7
    # omitted fields keep the stored value (dataset.upsert semantics)
    assert a["promoted_post_account"] == "promo-acct"
    assert a["token_account"] == "alpha-acct"
    assert a["curation_curve_exponent"] == Decimal("0.5000")
    b = rows["BETA"]
    assert b["cashout_window_days"] == 3
    assert b["author_curve_exponent"] == Decimal("1.5000")
    assert b["token_account"] is None  # new key: unspecified -> NULL
    # schema is unchanged by the refresh (serving reads it downstream)
    assert out.schema == _seed_token_config(spark).schema


def test_refresh_survives_transient_http_failures(spark, config_server):
    url, state = config_server
    with state.lock:
        state.fail_next = 2
    out = refresh_token_config(
        spark, _seed_token_config(spark), rpc_config_fetcher(url)
    )
    assert out.count() == 2


def test_http_get_json_gives_up_after_bound(config_server):
    url, state = config_server
    with state.lock:
        state.fail_next = 99
    with pytest.raises(RuntimeError, match="failed after"):
        http_get_json(url, attempts=3, backoff_s=0.0)
    with state.lock:
        state.fail_next = 0


def test_empty_payload_is_a_noop(spark):
    seed = _seed_token_config(spark)
    out = refresh_token_config(spark, seed, lambda: [])
    assert out is seed
