"""Stdlib-HTTP frontend over the transport-agnostic ``QueryServer`` —
the last inch of reference parity for the read API (reference:
``server/app.py:83-121`` Flask routes + ``run-prod-api-server.sh:6``
4 gunicorn workers).  Flask/FastAPI are absent from this container, so the
shim uses ``http.server.ThreadingHTTPServer`` (threaded ≙ the reference's
worker concurrency; the underlying ``QueryServer`` TTL cache is the shared
layer that makes concurrent readers cheap).

Behavior contract mirrored from the reference:
- route = ``GET /<endpoint>?<params>`` — endpoint names match
  ``QueryServer.register`` names (``/state``,
  ``/get_discussions_by_created``, ...).
- invalid params / unknown endpoint -> HTTP 200 with ``[]`` (the reference
  returns ``jsonify([])`` on bad input, app.py:243-247, rather than 4xx).
- responses are ``application/json`` arrays of row objects; timestamps and
  nested values were already wire-shaped in-plan (queries/api_edge.py).
  Endpoints registered ``single_row=True`` (``/state``) emit one JSON object,
  matching the reference's ``jsonify(data)`` of a dict (app.py:107-119).

The shim is deliberately ~a screenful: everything stateful (validation,
clamps, caching, materialization caps) lives in ``serving.QueryServer``.
"""

from __future__ import annotations

import gzip
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .serving import ParamError, QueryServer

# flask-compress default: don't gzip tiny bodies (reference server/app.py:44
# wires Compress(app); its COMPRESS_MIN_SIZE default is 500 bytes)
GZIP_MIN_BYTES = 500


def _accepts_gzip(accept_encoding: str) -> bool:
    """RFC 7231 Accept-Encoding check for gzip, honoring q-values the way
    flask-compress (werkzeug) does: ``gzip;q=0`` is an explicit refusal,
    ``*`` matches gzip unless gzip is listed separately, absent header
    means no preference (we don't compress then — matching the previous
    conservative behavior)."""
    q: dict[str, float] = {}
    for part in accept_encoding.split(","):
        part = part.strip().lower()
        if not part:
            continue
        name, _, params = part.partition(";")
        name = name.strip()
        qv = 1.0
        for p in params.split(";"):
            k, _, v = p.strip().partition("=")
            if k.strip() == "q":
                try:
                    qv = float(v)
                except ValueError:
                    qv = 0.0
        q[name] = qv
    if "gzip" in q:
        return q["gzip"] > 0.0
    if "x-gzip" in q:
        return q["x-gzip"] > 0.0
    return q.get("*", 0.0) > 0.0


def make_handler(query_server: QueryServer):
    """Bind a BaseHTTPRequestHandler subclass to one QueryServer."""

    class Handler(BaseHTTPRequestHandler):
        server_version = "EngineShim/1.0"

        def log_message(self, fmt, *args):  # quiet: tests and prod both log upstream
            pass

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            endpoint = url.path.strip("/")
            # flask request.args keeps the first value per key, and keeps
            # blank values (?tag= means tag="", not "no tag param")
            params = {
                k: v[0]
                for k, v in parse_qs(url.query, keep_blank_values=True).items()
            }
            # the reference's path-param routes (app.py:287 /@<account>,
            # :314 /@<account>/<permlink>) map onto flat endpoints
            if endpoint.startswith("@"):
                parts = endpoint[1:].split("/", 1)
                if len(parts) == 1:
                    endpoint, params["account"] = "get_account", parts[0]
                else:
                    endpoint = "get_post"
                    params["account"], params["permlink"] = parts
            try:
                # handle_json returns the cached wire string — a hit does
                # zero per-row Python work in the request thread
                body_str = query_server.handle_json(endpoint, params)
                status = 200
            except ParamError:
                body_str, status = "[]", 200  # reference: jsonify([]) on bad input
            except Exception:  # pragma: no cover - defensive 500
                body_str, status = "[]", 500
            body = body_str.encode("utf-8")
            # wire parity with the reference's flask-compress: gzip when the
            # client advertises support and the body clears the floor.
            # q-values are honored ("gzip;q=0" is an explicit refusal, which
            # a bare substring check would mis-read as acceptance).
            accept = self.headers.get("Accept-Encoding", "")
            gzipped = _accepts_gzip(accept) and len(body) >= GZIP_MIN_BYTES
            if gzipped:
                body = gzip.compress(body, compresslevel=6)
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            # Vary on EVERY compressible response (not just compressed ones):
            # a cache that stored the identity body without it could serve
            # that body to a gzip-accepting client and vice versa
            self.send_header("Vary", "Accept-Encoding")
            if gzipped:
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(
    query_server: QueryServer, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Start the HTTP frontend on a daemon thread and return the server
    (``server.server_address[1]`` is the bound port; pass ``port=0`` for an
    ephemeral one).  Call ``server.shutdown()`` to stop."""
    httpd = ThreadingHTTPServer((host, port), make_handler(query_server))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
