"""Zero-dependency HTTP binding for the serving facade.

The reference exposes its readonly client over Flask
([P] rest_api/api.py: route → query-string parse → Query →
``get_statements`` → JSON response). ``api.py`` here carries all of that
except the framework glue; this module supplies the glue with the
stdlib's ``http.server`` — no Flask/werkzeug exists in this environment,
and none is needed for a correct, testable binding. Endpoints mirror the
reference's result modes ([P] rest_api route families
``/statements/from_agents`` etc., one per QueryResult grain):

    GET /health                           liveness probe, no Spark work
    GET /statements?...                   hydrated statements + evidences
    GET /statements/json?...              (mk_hash, stmt_json) payload edge
    GET /interactions?...                 hash-grain rows
    GET /relations?...                    (agent pair, type) grain
    GET /agents?...                       agent-pair grain

Query-string conventions are exactly ``api.parse_query``'s (repeated
params become lists; ``limit``/``offset``/``ev_limit``/``sort_by``/
``after`` result controls on /statements*). Responses are JSON arrays
rendered JVM-side — ``F.to_json(struct(*))`` per row, no Python
serialization loop — and every endpoint enforces a row cap
(``limit`` param, default :data:`DEFAULT_LIMIT`, ceiling
:data:`MAX_LIMIT`): a serving edge must never ``collect()`` an unbounded
result. Parse/validation errors → 400 with a JSON error body; unknown
routes → 404; engine faults → 500. The driver-side collect is the only
non-distributed step, bounded by MAX_LIMIT rows of already-aggregated
output — the same shape as the reference's Flask handlers.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.api import _RESULT_PARAMS, parse_query, result_kwargs
from indra_db_spark.plans.query import QueryContext

DEFAULT_LIMIT = 1000
MAX_LIMIT = 10_000


def _params_from_qs(qs: str) -> dict[str, Any]:
    """parse_qs lists → scalar-or-list params (parse_query handles both)."""
    return {
        k: v[0] if len(v) == 1 else v for k, v in parse_qs(qs).items()
    }


def _capped_limit(params: dict[str, Any]) -> int:
    limit = int(params.get("limit", DEFAULT_LIMIT))
    if not 0 < limit <= MAX_LIMIT:
        raise ValueError(f"limit must be in 1..{MAX_LIMIT}, got {limit}")
    return limit


def _json_rows(df: DataFrame, n: int) -> bytes:
    """First n rows as a JSON array, serialized JVM-side."""
    rows = (
        df.limit(n)
        .select(F.to_json(F.struct(*df.columns)).alias("j"))
        .collect()
    )
    return ("[" + ",".join(r["j"] for r in rows) + "]").encode()


def handle_request(path: str, ctx: QueryContext) -> tuple[int, bytes]:
    """Route one GET path (with query string) → (status, JSON body).

    Pure function of (path, ctx) — the unit under test; the HTTP handler
    below is transport only."""
    parts = urlsplit(path)
    route = parts.path.rstrip("/") or "/"
    if route == "/health":
        return 200, b'{"status": "ok"}'
    try:
        params = _params_from_qs(parts.query)
        if route == "/statements":
            limit = _capped_limit(params)
            kw = result_kwargs(params) | {"limit": limit}
            df = parse_query(params).get_statements(ctx, **kw)
            return 200, _json_rows(df, limit)
        if route == "/statements/json":
            limit = _capped_limit(params)
            kw = result_kwargs(params) | {"limit": limit}
            df = parse_query(params).get_statements_json(ctx, **kw)
            return 200, _json_rows(df, limit)
        if route in ("/interactions", "/relations", "/agents"):
            limit = _capped_limit(params)
            rest = {k: v for k, v in params.items() if k != "limit"}
            # these routes apply only `limit`; silently accepting other
            # result-control params (offset/sort_by/ev_limit/after) would
            # return the first page with 200 instead of an error
            # (ADVICE r5) — reject them explicitly
            unsupported = sorted(set(rest) & _RESULT_PARAMS)
            if unsupported:
                raise ValueError(
                    f"{', '.join(unsupported)} not supported for {route}"
                )
            df = getattr(parse_query(rest), f"get_{route[1:]}")(ctx)
            return 200, _json_rows(df, limit)
        return 404, json.dumps({"error": f"no such route: {route}"}).encode()
    except (ValueError, KeyError, TypeError) as e:
        # TypeError: repeated scalar params arrive as lists (int([...]))
        return 400, json.dumps({"error": str(e)}).encode()


def make_server(
    ctx: QueryContext, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (without starting) the HTTP server; ``port=0`` picks a free
    port (``server.server_address`` has the bound one). Threading server:
    Spark supports concurrent driver-side actions, and each request is an
    independent bounded collect."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            try:
                status, body = handle_request(self.path, ctx)
            except Exception as e:  # engine fault — never drop the socket
                status = 500
                body = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args: Any) -> None:  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_background(
    ctx: QueryContext, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the server on a daemon thread (tests / notebooks); call
    ``server.shutdown()`` to stop."""
    server = make_server(ctx, host, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, t


def serve(ctx: QueryContext, host: str = "127.0.0.1", port: int = 8000) -> None:
    """Blocking entrypoint: expose a pipeline output dir over HTTP.

    Typical use::

        ctx = api.load_context(spark, out_dir, bucketed=True)
        server.serve(ctx, port=8000)
    """
    make_server(ctx, host, port).serve_forever()
