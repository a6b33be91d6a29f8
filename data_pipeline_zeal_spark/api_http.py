"""REST layer over the API query surface (reference parity:
``api/src/routers/aggregations.py:58-219`` + ``health.py``).

The reference serves Q1-Q9 as FastAPI routes backed by Postgres; here the
same routes run the DataFrame functions in :mod:`.operators.api` against a
bound aggregate table and return the reference's response envelope
(``{"timestamp", "count", "records"}``).  Stdlib ``http.server`` on a
daemon thread — zero new dependencies, same pattern as
:class:`.streaming.admin.AdminServer`.

Serving cost note: every route collects only aggregate-table rows (windows
x types, bounded by key cardinality — the same rows the reference keeps in
a Postgres table), never raw events.  For a production deployment put the
aggregate in an actual store (the JDBC upsert sink) and point any HTTP
framework at it; this class exists so the reference's API contract is
runnable end-to-end from a SparkSession alone.
"""

from __future__ import annotations

import datetime
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame

from .operators import api


def _jsonable(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def _records(df: DataFrame) -> list[dict]:
    return [
        {k: _jsonable(v) for k, v in row.asDict().items()}
        for row in df.collect()
    ]


def _envelope(records: list[dict]) -> dict:
    return {
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "count": len(records),
        "records": records,
    }


class QueryApiServer:
    """Serve the aggregation query routes over a bound aggregate frame.

    Routes (reference ``aggregations.py`` + ``health.py``):

    - ``GET /api/aggregations?event_type=&from_time=&to_time=&limit=&offset=``
    - ``GET /api/aggregations/latest?limit=``
    - ``GET /api/aggregations/stats``
    - ``GET /api/aggregations/event-types``
    - ``GET /health``

    Parameter validation mirrors the reference's Query() bounds:
    ``limit`` in [1, 1000] (list) / [1, 100] (latest), ``offset >= 0`` —
    violations return 422 like FastAPI's validation layer."""

    def __init__(self, agg: DataFrame, host: str = "127.0.0.1", port: int = 0):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:
                pass

            def _json(self, data: dict, status: int = 200) -> None:
                body = json.dumps(data).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                try:
                    url = urlparse(self.path)
                    q = {k: v[0] for k, v in parse_qs(url.query).items()}
                    route = outer._routes.get(url.path)
                    if route is None:
                        self._json({"error": "Not found"}, 404)
                        return
                    self._json(route(q))
                except _ValidationError as e:
                    self._json({"error": str(e)}, 422)
                except Exception as e:  # noqa: BLE001 — surface as 500
                    self._json({"error": str(e)}, 500)

        self._agg = agg
        self._routes = {
            "/health": lambda q: {"status": "healthy"},
            "/api/aggregations": self._list,
            "/api/aggregations/latest": self._latest,
            "/api/aggregations/stats": self._stats,
            "/api/aggregations/event-types": self._event_types,
        }
        self._server = HTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- route handlers -----------------------------------------------------
    def _list(self, q: dict) -> dict:
        limit = _int_param(q, "limit", 100, lo=1, hi=1000)
        offset = _int_param(q, "offset", 0, lo=0, hi=None)
        df = api.get_aggregations(
            self._agg,
            event_type=q.get("event_type"),
            from_time=_datetime_param(q, "from_time"),
            to_time=_datetime_param(q, "to_time"),
            limit=limit,
            offset=offset,
        )
        return _envelope(_records(df))

    def _latest(self, q: dict) -> dict:
        limit = _int_param(q, "limit", 10, lo=1, hi=100)
        return _envelope(_records(api.get_latest_aggregations(self._agg, limit)))

    def _stats(self, q: dict) -> dict:
        return _envelope(_records(api.get_stats(self._agg)))

    def _event_types(self, q: dict) -> dict:
        rows = _records(api.get_event_types(self._agg))
        return _envelope(rows)

    # -- lifecycle ----------------------------------------------------------
    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "QueryApiServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


class _ValidationError(ValueError):
    pass


def _datetime_param(q: dict, name: str) -> datetime.datetime | None:
    """Validate an ISO-8601 datetime query param — 422 on garbage, like the
    reference's FastAPI ``Query(datetime)`` layer, instead of letting the
    bad string reach the Spark filter and surface as a 500."""
    raw = q.get(name)
    if raw is None:
        return None
    try:
        # FastAPI accepts a trailing 'Z' for UTC; fromisoformat (pre-3.11
        # semantics) does not — normalize for parity.
        return datetime.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError as e:
        raise _ValidationError(f"{name} must be an ISO-8601 datetime") from e


def _int_param(q: dict, name: str, default: int, lo: int, hi: int | None) -> int:
    raw = q.get(name)
    if raw is None:
        return default
    try:
        v = int(raw)
    except ValueError as e:
        raise _ValidationError(f"{name} must be an integer") from e
    if v < lo or (hi is not None and v > hi):
        raise _ValidationError(f"{name} out of range [{lo}, {hi}]")
    return v
