"""Admin HTTP surface for a running pipeline (reference parity:
``processor/src/admin_server.py:10-49`` — GET /admin/status, GET
/admin/health, POST /admin/flush).

Stdlib ``http.server`` on a daemon thread, wired to the Spark-native
callbacks: status = :func:`..pipeline.pipeline_status` over the live
``StreamingQuery`` (progress/state metrics Spark already tracks), flush =
trigger-now semantics (in drain mode :func:`..pipeline.drain`; in a
continuous trigger the next micro-batch IS the flush, so the callback just
reports what the reference's manual flush would have) — the engine never
buffers aggregates in Python, so there is nothing Python-side to flush.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Callable


class AdminServer:
    """Serve pipeline admin endpoints; ``port=0`` binds an ephemeral port
    (read it back from ``server.port``)."""

    def __init__(
        self,
        status_callback: Callable[[], dict],
        flush_callback: Callable[[], dict] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # quiet test output
                pass

            def _json(self, data: dict, status: int = 200) -> None:
                body = json.dumps(data).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                if self.path == "/admin/health":
                    self._json({"status": "healthy"})
                elif self.path == "/admin/status":
                    try:
                        self._json(outer._status())
                    except Exception as e:  # noqa: BLE001 — surface as 500
                        self._json({"error": str(e)}, 500)
                else:
                    self._json({"error": "Not found"}, 404)

            def do_POST(self) -> None:
                if self.path == "/admin/flush":
                    if outer._flush is None:
                        self._json({"error": "flush not configured"}, 500)
                    else:
                        try:
                            self._json(outer._flush())
                        except Exception as e:  # noqa: BLE001
                            self._json({"error": str(e)}, 500)
                else:
                    self._json({"error": "Not found"}, 404)

        self._status = status_callback
        self._flush = flush_callback
        self._server = HTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "AdminServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
