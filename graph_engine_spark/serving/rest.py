"""REST endpoints over graph state — reference graph_core/api.py:38-58.

The reference wraps its storage in a FastAPI app exposing exactly two
routes: ``GET /graph/nodes`` and ``GET /graph/edges``, each returning
the storage dicts verbatim. This is the same surface on the stdlib
``http.server`` (no web framework in the sandbox; the handler is a thin
``df.collect()`` + reference-shape field mapping — SURVEY.md §3.3), so
a reference client can point at the engine unchanged.

Scale posture: a serving endpoint that materializes the whole graph is
only sane for the reference's interactive use case (its storage is one
process anyway). Both routes accept ``?limit=&offset=`` to bound the
driver collect; at corpus scale a real deployment would page through
the Parquet/Iceberg state directly rather than proxy through the
driver, and this layer is explicitly NOT in any hot path (nothing in
the engine imports it).

Rows are ordered deterministically (id / (source, target, type)) so
pagination is stable across requests against the same state. Two
paging modes: ``?after=<cursor>`` keyset paging (``id > cursor`` —
the predicate pushes to the scan and each request collects exactly one
page, O(limit) however deep the client is; the edges cursor is the
composite ``src|dst|edge_type``) and ``?offset=`` kept for
reference-client compatibility (O(offset+limit) through the driver,
bounded by max_limit — unfit to front a real corpus, use ``after``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F

from graph_engine_spark.storage.jsonio import edge_row_to_doc, node_row_to_doc


class GraphRestServer:
    """Serve a GraphState's nodes/edges as the reference's REST routes.

    Usage::

        srv = GraphRestServer(state)      # port=0 → ephemeral port
        port = srv.start()
        ... GET http://127.0.0.1:{port}/graph/nodes ...
        srv.stop()
    """

    def __init__(
        self,
        state,
        host: str = "127.0.0.1",
        port: int = 0,
        default_limit: int = 1000,
        max_limit: int = 10000,
    ):
        self._state = state
        self._host = host
        self._port = port
        # every request is bounded: an argless GET pages default_limit
        # rows, and no request — whatever limit/offset it claims — can
        # pull more than max_limit + offset rows through the driver
        self._default_limit = default_limit
        self._max_limit = max_limit
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # --- request plumbing -------------------------------------------
    def _rows(self, kind: str, limit: int, offset: int, after: str | None):
        if kind == "nodes":
            df = self._state.nodes
            order = [F.asc("id")]
            if after is not None:
                df = df.filter(F.col("id") > after)
            mapper = node_row_to_doc
        else:
            df = self._state.edges
            order = [F.asc("src"), F.asc("dst"), F.asc("edge_type")]
            if after is not None:
                # composite cursor src|dst|edge_type — lexicographic >
                parts = after.split("|")
                if len(parts) != 3:
                    raise ValueError(
                        "edges ?after cursor must be 'src|dst|edge_type'"
                    )
                s, d, t = parts
                df = df.filter(
                    (F.col("src") > s)
                    | ((F.col("src") == s) & (F.col("dst") > d))
                    | (
                        (F.col("src") == s)
                        & (F.col("dst") == d)
                        & (F.col("edge_type") > t)
                    )
                )
            mapper = edge_row_to_doc
        if after is not None:
            # keyset page: the cursor predicate pushes to the scan and
            # the driver collects exactly ONE page, however deep the
            # client is into the table — O(limit), not O(offset)
            rows = df.orderBy(*order).limit(limit).collect()
        else:
            # offset shim kept for reference-client compatibility:
            # O(offset + limit) through the driver, bounded by max_limit
            rows = df.orderBy(*order).limit(offset + limit).collect()
            if offset:
                rows = rows[offset:]
        return [mapper(r) for r in rows]

    def _make_handler(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                q = parse_qs(parsed.query)
                try:
                    limit = (
                        int(q["limit"][0])
                        if "limit" in q
                        else outer._default_limit
                    )
                    offset = int(q.get("offset", ["0"])[0])
                except ValueError:
                    self._reply(400, {"error": "limit/offset must be integers"})
                    return
                if limit < 0 or offset < 0:
                    self._reply(400, {"error": "limit/offset must be >= 0"})
                    return
                after = q.get("after", [None])[0]
                if after is not None and offset:
                    self._reply(
                        400, {"error": "after and offset are mutually exclusive"}
                    )
                    return
                limit = min(limit, outer._max_limit)
                if parsed.path not in ("/graph/nodes", "/graph/edges"):
                    self._reply(404, {"error": f"unknown path {parsed.path}"})
                    return
                kind = parsed.path.rsplit("/", 1)[1]
                try:
                    self._reply(200, outer._rows(kind, limit, offset, after))
                except ValueError as e:  # malformed cursor
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # surface as HTTP, not a dropped conn
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

            def _reply(self, code: int, payload):
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return Handler

    # --- lifecycle ---------------------------------------------------
    def start(self) -> int:
        """Start serving on a daemon thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer(
            (self._host, self._port), self._make_handler()
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
