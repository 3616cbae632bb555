"""Minimal HTTP JSON gateway — the reference's REST surface (S11).

The reference serves gRPC + a grpc-gateway REST proxy
(/root/reference/app/infrastructure/persistence/grpc/server.go:42-163;
routes app/interfaces/grpc/proto/v1/fias/fias.proto:80-119). Here the same
routes map onto the FulltextAPI facade over a stdlib ThreadingHTTPServer —
no extra dependencies, launched via scripts/serve.py. The Spark driver is
the server process; queries run as Spark jobs (or the warmed driver-side
searcher for small indexes), exactly like the reference's single ES node
behind a thin gateway.

Routes (reference analogues):
    GET /api/v1/address/term?term=..&size=..&from=..[&lang=..]   GetAddressByTerm
    GET /api/v1/suggests?term=..&size=..                         GetSuggests
    GET /api/v1/address/guid?repo=..&path=..&commit=..           GetByGuid
    GET /api/v1/count?term=..[&lang=..]                          _count
    GET /api/v1/version                                          GetVersion
    GET /health                                                  CheckHealth
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from gofias_spark.api import FulltextAPI

_FILTER_FIELDS = ("lang", "repo", "path_prefix")


def _filters_from_query(q: dict) -> dict | None:
    f = {k: q[k][0] for k in _FILTER_FIELDS if k in q}
    return f or None


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def make_handler(api: FulltextAPI):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, obj, code: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            url = urlparse(self.path)
            q = parse_qs(url.query)
            try:
                if url.path == "/health":
                    self._json({"status": "ok"})
                elif url.path == "/api/v1/version":
                    self._json(api.version())
                elif url.path == "/api/v1/address/term":
                    df = api.search_by_term(
                        q.get("term", [""])[0],
                        size=int(q.get("size", ["100"])[0]),
                        from_=int(q.get("from", ["0"])[0]),
                        filters=_filters_from_query(q),
                    )
                    self._json({"items": _rows(df)})
                elif url.path == "/api/v1/suggests":
                    df = api.suggest(
                        q.get("term", [""])[0],
                        size=int(q.get("size", ["10"])[0]),
                        filters=_filters_from_query(q),
                    )
                    self._json({"items": _rows(df)})
                elif url.path == "/api/v1/address/guid":
                    key = {
                        k: q[k][0]
                        for k in ("repo", "path", "commit")
                        if k in q
                    }
                    df = api.get_doc(**key).drop("content")
                    self._json({"items": _rows(df)})
                elif url.path == "/api/v1/count":
                    n = api.count(
                        q.get("term", [None])[0],
                        filters=_filters_from_query(q),
                    )
                    self._json({"count": n})
                else:
                    self._json({"error": "not found"}, code=404)
            except Exception as exc:  # fail-fast surface, like bulk errors
                self._json({"error": str(exc)}, code=500)

    return Handler


def serve(api: FulltextAPI, host: str = "127.0.0.1", port: int = 8080):
    """Start the gateway; returns (server, thread). Call
    ``server.shutdown()`` to stop."""
    server = ThreadingHTTPServer((host, port), make_handler(api))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
