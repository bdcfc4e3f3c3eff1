"""HTTP ``_search`` surface over SearchEngine (stdlib only).

The reference serves ``GET|POST /indexes/{index}/_search``
(webapi/restapi/handlers.go:92-183) behind go-swagger.  This module
re-expresses that surface with ``http.server`` so a driver process can
serve searches with zero extra dependencies — closing the one
process-boundary gap SURVEY §3.3 had scoped out:

- ``?q=unique_key:<key>`` — exact-key lookup; any other ``q=`` syntax
  is a 400 with the reference's message (handlers.go:101-105);
- request body ``{"query": {"bool": {"must": {"match_phrase":
  {"content": {"query": ..., "analyzer": ...}}}, "filter": {"terms":
  {"tags": [...]}}}}`` — the ES-ish DSL the reference accepts: search
  word from match_phrase.content.query, lang from its analyzer, tag
  filter from filter.terms.tags (handlers.go:146-156);
- unknown index — 404 ``{"message": "index '<i>' is not found"}``;
- responses are the ES-shaped payload from operators/response.py
  (took/hits/max_score/total), built from the same engine searches the
  batch paths use.

The DSL path defaults to the reference Search() semantics
(mode='parity', TF-IDF ascending); ``?mode=bm25`` opts into the
flagship scorer — an extension, clearly not part of reference parity.

Serving happens on the Spark DRIVER (the engine's DataFrame handles
live there); a ThreadingHTTPServer maps naturally onto Spark's
thread-safe job submission, and FAIR scheduling (see bench_scaling)
keeps concurrent queries from convoying.
"""

from __future__ import annotations

import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .operators.response import search_response


def _parse_dsl(body: dict) -> tuple:
    """(search_word, tags, lang) from the reference's bool query DSL."""
    search_word, tags, lang = "", [], ""
    q = (body or {}).get("query", {}).get("bool", {})
    must = q.get("must")
    if must:
        content = must.get("match_phrase", {}).get("content", {})
        search_word = content.get("query") or ""
        lang = content.get("analyzer") or ""
    filt = q.get("filter")
    if filt:
        tags = list(filt.get("terms", {}).get("tags") or [])
    return search_word, tags, lang


class _Handler(BaseHTTPRequestHandler):
    engines: dict = {}  # index name -> SearchEngine (bound by make_server)

    def log_message(self, *args):  # tests/services don't want stderr spam
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _route(self, body: dict | None) -> None:
        parsed = urllib.parse.urlparse(self.path)
        parts = [p for p in parsed.path.split("/") if p]
        if len(parts) != 3 or parts[0] != "indexes" or parts[2] != "_search":
            self._send(404, {"message": f"no route for {parsed.path!r}"})
            return
        index = urllib.parse.unquote(parts[1])
        eng = self.engines.get(index)
        if eng is None:
            self._send(404, {"message": f"index '{index}' is not found"})
            return
        query = urllib.parse.parse_qs(parsed.query)
        q = query.get("q", [None])[0]
        try:
            if q is not None:
                if not q.startswith("unique_key:"):
                    self._send(400, {
                        "message": "q= query only supports searching unique_key"
                    })
                    return
                self._send(200, search_response(
                    eng, q, mode="parity", k=None, index_name=index))
                return
            search_word, tags, lang = _parse_dsl(body)
            mode = query.get("mode", ["parity"])[0]
            k = int(query.get("k", [0])[0]) or (10 if mode == "bm25" else None)
            self._send(200, search_response(
                eng, search_word, tags, lang=lang, mode=mode, k=k,
                index_name=index))
        except Exception as exc:  # surface engine errors as JSON, not a hang
            self._send(500, {"message": str(exc)[:500]})

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        self._route(None)

    def do_POST(self) -> None:  # noqa: N802
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        try:
            body = json.loads(raw) if raw else None
        except json.JSONDecodeError:
            self._send(400, {"message": "request body is not valid JSON"})
            return
        self._route(body)


def make_server(engines: dict, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) a ThreadingHTTPServer serving ``engines``
    ({index_name: SearchEngine}).  ``port=0`` binds an ephemeral port
    (``server.server_address[1]``).  Callers run
    ``server.serve_forever()`` — typically on a daemon thread next to
    the driver — and ``server.shutdown()`` to stop."""
    handler = type("WatertowerHandler", (_Handler,), {"engines": dict(engines)})
    return ThreadingHTTPServer((host, port), handler)
