"""Real-socket fixture HTTP server — the testserver.ts analog.

Serves ``fixture_pages_rows()`` (the same route map the simulated
frontier⨝pages join uses, ported from /root/reference/test/util/routes.ts)
over actual HTTP so the live-fetch stage (operators/fetch.py) can be
driven end-to-end: same statuses, headers, bodies, redirects, gzip payloads
and hang routes, byte-for-byte.

Routes are keyed by path (host-agnostic), mirroring testserver.ts which
binds one handler for both 127.0.0.1 and localhost. Unknown paths return
404 "Page not found." exactly like testserver.ts:66-71. ``hang`` routes
sleep past the client timeout. Conditional requests: If-None-Match /
If-Modified-Since matching the route's ETag / Last-Modified → 304.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .fixture_site import NOT_FOUND_BODY, fixture_pages_rows

__all__ = ["serve_fixture"]


class _FixtureHandler(BaseHTTPRequestHandler):
    pages: dict = {}
    hang_seconds: float = 5.0
    protocol_version = "HTTP/1.1"

    def do_GET(self):  # noqa: N802 (http.server API)
        row = self.pages.get(self.path)
        if row is None:
            self.send_response(404)
            self.send_header("Content-Length", str(len(NOT_FOUND_BODY)))
            self.end_headers()
            self.wfile.write(NOT_FOUND_BODY)
            return
        if row["hang"]:
            time.sleep(self.hang_seconds)  # client must time out first
        if (row["etag"] and self.headers.get("If-None-Match") == row["etag"]) \
                or (row["last_modified"]
                    and self.headers.get("If-Modified-Since")
                    == row["last_modified"]):
            self.send_response(304)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = bytes(row["html"] or b"")
        self.send_response(row["status"])
        for header, key in (("Content-Type", "content_type"),
                            ("Content-Encoding", "content_encoding"),
                            ("Location", "location"),
                            ("Set-Cookie", "set_cookie"),
                            ("ETag", "etag"),
                            ("Last-Modified", "last_modified")):
            if row[key]:
                self.send_header(header, row[key])
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


def serve_fixture(port: int = 3000, include_big: bool = False,
                  hang_seconds: float = 5.0) -> ThreadingHTTPServer:
    """Start the fixture server on 127.0.0.1:``port`` in a daemon thread.
    Caller shuts it down with ``server.shutdown()``."""
    pages = {}
    marker = f":{port}"
    for r in fixture_pages_rows(include_big=include_big):
        host_part, _, path = r["url"].partition(marker)
        if path and "://" in host_part:
            pages.setdefault(path, r)
    handler = type("FixtureHandler", (_FixtureHandler,),
                   {"pages": pages, "hang_seconds": hang_seconds})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
