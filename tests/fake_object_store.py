"""In-process object-store HTTP server for LogStore backend tests.

Serves the conditional-PUT object API that
``HttpConditionalLogStore`` speaks (kafka_delta_ingest_spark/
logstore.py) — S3's ``PutObject`` + ``If-None-Match: *`` semantics
over localhost, with objects materialized as REAL files under a
sandbox root so Spark/DuckDB readers of the same table keep working
(exactly the split a jarred cluster has: data via filesystem,
commits via the object store's conditional API).

Semantics served:

* ``PUT`` + ``If-None-Match: *`` -> **201**, or **412** if the key
  exists.  Creation is link-from-temp: the body is fully written to
  a temp file and ``os.link`` publishes it atomically, so a racing
  reader can never observe a torn object and two racing conditional
  PUTs can never both win — conditional PUTs are content-complete.
* plain ``PUT`` -> 200 (atomic replace).
* ``GET``/``HEAD`` -> 200 body / 404.
* ``GET <key>?list-type=2`` -> 200, one child-key basename per line
  (prefix listing); missing prefix lists EMPTY (200, no body) —
  object-store "directories" are prefixes without existence.
* ``DELETE`` -> 204 / 404.

Every key must resolve under the sandbox ``root``; anything else is
403 (test hygiene, not part of the modeled API).
"""

from __future__ import annotations

import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlsplit


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *args):  # silence per-request stderr spam
        pass

    # -- helpers -----------------------------------------------------
    def _key(self) -> str | None:
        sp = urlsplit(self.path)
        path = os.path.realpath(unquote(sp.path))
        root = os.path.realpath(self.server.root)  # type: ignore[attr-defined]
        if path != root and not path.startswith(root + os.sep):
            return None
        return path

    def _reply(self, code: int, body: bytes = b"") -> None:
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    # -- methods -----------------------------------------------------
    def do_PUT(self):
        key = self._key()
        if key is None:
            return self._reply(403)
        length = int(self.headers.get("Content-Length") or 0)
        data = self.rfile.read(length)
        os.makedirs(os.path.dirname(key), exist_ok=True)
        if self.headers.get("If-None-Match") == "*":
            tmp = os.path.join(
                os.path.dirname(key), f".put-{uuid.uuid4().hex}.tmp"
            )
            try:
                with open(tmp, "wb") as f:
                    f.write(data)
                try:
                    os.link(tmp, key)
                except FileExistsError:
                    return self._reply(412)
                return self._reply(201)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        tmp = os.path.join(
            os.path.dirname(key), f".put-{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)
        return self._reply(200)

    def do_GET(self):
        key = self._key()
        if key is None:
            return self._reply(403)
        if "list-type=2" in urlsplit(self.path).query:
            try:
                names = sorted(os.listdir(key))
            except (FileNotFoundError, NotADirectoryError):
                names = []
            return self._reply(
                200, "\n".join(names).encode()
            )
        try:
            with open(key, "rb") as f:
                return self._reply(200, f.read())
        except (FileNotFoundError, IsADirectoryError):
            return self._reply(404)

    def do_HEAD(self):
        key = self._key()
        if key is None:
            return self._reply(403)
        return self._reply(200 if os.path.exists(key) else 404)

    def do_DELETE(self):
        key = self._key()
        if key is None:
            return self._reply(403)
        try:
            os.remove(key)
        except FileNotFoundError:
            return self._reply(404)
        return self._reply(204)


class FakeObjectStoreServer:
    """``with FakeObjectStoreServer(root) as endpoint: ...`` — a
    threaded localhost object store sandboxed to ``root``."""

    def __init__(self, root: str):
        self.root = root
        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._srv.root = root  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )

    @property
    def endpoint(self) -> str:
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.endpoint

    def __exit__(self, *exc):
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=10)
        return False
