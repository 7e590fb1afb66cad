"""In-process Confluent Schema Registry for live-HTTP decode tests.

Serves the one endpoint the decode path uses —
``GET /schemas/ids/{id}`` returning ``{"schema": "<json text>"}``
(the reference resolves writer schemas the same way,
src/serialization.rs:212-241) — over localhost so
``schema_registry.http_fetch`` runs FOR REAL inside executor Python
workers during an ingest, instead of through an injected fetcher.

Thread-safe request log lets tests assert the process-wide schema
cache holds: registry traffic stays O(distinct ids x workers),
independent of message volume.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def do_GET(self):
        srv = self.server
        with srv.lock:  # type: ignore[attr-defined]
            srv.requests.append(self.path)  # type: ignore[attr-defined]
        m = re.fullmatch(r"/schemas/ids/(\d+)", self.path.split("?")[0])
        schema = (
            srv.schemas.get(int(m.group(1)))  # type: ignore[attr-defined]
            if m else None
        )
        if schema is None:
            body = json.dumps(
                {"error_code": 40403, "message": "Schema not found"}
            ).encode()
            self.send_response(404)
        else:
            body = json.dumps({"schema": schema}).encode()
            self.send_response(200)
        self.send_header("Content-Type",
                         "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class FakeSchemaRegistryServer:
    """``with FakeSchemaRegistryServer({1: schema_json}) as url: ...``"""

    def __init__(self, schemas: dict[int, str]):
        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._srv.schemas = dict(schemas)  # type: ignore[attr-defined]
        self._srv.requests = []  # type: ignore[attr-defined]
        self._srv.lock = threading.Lock()  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}"

    @property
    def requests(self) -> list[str]:
        with self._srv.lock:  # type: ignore[attr-defined]
            return list(self._srv.requests)  # type: ignore[attr-defined]

    def __enter__(self) -> str:
        self._thread.start()
        return self.url

    def __exit__(self, *exc):
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=10)
        return False
