"""Confluent Schema Registry client for wire-format decode.

The reference resolves writer schemas from a Confluent registry at
decode time (src/serialization.rs:212-241 `EasyAvroDecoder`,
317-346 `EasyJsonDecoder`). This client is the Spark-side equivalent,
built to run INSIDE executors (Arrow UDF workers):

* the fetcher is injectable — tests and air-gapped runs supply a
  dict-backed function instead of HTTP;
* schemas are cached per (url, id) at process scope, so a long-lived
  Python worker resolves each schema id exactly once no matter how
  many Arrow batches flow through it;
* parsed-schema objects are cached alongside the raw JSON, because
  re-parsing per batch would dominate decode cost at high throughput.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

# Process-wide caches (executor Python workers are reused across
# batches and jobs; the cache amortizes to one fetch per schema id per
# worker process).
_SCHEMA_CACHE: dict[tuple[str, int], str] = {}
_PARSED_CACHE: dict[tuple[str, int], object] = {}


def http_fetch(url: str) -> str:
    """GET a Confluent `/schemas/ids/{id}` endpoint → schema JSON text."""
    with urllib.request.urlopen(url, timeout=10) as r:  # noqa: S310
        return json.loads(r.read())["schema"]


class SchemaRegistryClient:
    """Minimal Confluent-compatible client: resolve schema JSON by id."""

    def __init__(self, base_url: str, fetcher: Callable[[str], str] | None = None):
        self.base_url = base_url.rstrip("/")
        self._fetcher = fetcher or http_fetch

    def schema_by_id(self, schema_id: int) -> str:
        key = (self.base_url, schema_id)
        if key not in _SCHEMA_CACHE:
            _SCHEMA_CACHE[key] = self._fetcher(
                f"{self.base_url}/schemas/ids/{schema_id}"
            )
        return _SCHEMA_CACHE[key]

    def parsed_avro_by_id(self, schema_id: int):
        """Parsed (avro_python) schema object, cached."""
        key = (self.base_url, schema_id)
        if key not in _PARSED_CACHE:
            from kafka_delta_ingest_spark import avro_python

            _PARSED_CACHE[key] = avro_python.parse_schema(self.schema_by_id(schema_id))
        return _PARSED_CACHE[key]


def clear_caches() -> None:
    """Test hook: drop the process-wide schema caches."""
    _SCHEMA_CACHE.clear()
    _PARSED_CACHE.clear()
