"""WARC (Web ARChive, ISO 28500) source — the container format of
CommonCrawl and every large-scale web corpus, which is where a 100 TB
pretraining pipeline's documents actually come from.

Pure-stdlib record codec + a Spark reader over ``binaryFile``:

* ``encode_warc_record`` / ``parse_warc`` — one record is a
  ``WARC/1.0`` header block (CRLF-delimited ``Name: value`` lines, a
  ``Content-Length`` framing the payload) followed by the payload and
  a blank-line terminator. WARC files are either plain concatenations
  or per-record gzip members back-to-back (the CommonCrawl layout —
  gzip's multi-member property is what makes per-record random access
  possible); both are handled, transparently.
* ``http_split`` — ``response`` records carry a full HTTP response;
  this splits status line + headers from the body without an HTTP
  library.
* ``read_warc(spark, path)`` — DataFrame source. ``binaryFile`` never
  splits a file, so one task owns one WARC file end-to-end — exactly
  the CommonCrawl processing model (80k x ~1 GB files → 80k tasks);
  parallelism scales with the file count, not maxPartitionBytes. The
  record walk streams inside ``mapInPandas``; malformed records are
  quarantined per-record (skipped with a counter or surfaced, never
  failing the file) mirroring the reference's row-quarantine rule
  (src/writer.rs:618-639).

A writer (``write_warc``) exists for fixtures and round-trip tests.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

_CRLF = b"\r\n"


def encode_warc_record(
    warc_type: str,
    payload: bytes,
    headers: dict[str, str] | None = None,
    gzip_record: bool = False,
) -> bytes:
    """One WARC/1.0 record; optionally as its own gzip member."""
    h = {"WARC-Type": warc_type, **(headers or {})}
    lines = [b"WARC/1.0"]
    for k, v in h.items():
        if "\r" in str(v) or "\n" in str(v):
            raise ValueError(f"header {k!r} contains CR/LF")
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    rec = _CRLF.join(lines) + _CRLF * 2 + payload + _CRLF * 2
    if gzip_record:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
            z.write(rec)
        return buf.getvalue()
    return rec


def write_warc(path: str, records: list[dict], gzip_records: bool = False):
    """Fixture writer: each record dict has ``warc_type``, ``payload``
    (bytes), and optional ``headers``."""
    with open(path, "wb") as f:
        for r in records:
            f.write(
                encode_warc_record(
                    r["warc_type"],
                    r["payload"],
                    r.get("headers"),
                    gzip_record=gzip_records,
                )
            )


_GZ_CHUNK = 1 << 14  # 16 KB: bounds per-member unused_data copy


def _gunzip_members(b: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream separately.

    Input is fed in bounded chunks through a memoryview: handing the
    whole remaining buffer to ``decompress`` per member is quadratic
    in memcpy on exactly the layout this exists for (zlib copies the
    unconsumed tail into ``unused_data`` each time — a 50k-member
    CommonCrawl file would shuffle terabytes of bytes); with chunked
    feeding the per-member overshoot is at most one chunk."""
    view = memoryview(b)
    n = len(b)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = []
        p = pos
        try:
            while not d.eof:
                if p >= n:
                    raise ValueError("truncated gzip member")
                chunk = view[p:p + _GZ_CHUNK]
                out.append(d.decompress(chunk))
                p += len(chunk)
        except zlib.error as ex:
            raise ValueError(f"corrupt gzip member: {ex}") from None
        yield b"".join(out)
        # position arithmetic, not unused_data hand-off: the tail
        # copied into unused_data is bounded by one (small) chunk, so
        # total copying stays O(file size + members * chunk).
        consumed = p - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def parse_warc(b: bytes) -> Iterator[dict]:
    """Yield ``{"warc_type", "headers", "payload"}`` per record from
    plain or per-record-gzipped WARC bytes. Raises ValueError on the
    first malformed framing (strict mode — fixtures and tests)."""
    if b[:2] == b"\x1f\x8b":
        for member in _gunzip_members(b):
            yield from _parse_plain(member)
    else:
        yield from _parse_plain(b)


def parse_warc_lenient(b: bytes) -> Iterator[dict]:
    """Like :func:`parse_warc`, but quarantines instead of raising:
    malformed framing yields ``{"error": msg}`` markers and parsing
    RESUMES at the next recoverable boundary.

    Recovery granularity follows the container: in the gzip-member
    layout every member is an independent stream (the reason
    CommonCrawl uses it), so a bad member skips exactly that member —
    unless the member stream itself is unbounded (truncated gzip),
    which ends the file with one marker. In the plain layout records
    are framed only by their own Content-Length, so after a bad header
    the next boundary is unknowable and the remainder of the file is
    one marker (how warcio behaves too)."""
    def _drain(chunk: bytes) -> Iterator[dict]:
        it = _parse_plain(chunk)
        while True:
            try:
                rec = next(it)
            except StopIteration:
                return
            except ValueError as ex:  # keep records parsed so far
                yield {"error": str(ex)}
                return
            yield rec

    if b[:2] == b"\x1f\x8b":
        members = _gunzip_members(b)
        while True:
            try:
                member = next(members)
            except StopIteration:
                return
            except ValueError as ex:  # member stream unrecoverable
                yield {"error": str(ex)}
                return
            yield from _drain(member)
    else:
        yield from _drain(b)


def _parse_plain(b: bytes) -> Iterator[dict]:
    pos = 0
    n = len(b)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and b[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = b.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        head = b[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        lc: dict[str, str] = {}
        for line in lines[1:]:
            if ":" not in line:
                raise ValueError(f"malformed WARC header line: {line[:40]!r}")
            k, v = line.split(":", 1)
            headers[k.strip()] = v.strip()
            # ISO 28500 header names are case-insensitive; keep the
            # writer's casing in `headers` for fidelity, look up via
            # the lowercase map.
            lc[k.strip().lower()] = v.strip()
        try:
            clen = int(lc["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("truncated WARC payload")
        payload = b[body_start:body_start + clen]
        yield {
            "warc_type": lc.get("warc-type", ""),
            "headers": headers,
            "payload": payload,
        }
        pos = body_start + clen


def http_split(payload: bytes):
    """HTTP response payload → (status int, headers dict, body bytes).

    Raises ValueError if the payload is not an HTTP response."""
    sep = payload.find(_CRLF * 2)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response")
    head = payload[:sep].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"bad HTTP status line: {lines[0][:40]!r}")
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return int(parts[1]), headers, payload[sep + 4:]


def read_warc(spark, path: str, types: tuple[str, ...] = ("response",)):
    """Distributed WARC reader: one row per record of the requested
    WARC-Types, with HTTP framing split off for ``response`` records.

    Columns: ``warc_file, warc_type, record_id, target_uri, warc_date,
    http_status, http_content_type, body (binary), parse_error``.
    Malformed records/files surface as rows with ``parse_error`` set
    (body NULL) instead of failing the job — per-record quarantine.
    """
    import pandas as pd

    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("warc_file", StringType()),
            StructField("warc_type", StringType()),
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("http_status", IntegerType()),
            StructField("http_content_type", StringType()),
            StructField("body", BinaryType()),
            StructField("parse_error", StringType()),
        ]
    )
    want = set(types)

    def run(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_lenient(bytes(content)):
                    if "error" in rec:
                        rows.append(
                            (fname, None, None, None, None, None, None,
                             None, rec["error"])
                        )
                        continue
                    # case-insensitive header access (ISO 28500)
                    h = {k.lower(): v for k, v in rec["headers"].items()}
                    if want and rec["warc_type"] not in want:
                        continue
                    status, ctype, body = None, None, rec["payload"]
                    if rec["warc_type"] == "response":
                        try:
                            status, hh, body = http_split(rec["payload"])
                            ctype = hh.get("content-type")
                        except ValueError as ex:
                            rows.append(
                                (fname, rec["warc_type"],
                                 h.get("warc-record-id"),
                                 h.get("warc-target-uri"),
                                 h.get("warc-date"),
                                 None, None, None, str(ex))
                            )
                            continue
                    rows.append(
                        (fname, rec["warc_type"],
                         h.get("warc-record-id"),
                         h.get("warc-target-uri"),
                         h.get("warc-date"),
                         status, ctype, bytes(body), None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "warc_type", "record_id", "target_uri",
                    "warc_date", "http_status", "http_content_type",
                    "body", "parse_error",
                ],
            )

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(run, schema=schema)
