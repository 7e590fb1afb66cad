"""Commit-protocol storage seam for the three table-format log
writers (standard Delta ``_delta_log``, Iceberg ``metadata/``, Hudi
``.hoodie/``).

The DATA path of every writer is already Spark-native (executors
write parquet through Hadoop FileSystem, so ``s3a://`` works on a
jarred cluster); what kept the tables local-disk-only was the
DRIVER-side commit protocol: version claims, completed-commit
publishes, and log listing done through ``open``/``os.listdir``/
``os.link``/``os.replace``.  This module routes exactly that surface
through one interface so an object-store backend slots in without
touching the writers.

Primitives and the invariants the writers rely on
-------------------------------------------------

``put_if_absent(path, data) -> bool``
    Publish ``data`` at ``path`` iff nothing exists there, atomically
    and CONTENT-COMPLETE: no concurrent reader or racer may ever
    observe ``path`` existing with partial content.  This is the
    version/instant claim — the entire optimistic-concurrency story
    of all three formats reduces to it.  Returns False (never raises)
    when the path already exists.

``put_atomic(path, data)``
    Publish ``data`` at ``path`` atomically, overwriting any previous
    content (version hints, ``_last_checkpoint`` pointers, completed
    Hudi instants whose names were already reserved by a
    ``put_if_absent`` claim).

``read_bytes`` / ``list_dir`` / ``exists`` / ``makedirs`` /
``remove``
    The log-scan surface (conflict checks, replay, ledger reads).
    ``list_dir`` returns an empty list for a missing directory — on
    object stores a "directory" is a key prefix and has no existence
    of its own.

Object-store contract (documented seam; no backend shipped here
because this environment has no cloud SDKs or network):

* **S3**: ``put_if_absent`` = ``PutObject`` with ``If-None-Match: *``
  (conditional writes, GA since 2024-08) — a lost race returns HTTP
  412, map to False.  Pre-conditional-write deployments use the
  reference's DynamoDB lock table instead (kafka-delta-ingest
  README.adoc:222-237: acquire the table lock, check-then-put,
  release).  ``put_atomic`` = plain ``PutObject`` (single-key PUTs
  are atomic).  ``list_dir`` = ``ListObjectsV2`` on the prefix.
* **Azure Blob**: ``put_if_absent`` = ``Put Blob`` with
  ``If-None-Match: *`` (etag precondition, 409/412 → False);
  ``put_atomic`` = unconditional ``Put Blob``.
* **GCS**: ``put_if_absent`` = upload with
  ``x-goog-if-generation-match: 0``.

A remote backend must preserve one more property the local backend
gets for free: after a claim's HTTP call fails AMBIGUOUSLY (timeout
after the object may have landed), the writer retries and must see
its own complete object via ``exists``/``read_bytes`` — conditional
PUTs are content-complete by construction (the object materializes
only with the full body), so torn commits cannot occur; the fake
remote backend in tests/test_logstore.py injects exactly this fault.
"""

from __future__ import annotations

import os
import uuid


class LogStore:
    """Interface; see module docstring for the contract."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        raise NotImplementedError

    def put_atomic(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def list_dir(self, dirpath: str) -> list[str]:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, dirpath: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError


class LocalLogStore(LogStore):
    """POSIX backend.  ``put_if_absent`` is hard-link-from-temp: the
    payload is FULLY WRITTEN to a same-directory temp file first and
    ``os.link`` (atomic, fails with EEXIST) publishes it under the
    target name — put-if-absent WITH content, never
    create-then-write, so a racer's conflict check (or any reader)
    can never observe a claimed-but-empty commit file."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".claim-{uuid.uuid4().hex}.tmp")
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            try:
                os.link(tmp, path)
            except FileExistsError:
                return False
            return True
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def put_atomic(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".put-{uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def list_dir(self, dirpath: str) -> list[str]:
        try:
            return os.listdir(dirpath)
        except FileNotFoundError:
            return []

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)


_REMOTE_SCHEMES = ("s3://", "s3a://", "s3n://", "abfss://", "abfs://",
                   "wasbs://", "gs://", "azure://")


def get_log_store(table_uri: str) -> LogStore:
    """Backend for a table URI.  Local paths (and ``file:`` URIs) get
    :class:`LocalLogStore`; object-store schemes raise with a pointer
    to the documented contract above — wiring a real S3/Azure/GCS
    backend is SDK plumbing against that contract, not a protocol
    change (the claim/publish semantics are already exercised against
    a fault-injecting remote-semantics fake in tests)."""
    low = table_uri.lower()
    for scheme in _REMOTE_SCHEMES:
        if low.startswith(scheme):
            raise NotImplementedError(
                f"no {scheme} commit-protocol backend is shipped in "
                "this environment (no cloud SDK/network). Implement "
                "LogStore for it per the contract in "
                "kafka_delta_ingest_spark/logstore.py — S3 "
                "conditional PUT (If-None-Match: *) or the "
                "reference's DynamoDB lock, Azure etag, GCS "
                "generation-match."
            )
    if low.startswith("file:"):
        table_uri = table_uri[5:].lstrip("/") if low.startswith(
            "file:///"
        ) else table_uri[5:]
        if not table_uri.startswith("/"):
            table_uri = "/" + table_uri
    return LocalLogStore()
