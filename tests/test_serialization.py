"""Deserializer-family tests (SURVEY §2.1 S3/S4/S7/S8): gzip payloads,
Confluent wire-format header strip, Avro single-object-encoding
fingerprint extraction, empty-payload guard."""

import gzip
import json
import struct

from pyspark.sql import Row, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_delta_ingest_spark.serialization import (
    gunzip,
    json_payload_to_struct,
    soe_fingerprint,
    strip_confluent_header,
)

SCHEMA = StructType([StructField("id", LongType()), StructField("name", StringType())])


def _binary_df(spark, payloads: list[bytes]):
    return spark.createDataFrame(
        [Row(value=bytearray(p)) for p in payloads], "value binary"
    )


def test_gzip_payload_decodes(spark):
    """S3 gzip flag (reference src/serialization.rs:108-114)."""
    msgs = [json.dumps({"id": i, "name": f"n{i}"}).encode() for i in range(4)]
    df = _binary_df(spark, [gzip.compress(m) for m in msgs])
    parsed, err = json_payload_to_struct(F.col("value"), SCHEMA, gzip=True)
    out = df.select(parsed.alias("p"), err.alias("e")).collect()
    assert all(r["e"] is None for r in out)
    assert sorted(r["p"]["id"] for r in out) == [0, 1, 2, 3]


def test_gzip_passthrough_for_plain_payloads(spark):
    """The reference decompresses transparently only when the payload IS
    gzip; plain bytes pass through (flate2 fallback behavior)."""
    msgs = [json.dumps({"id": 7, "name": "plain"}).encode()]
    df = _binary_df(spark, msgs)
    parsed, err = json_payload_to_struct(F.col("value"), SCHEMA, gzip=True)
    row = df.select(parsed.alias("p"), err.alias("e")).collect()[0]
    assert row["e"] is None and row["p"]["id"] == 7


def test_confluent_header_strip(spark):
    """S4: magic 0x0 + 4-byte schema id stripped before JSON decode
    (reference src/serialization.rs:317-346)."""
    body = json.dumps({"id": 42, "name": "confluent"}).encode()
    wire = b"\x00" + (1234).to_bytes(4, "big") + body
    df = _binary_df(spark, [wire])
    parsed, err = json_payload_to_struct(
        F.col("value"), SCHEMA, confluent_wire_format=True
    )
    row = df.select(parsed.alias("p"), err.alias("e")).collect()[0]
    assert row["e"] is None
    assert row["p"]["id"] == 42 and row["p"]["name"] == "confluent"


def test_soe_fingerprint_little_endian_i64(spark):
    """S7: single-object-encoding fingerprint = little-endian i64 at
    bytes [2, 10) (reference src/serialization.rs:188-195)."""
    fingerprints = [0x1122334455667788, -1, 1, -(2**63)]
    payloads = []
    for fp in fingerprints:
        payloads.append(b"\xc3\x01" + struct.pack("<q", fp) + b"avrobody")
    df = _binary_df(spark, payloads)
    got = [r["fp"] for r in df.select(soe_fingerprint(F.col("value")).alias("fp")).collect()]
    assert got == fingerprints


def test_strip_header_then_gunzip_compose(spark):
    """Column stages compose: strip → gunzip → parse."""
    body = gzip.compress(json.dumps({"id": 5, "name": "zipped"}).encode())
    wire = b"\x00\x00\x00\x00\x01" + body
    df = _binary_df(spark, [wire])
    out = df.select(
        gunzip(strip_confluent_header(F.col("value"))).cast("string").alias("s")
    ).collect()[0]
    assert json.loads(out["s"])["name"] == "zipped"


def test_empty_payload_guard(spark):
    """S8: null/empty payloads are skipped silently, not dead-lettered
    (reference src/lib.rs:847-852)."""
    import datetime

    from kafka_delta_ingest_spark.config import IngestOptions
    from kafka_delta_ingest_spark.ingest import IngestJob

    rows = [
        Row(
            value=bytearray(json.dumps({"id": 1, "name": "x"}).encode()),
            partition=0,
            offset=0,
            topic="t",
            timestamp=datetime.datetime(2024, 1, 1),
            timestampType=0,
        ),
        Row(
            value=None,
            partition=0,
            offset=1,
            topic="t",
            timestamp=datetime.datetime(2024, 1, 1),
            timestampType=0,
        ),
        Row(
            value=bytearray(b""),
            partition=0,
            offset=2,
            topic="t",
            timestamp=datetime.datetime(2024, 1, 1),
            timestampType=0,
        ),
    ]
    raw = spark.createDataFrame(
        rows,
        "value binary, partition int, offset long, topic string, "
        "timestamp timestamp, timestampType int",
    )
    job = IngestJob(IngestOptions(topic="t", table_uri="/tmp/unused-kdi"), SCHEMA)
    planned = job.plan(raw)
    good, dlq = job.split(planned)
    assert good.count() == 1  # only the real message
    assert dlq.count() == 0  # empties skipped, NOT dead-lettered
