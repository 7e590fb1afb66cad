"""Message deserializers: Kafka payload bytes → typed struct column.

Spark-first rebuild of the reference's ``MessageDeserializer`` family
(reference src/serialization.rs:31-68): each deserializer returns a
Column expression (or a thin DataFrame stage) that turns the raw
``value: binary`` Kafka column into a parsed struct plus an error
column, instead of a per-message virtual call.

Formats (reference src/lib.rs:213-240 MessageFormat):

* **JSON** (default) — ``from_json`` with the destination-derived wire
  schema; optional gzip decompression first
  (src/serialization.rs:99-140).
* **JSON + Confluent Schema Registry** — strip the 5-byte wire-format
  header (magic 0x0 + 4-byte schema id), then ``from_json``
  (src/serialization.rs:317-346).
* **Avro (container / schema file / registry)** — via
  ``pyspark.sql.avro.functions.from_avro`` when the spark-avro package
  is on the classpath; gated import (src/serialization.rs:142-154).
* **Avro single-object encoding** — per-message schema routed by the
  8-byte Rabin fingerprint at bytes [2, 10)
  (src/serialization.rs:161-210): fingerprint extraction is a pure
  Column expression; each known fingerprint gets its own ``from_avro``
  branch combined with ``when``/``otherwise``.

The "wire schema" trick: every leaf of the destination schema that is
``string`` or ``timestamp`` is parsed as **string**. Spark's JSON parser
captures non-string JSON values targeted at a string field as their raw
JSON text — exactly the reference's ToString coercion — and leaves
timestamp parsing to the strict RFC3339 coercion layer so that the
reference's accept/reject behavior (src/coercions.rs tests) is preserved
rather than Spark's laxer cast.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

CORRUPT_COL = "_corrupt_record"


def wire_schema(target: DataType) -> DataType:
    """Destination schema → decode schema (timestamps read as strings)."""
    if isinstance(target, StructType):
        return StructType(
            [StructField(f.name, wire_schema(f.dataType), True) for f in target.fields]
        )
    if isinstance(target, ArrayType):
        return ArrayType(wire_schema(target.elementType), True)
    if isinstance(target, (TimestampType, TimestampNTZType)):
        return StringType()
    return target


def gunzip(col: Column) -> Column:
    """Transparent gzip decompress (reference src/serialization.rs:108-114).

    Implemented as an Arrow-batched pandas UDF — Spark has no builtin
    gunzip; this is off the hot path unless the topic is gzipped.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gunzip(s: pd.Series) -> pd.Series:
        import gzip

        def one(b):
            if b is None:
                return None
            try:
                return gzip.decompress(bytes(b))
            except Exception:
                return bytes(b)  # non-gzip payloads pass through

        return s.map(one)

    return _gunzip(col)


def strip_confluent_header(col: Column) -> Column:
    """Drop the Confluent wire-format header: 1 magic byte + 4-byte
    schema id; payload starts at byte 6 (1-based substring)."""
    return F.expr(f"substring({_sql(col)}, 6, length({_sql(col)}) - 5)")


def soe_fingerprint(col: Column) -> Column:
    """Avro single-object-encoding fingerprint: little-endian i64 at
    bytes [2, 10) (reference src/serialization.rs:188-195).

    Assembled byte-by-byte in two's complement: the most-significant
    (10th) byte contributes signed (−128..127)·2^56, the rest unsigned —
    every intermediate stays inside long range, so the expression is
    ANSI-overflow-safe for all 2^64 fingerprints.
    """

    def byte_at(pos: int) -> Column:
        # 1-based position in the payload; one byte → 0..255.
        return F.conv(F.hex(F.expr(f"substring({_sql(col)}, {pos}, 1)")), 16, 10).cast(
            "long"
        )

    top = byte_at(10)
    signed_top = F.when(top >= 128, top - 256).otherwise(top)
    out = signed_top * F.lit(1 << 56).cast("long")
    for i in range(7):  # bytes 3..9 = low 7 bytes (little-endian)
        out = out + byte_at(3 + i) * F.lit(1 << (8 * i)).cast("long")
    return out


def _sql(col: Column) -> str:
    # Column → SQL text for use inside expr(); only used on simple refs.
    return col._jc.toString()  # noqa: SLF001


def json_payload_to_struct(
    value: Column,
    target: StructType,
    gzip: bool = False,
    confluent_wire_format: bool = False,
) -> tuple[Column, Column]:
    """binary payload → (parsed wire struct, error string or NULL).

    PERMISSIVE parse with corrupt-record capture: a payload that is not
    valid JSON (or not an object) yields a NULL struct and the error
    column carries the raw text — the reference's deserialization-failure
    DLQ path (src/lib.rs:853-865).
    """
    payload = value
    if confluent_wire_format:
        payload = strip_confluent_header(payload)
    if gzip:
        payload = gunzip(payload)
    text = payload.cast("string")
    schema = StructType(
        list(wire_schema(target).fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = F.from_json(
        text,
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    err = F.when(
        parsed.isNull() | parsed[CORRUPT_COL].isNotNull(),
        F.coalesce(parsed[CORRUPT_COL], text),
    )
    clean = F.when(err.isNull(), parsed.dropFields(CORRUPT_COL))
    return clean, err


def avro_payload_to_struct(
    value: Column,
    avro_json_schema: str,
    confluent_wire_format: bool = False,
):
    """binary payload → struct via spark-avro (gated on the package jar).

    Raises RuntimeError with a clear message when the spark-avro package
    is absent (it is not bundled with a plain pyspark install).
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "Avro decode requires the spark-avro package "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        ) from e
    payload = strip_confluent_header(value) if confluent_wire_format else value
    return from_avro(payload, avro_json_schema, {"mode": "PERMISSIVE"})


def soe_routed_avro(value: Column, schemas_by_fingerprint: dict[int, str]):
    """Single-object-encoding: fingerprint-dispatched from_avro branches.

    ``schemas_by_fingerprint`` maps the 8-byte Rabin fingerprint
    (little-endian i64, as produced by ``soe_fingerprint``) to the Avro
    reader schema JSON. Unknown fingerprints → NULL (route to DLQ).
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("SOE Avro decode requires the spark-avro package") from e
    fp = soe_fingerprint(value)
    body = F.expr(f"substring({_sql(value)}, 11, length({_sql(value)}) - 10)")
    out = None
    for fingerprint, schema_json in schemas_by_fingerprint.items():
        branch = from_avro(body, schema_json)
        out = (
            F.when(fp == F.lit(fingerprint), branch)
            if out is None
            else out.when(fp == F.lit(fingerprint), branch)
        )
    return out
