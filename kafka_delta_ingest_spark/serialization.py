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


def json_text_to_struct(text: Column, target: StructType) -> tuple[Column, Column]:
    """JSON text → (parsed wire struct, error string or NULL).

    PERMISSIVE parse with corrupt-record capture: text that is not valid
    JSON (or not an object) yields a NULL struct and the error column
    carries the raw text — the reference's deserialization-failure DLQ
    path (src/lib.rs:853-865). NULL text (an upstream binary decode
    failed) is an error too, never a silent drop.
    """
    schema = StructType(
        list(wire_schema(target).fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = F.from_json(
        text,
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    err = F.when(
        parsed.isNull() | parsed[CORRUPT_COL].isNotNull() | text.isNull(),
        F.coalesce(parsed[CORRUPT_COL], text, F.lit("payload decode failed")),
    )
    clean = F.when(err.isNull(), parsed.dropFields(CORRUPT_COL))
    return clean, err


def json_payload_to_struct(
    value: Column,
    target: StructType,
    gzip: bool = False,
    confluent_wire_format: bool = False,
) -> tuple[Column, Column]:
    """binary payload → (parsed wire struct, error string or NULL)."""
    payload = value
    if confluent_wire_format:
        payload = strip_confluent_header(payload)
    if gzip:
        payload = gunzip(payload)
    return json_text_to_struct(payload.cast("string"), target)


def avro_to_spark_schema(avro_schema) -> DataType:
    """Avro schema → Spark DataType (for the jar-free decode path).

    bytes/fixed surface as base64 strings (JSON hand-off); unions with
    null become the nullable non-null branch.
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        MapType,
    )
    from kafka_delta_ingest_spark import avro_python

    s = avro_python.parse_schema(avro_schema)

    def conv(s) -> DataType:
        if isinstance(s, list):
            non_null = [b for b in s if b != "null"]
            return conv(non_null[0]) if non_null else StringType()
        if isinstance(s, dict):
            t = s["type"]
            if t == "record":
                return StructType(
                    [StructField(f["name"], conv(f["type"]), True) for f in s["fields"]]
                )
            if t == "array":
                return ArrayType(conv(s["items"]), True)
            if t == "map":
                return MapType(StringType(), conv(s["values"]), True)
            if t in ("enum", "fixed"):
                return StringType()
            return conv(t)
        return {
            "boolean": BooleanType(),
            "int": LongType(),
            "long": LongType(),
            "float": DoubleType(),
            "double": DoubleType(),
            "bytes": StringType(),
            "string": StringType(),
            "null": StringType(),
        }[s]

    return conv(s)


def _jvm_avro_loaded() -> bool:
    """True iff the spark-avro jar is actually on the session classpath
    (the Python ``from_avro`` wrapper imports fine either way; absence
    only surfaces as AVRO_NOT_LOADED at analysis time)."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return False
    try:
        s._jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def _python_avro_json_udf(
    single_schema: str | None = None,
    schemas_by_fp: dict[int, str] | None = None,
    skip_bytes: int = 0,
):
    """binary → JSON-text pandas UDF over the pure-Python Avro codec.

    Exactly one of ``single_schema`` / ``schemas_by_fp`` is set; the
    latter routes each message by its little-endian i64 fingerprint at
    bytes [2, 10) (single-object encoding). Decode failures and unknown
    fingerprints yield NULL (→ DLQ via the JSON corrupt path).
    """
    import base64

    from pyspark.sql.functions import pandas_udf
    from kafka_delta_ingest_spark import avro_python

    parsed_one = avro_python.parse_schema(single_schema) if single_schema else None
    parsed_fp = {
        fp: avro_python.parse_schema(s) for fp, s in (schemas_by_fp or {}).items()
    }

    def jdefault(o):
        if isinstance(o, (bytes, bytearray)):
            return base64.b64encode(bytes(o)).decode("ascii")
        raise TypeError(type(o).__name__)

    @pandas_udf("string")
    def _dec(series: pd.Series) -> pd.Series:
        import json as _json

        from kafka_delta_ingest_spark import avro_python as ap

        def one(b):
            if b is None:
                return None
            try:
                raw = bytes(b)
                if parsed_one is not None:
                    datum = ap.decode(raw[skip_bytes:], parsed_one)
                else:
                    fp = int.from_bytes(raw[2:10], "little", signed=True)
                    sch = parsed_fp.get(fp)
                    if sch is None:
                        return None
                    datum = ap.decode(raw[10:], sch)
                return _json.dumps(datum, default=jdefault)
            except Exception:
                return None

        return series.map(one)

    return _dec


def avro_registry_to_json(
    value: Column,
    registry_url: str,
    fetcher=None,
) -> Column:
    """Confluent wire-format Avro → JSON text with PER-MESSAGE writer
    schema resolution from the registry (reference
    src/serialization.rs:212-241): byte 0 is the magic, bytes [1, 5)
    the big-endian schema id, byte 5 onward the Avro body.

    Runs executor-side inside an Arrow-batched UDF: each Python worker
    resolves a schema id once (process-wide cache in
    ``schema_registry``), so registry traffic is O(distinct ids ×
    workers), independent of message volume. Messages with an unknown
    magic byte or a failing/unknown schema id decode to NULL → the
    standard DLQ path. The JSON text re-enters ``json_text_to_struct``
    against the DESTINATION schema, so writer-schema evolution between
    messages needs no plan change at all.
    """
    import base64

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(series: pd.Series) -> pd.Series:
        import json as _json

        from kafka_delta_ingest_spark import avro_python as ap
        from kafka_delta_ingest_spark.schema_registry import SchemaRegistryClient

        client = SchemaRegistryClient(registry_url, fetcher)

        def jdefault(o):
            if isinstance(o, (bytes, bytearray)):
                return base64.b64encode(bytes(o)).decode("ascii")
            raise TypeError(type(o).__name__)

        def one(b):
            if b is None:
                return None
            try:
                raw = bytes(b)
                if len(raw) < 6 or raw[0] != 0:
                    return None
                schema_id = int.from_bytes(raw[1:5], "big", signed=False)
                datum = ap.decode(raw[5:], client.parsed_avro_by_id(schema_id))
                return _json.dumps(datum, default=jdefault)
            except Exception:
                return None

        return series.map(one)

    return _dec(value)


def avro_payload_to_json(
    value: Column,
    avro_schema_json: str | None = None,
    confluent_wire_format: bool = False,
    soe_schemas: dict[int, str] | None = None,
) -> Column:
    """binary Avro payload → JSON text, covering the reference's three
    Avro shapes (src/serialization.rs:142-315): explicit reader schema
    (optionally Confluent-framed), single-object encoding routed by
    fingerprint, or — when no schema is given — object-container bytes
    carrying their own writer schema. The text re-enters the normal
    ``json_text_to_struct`` path, so Avro messages get the identical
    destination-schema decode, coercion, and DLQ semantics as JSON ones.
    Decode failures yield NULL (→ error capture downstream)."""
    if soe_schemas:
        return _python_avro_json_udf(schemas_by_fp=soe_schemas)(value)
    if avro_schema_json:
        return _python_avro_json_udf(
            single_schema=avro_schema_json,
            skip_bytes=5 if confluent_wire_format else 0,
        )(value)

    # Container mode: each payload is a self-describing container file.
    import base64

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(series: pd.Series) -> pd.Series:
        import json as _json

        from kafka_delta_ingest_spark import avro_python as ap

        def jdefault(o):
            if isinstance(o, (bytes, bytearray)):
                return base64.b64encode(bytes(o)).decode("ascii")
            raise TypeError(type(o).__name__)

        def one(b):
            if b is None:
                return None
            try:
                _schema, records = ap.read_container(bytes(b))
                if not records:
                    return None
                return _json.dumps(records[0], default=jdefault)
            except Exception:
                return None

        return series.map(one)

    return _dec(value)


def avro_payload_to_struct(
    value: Column,
    avro_json_schema: str,
    confluent_wire_format: bool = False,
):
    """binary payload → struct.

    Uses the JVM ``from_avro`` when the spark-avro package is on the
    classpath; otherwise falls back to the pure-Python Avro binary
    decoder (avro_python.py) as an Arrow-batched UDF emitting JSON that
    re-enters the native ``from_json`` path — same struct out, jar-free.
    """
    if _jvm_avro_loaded():
        from pyspark.sql.avro.functions import from_avro

        payload = strip_confluent_header(value) if confluent_wire_format else value
        return from_avro(payload, avro_json_schema, {"mode": "PERMISSIVE"})
    dec = _python_avro_json_udf(
        single_schema=avro_json_schema,
        skip_bytes=5 if confluent_wire_format else 0,
    )
    return F.from_json(dec(value), avro_to_spark_schema(avro_json_schema))


def soe_routed_avro(value: Column, schemas_by_fingerprint: dict[int, str]):
    """Single-object-encoding: fingerprint-dispatched Avro decode
    (reference src/serialization.rs:161-210).

    ``schemas_by_fingerprint`` maps the 8-byte Rabin fingerprint
    (little-endian i64, as produced by ``soe_fingerprint`` /
    ``avro_python.rabin_fingerprint``) to the Avro reader schema JSON.
    Unknown fingerprints → NULL (route to DLQ). JVM ``from_avro``
    branches when the jar is present; pure-Python decode otherwise.
    The decoded struct is the field-union of all reader schemas (a
    message leaves the other schemas' fields NULL).
    """
    merged = StructType()
    seen: set[str] = set()
    for schema_json in schemas_by_fingerprint.values():
        st = avro_to_spark_schema(schema_json)
        for field in st.fields:
            if field.name not in seen:
                seen.add(field.name)
                merged = merged.add(field)
    if _jvm_avro_loaded():
        from pyspark.sql.avro.functions import from_avro

        fp = soe_fingerprint(value)
        body = F.expr(f"substring({_sql(value)}, 11, length({_sql(value)}) - 10)")
        out = None
        for fingerprint, schema_json in schemas_by_fingerprint.items():
            branch = F.to_json(from_avro(body, schema_json))
            out = (
                F.when(fp == F.lit(fingerprint), branch)
                if out is None
                else out.when(fp == F.lit(fingerprint), branch)
            )
        return F.from_json(out, merged)
    dec = _python_avro_json_udf(schemas_by_fp=schemas_by_fingerprint)
    return F.from_json(dec(value), merged)
