"""Transform compiler unit tests.

Mirrors the reference's transform test coverage
(reference src/transforms.rs:478-787): substr, epoch→ISO8601 functions,
ms→µs, kafka meta injection, nested target paths, null-skip.
"""

import pytest
from pyspark.sql import Row, functions as F

from kafka_delta_ingest_spark.transforms import (
    Transformer,
    compile_expression,
    TransformError,
)


def _one(df):
    return df.collect()[0]


def test_substr_chars(spark):
    # reference src/transforms.rs:478-520 `transforms_with_substr`
    df = spark.createDataFrame([Row(name="William Gibson")])
    out = df.select(compile_expression("substr(name, `0`, `4`)").alias("x"))
    assert _one(out).x == "Will"
    out = df.select(compile_expression("substr(name, `8`, `20`)").alias("x"))
    assert _one(out).x == "Gibson"


def test_substr_unicode_chars_not_bytes(spark):
    df = spark.createDataFrame([Row(name="héllo wörld")])
    out = df.select(compile_expression("substr(name, `1`, `4`)").alias("x"))
    assert _one(out).x == "éllo"


def test_epoch_seconds_to_iso8601(spark):
    # reference doc: 1626823098 → "2021-07-20T23:18:18Z"
    df = spark.createDataFrame([Row(ts=1626823098)])
    out = df.select(compile_expression("epoch_seconds_to_iso8601(ts)").alias("x"))
    assert _one(out).x == "2021-07-20T23:18:18Z"


def test_epoch_millis_to_iso8601_variable_precision(spark):
    df = spark.createDataFrame(
        [Row(a=1626823098000, b=1626823098123, c=1626823098120)]
    )
    out = df.select(
        compile_expression("epoch_millis_to_iso8601(a)").alias("a"),
        compile_expression("epoch_millis_to_iso8601(b)").alias("b"),
        compile_expression("epoch_millis_to_iso8601(c)").alias("c"),
    )
    r = _one(out)
    assert r.a == "2021-07-20T23:18:18Z"  # whole second → no fraction
    assert r.b == "2021-07-20T23:18:18.123Z"  # millis → 3 digits
    assert r.c == "2021-07-20T23:18:18.120Z"


def test_epoch_micros_to_iso8601(spark):
    df = spark.createDataFrame([Row(a=1626823098123456, b=1626823098123000)])
    out = df.select(
        compile_expression("epoch_micros_to_iso8601(a)").alias("a"),
        compile_expression("epoch_micros_to_iso8601(b)").alias("b"),
    )
    r = _one(out)
    assert r.a == "2021-07-20T23:18:18.123456Z"
    assert r.b == "2021-07-20T23:18:18.123Z"  # trailing zeros trimmed to 3


def test_epoch_millis_to_micro(spark):
    df = spark.createDataFrame([Row(ms=1626823098123)])
    out = df.select(compile_expression("epoch_millis_to_micro(ms)").alias("x"))
    assert _one(out).x == 1626823098123000


def test_to_number_composition(spark):
    # reference src/transforms.rs:184: epoch_seconds_to_iso8601(to_number(ts))
    df = spark.createDataFrame([Row(ts="1626823098")])
    out = df.select(
        compile_expression("epoch_seconds_to_iso8601(to_number(ts))").alias("x")
    )
    assert _one(out).x == "2021-07-20T23:18:18Z"


def test_dotted_path_source(spark):
    df = spark.createDataFrame([Row(meta=Row(producer=Row(timestamp="2021-07-20T23:18:18Z")))])
    out = df.select(
        compile_expression("substr(meta.producer.timestamp, `0`, `10`)").alias("date")
    )
    assert _one(out).date == "2021-07-20"


def test_kafka_meta_transform(spark):
    # reference src/transforms.rs:~test_transforms_with_kafka_meta
    import datetime

    df = spark.createDataFrame(
        [
            Row(
                value="m",
                partition=3,
                offset=42,
                topic="t1",
                timestamp=datetime.datetime(2021, 7, 20, 23, 18, 18),
                timestampType=0,
            )
        ]
    )
    t = Transformer(
        {
            "_kafka_partition": "kafka.partition",
            "_kafka_offset": "kafka.offset",
            "_kafka_topic": "kafka.topic",
            "_kafka_ts": "kafka.timestamp",
            "_kafka_ts_type": "kafka.timestamp_type",
        }
    )
    r = t.apply(df).collect()[0]
    assert r._kafka_partition == 3
    assert r._kafka_offset == 42
    assert r._kafka_topic == "t1"
    # ms → µs (reference src/transforms.rs:467-470)
    assert r._kafka_ts == 1626823098000000
    assert r._kafka_ts_type == 0


def test_nested_target_creates_structs(spark):
    # reference src/transforms.rs set_value_sets_recursively
    df = spark.createDataFrame([Row(name="A", offset=7)])
    t = Transformer({"meta.kafka.offset": "offset"})
    r = t.apply(df).collect()[0]
    assert r.meta.kafka.offset == 7


def test_nested_target_into_existing_struct(spark):
    df = spark.createDataFrame([Row(meta=Row(existing="x"), offset=7)])
    t = Transformer({"meta.kafka_offset": "offset"})
    r = t.apply(df).collect()[0]
    assert r.meta.existing == "x"
    assert r.meta.kafka_offset == 7


def test_null_result_not_assigned(spark):
    # reference src/transforms.rs:345-346 — null results keep prior value
    df = spark.createDataFrame([Row(a=None, b="keepme")], "a string, b string")
    t = Transformer({"b": "a"})
    r = t.apply(df).collect()[0]
    assert r.b == "keepme"


def test_overwrite_existing_column(spark):
    df = spark.createDataFrame([Row(a="new", b="old")])
    t = Transformer({"b": "a"})
    r = t.apply(df).collect()[0]
    assert r.b == "new"


def test_unknown_function_raises():
    with pytest.raises(TransformError):
        compile_expression("no_such_fn(a)")


def test_transforms_read_original_snapshot(spark):
    # All sources read the ORIGINAL message (reference src/transforms.rs:399):
    # swapping a and b uses input values, not chained outputs.
    df = spark.createDataFrame([Row(a="1", b="2")])
    t = Transformer({"a": "b", "b": "a"})
    r = t.apply(df).collect()[0]
    assert (r.a, r.b) == ("2", "1")


def test_redact_pii_transform_function(spark):
    """`redact_pii(field)` is available in the transform expression
    surface, scrubbing identifiers inside the message path."""
    from kafka_delta_ingest_spark.transforms import Transformer

    df = spark.createDataFrame(
        [(1, "mail bob@corp.example.com or dial 415-555-0100")],
        "id long, note string",
    )
    out = Transformer({"note": "redact_pii(note)"}).apply(df).collect()[0]
    assert out.note == "mail <EMAIL> or dial <PHONE>"
