"""Coercion-layer tests — golden cases from reference src/coercions.rs
tests (156-453): ToString on structs, strict RFC3339 timestamp gate,
numeric epoch pass-through, nested/array recursion."""

import datetime

from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_delta_ingest_spark.coercions import (
    apply_coercions,
    rfc3339_conforms,
    rfc3339_to_timestamp,
)

UTC = datetime.timezone.utc


def test_rfc3339_accept_reject_matrix(spark):
    # Exact accept/reject set from reference src/coercions.rs:360-446.
    cases = [
        ("2021-11-11T22:11:58Z", True),
        ("2021-11-11T22:11:58+00:00", True),
        ("2021-11-11T22:11:58-00:00", True),  # RFC3339 but not ISO8601: coerced
        ("20211111T22115800Z", False),  # ISO8601 basic: NOT coerced
        ("2021-11-11 22:11:58", False),  # Java-style, no offset: NOT coerced
        ("This definitely is not a timestamp", False),
        ("1636668718000000", False),  # numeric string: NOT coerced
    ]
    df = spark.createDataFrame([Row(s=s) for s, _ in cases])
    rows = df.select(
        "s",
        rfc3339_to_timestamp(F.col("s")).alias("ts"),
        rfc3339_conforms(F.col("s")).alias("ok"),
    ).collect()
    expect = dict(cases)
    for r in rows:
        assert r.ok == expect[r.s], r.s
        if expect[r.s]:
            assert r.ts == datetime.datetime(2021, 11, 11, 22, 11, 58)
        else:
            assert r.ts is None


def test_tostring_struct_to_json(spark):
    # {"a": 1} destined for a string column → '{"a":1}' (compact)
    target = StructType([StructField("level1_string", StringType())])
    df = spark.createDataFrame([Row(level1_string=Row(a=1))])
    out = apply_coercions(df, target).collect()[0]
    assert out.level1_string == '{"a":1}'
    assert out._conforms


def test_numeric_epoch_micros_passthrough(spark):
    target = StructType([StructField("ts", TimestampType())])
    df = spark.createDataFrame([Row(ts=1636668718000000)])
    out = apply_coercions(df, target).collect()[0]
    assert out.ts == datetime.datetime(2021, 11, 11, 22, 11, 58)
    assert out._conforms


def test_nonconforming_string_flags_row(spark):
    target = StructType([StructField("ts", TimestampType())])
    df = spark.createDataFrame([Row(ts="2021-11-11 22:11:58")])
    out = apply_coercions(df, target).collect()[0]
    assert out.ts is None
    assert not out._conforms


def test_nested_struct_and_arrays(spark):
    # array_struct with mixed string/timestamp leaves, like the reference
    # fixture schema (src/coercions.rs:156-243).
    target = StructType(
        [
            StructField(
                "level2",
                StructType(
                    [
                        StructField("level2_string", StringType()),
                        StructField("level2_timestamp", TimestampType()),
                    ]
                ),
            ),
            StructField("array_timestamp", ArrayType(TimestampType())),
            StructField("array_int", ArrayType(LongType())),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(
                level2=Row(level2_string=Row(x="x"), level2_timestamp="2021-11-16T22:22:03Z"),
                array_timestamp=["2021-11-17T00:22:03Z", "2021-11-17T01:23:04Z"],
                array_int=[1, 2, 3],
            )
        ]
    )
    out = apply_coercions(df, target).collect()[0]
    assert out.level2.level2_string == '{"x":"x"}'
    assert out.level2.level2_timestamp == datetime.datetime(2021, 11, 16, 22, 22, 3)
    assert out.array_timestamp[0] == datetime.datetime(2021, 11, 17, 0, 22, 3)
    assert out.array_int == [1, 2, 3]
    assert out._conforms


def test_missing_fields_become_null(spark):
    # SURVEY §1.2: missing fields → nulls (schema_update_tests.rs:98-110)
    target = StructType(
        [StructField("id", StringType()), StructField("color", StringType())]
    )
    df = spark.createDataFrame([Row(id="1")])
    out = apply_coercions(df, target).collect()[0]
    assert out.id == "1"
    assert out.color is None
    assert out._conforms


def test_extra_fields_dropped(spark):
    target = StructType([StructField("id", StringType())])
    df = spark.createDataFrame([Row(id="1", extra="x")])
    out = apply_coercions(df, target)
    assert out.columns == ["id", "_conforms"]


def test_int_to_string_coercion(spark):
    target = StructType([StructField("s", StringType())])
    df = spark.createDataFrame([Row(s=42)])
    assert apply_coercions(df, target).collect()[0].s == "42"
