"""CHECK constraints: Delta ALTER TABLE ADD CONSTRAINT parity."""

import pytest
from pyspark.sql import Row

from kafka_delta_ingest_spark.sinks.delta_like import (
    ConstraintViolation,
    DeltaLikeTable,
)


def _t(spark, tmp_path, rows=None):
    t = DeltaLikeTable(str(tmp_path / "t"))
    rows = rows or [Row(id=i, qty=i + 1) for i in range(5)]
    t.write_batch(spark.createDataFrame(rows))
    return t


def test_constraint_blocks_violating_append(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "qty_positive", "qty > 0")
    assert t.constraints() == {"qty_positive": "qty > 0"}

    with pytest.raises(ConstraintViolation, match="qty_positive"):
        t.write_batch(spark.createDataFrame([Row(id=99, qty=-1)]))
    # The failed transaction left nothing behind.
    assert t.read(spark).count() == 5

    t.write_batch(spark.createDataFrame([Row(id=100, qty=7)]))
    assert t.read(spark).count() == 6


def test_constraint_null_satisfies(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "qty_positive", "qty > 0")
    from pyspark.sql.types import LongType, StructField, StructType

    sch = StructType(
        [StructField("id", LongType()), StructField("qty", LongType())]
    )
    t.write_batch(spark.createDataFrame([(7, None)], sch))
    assert t.read(spark).count() == 6  # NULL passes (SQL CHECK semantics)


def test_add_constraint_rejects_violating_table(spark, tmp_path):
    t = _t(spark, tmp_path, rows=[Row(id=0, qty=-5), Row(id=1, qty=3)])
    with pytest.raises(ConstraintViolation, match="1 existing"):
        t.add_constraint(spark, "qty_positive", "qty > 0")
    assert t.constraints() == {}


def test_constraint_survives_checkpoint_and_drop(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "qty_positive", "qty > 0")
    for i in range(10):  # drive past a checkpoint boundary
        t.write_batch(spark.createDataFrame([Row(id=200 + i, qty=1)]))
    assert t.constraints() == {"qty_positive": "qty > 0"}
    with pytest.raises(ConstraintViolation):
        t.write_batch(spark.createDataFrame([Row(id=999, qty=0)]))

    t.drop_constraint("qty_positive")
    t.write_batch(spark.createDataFrame([Row(id=999, qty=0)]))
    assert t.read(spark).filter("id = 999").count() == 1
    with pytest.raises(ValueError):
        t.drop_constraint("qty_positive")


def test_merge_enforces_constraints(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "qty_positive", "qty > 0")
    bad = spark.createDataFrame([Row(id=2, qty=-9)])
    with pytest.raises(ConstraintViolation):
        t.merge(spark, bad, key_cols=["id"])
    assert t.read(spark).filter("qty < 0").count() == 0


def test_constraint_survives_schema_evolution(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    t = _t(spark, tmp_path)
    t.add_constraint(spark, "qty_positive", "qty > 0")
    t.evolve_schema(
        StructType(
            [
                StructField("id", LongType()),
                StructField("qty", LongType()),
                StructField("note", StringType()),
            ]
        )
    )
    assert t.constraints() == {"qty_positive": "qty > 0"}
    with pytest.raises(ConstraintViolation):
        t.write_batch(spark.createDataFrame([Row(id=9, qty=-2, note="x")]))


def test_generated_column_computed_when_missing(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    t = DeltaLikeTable(str(tmp_path / "t"))
    t.write_batch(
        spark.createDataFrame(
            [Row(id=1, ts="2024-03-01T10:00:00", date="2024-03-01")]
        )
    )
    t.set_generated_column("date", "substring(ts, 1, 10)")
    # Writer omits the column -> computed in-flight.
    sch = StructType(
        [StructField("id", LongType()), StructField("ts", StringType())]
    )
    t.write_batch(spark.createDataFrame([(2, "2024-04-15T09:30:00")], sch))
    got = {r.id: r.date for r in t.read(spark).collect()}
    assert got[2] == "2024-04-15"


def test_generated_column_validates_supplied_values(spark, tmp_path):
    t = DeltaLikeTable(str(tmp_path / "t"))
    t.write_batch(
        spark.createDataFrame(
            [Row(id=1, ts="2024-03-01T10:00:00", date="2024-03-01")]
        )
    )
    t.set_generated_column("date", "substring(ts, 1, 10)")
    with pytest.raises(ConstraintViolation, match="generated column date"):
        t.write_batch(
            spark.createDataFrame(
                [Row(id=3, ts="2024-05-01T00:00:00", date="1999-01-01")]
            )
        )
    # Correctly supplied values pass.
    t.write_batch(
        spark.createDataFrame(
            [Row(id=4, ts="2024-05-01T00:00:00", date="2024-05-01")]
        )
    )
    assert t.read(spark).count() == 2
