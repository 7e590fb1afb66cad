"""Change Data Feed over STANDARD _delta_log tables
(delta_standard.table_changes): cdc actions, derived inserts/deletes,
version windows, and the DV-without-cdc guard."""

import glob
import os

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_delta_ingest_spark.delta_standard import (
    DeltaFixtureWriter,
    table_changes,
)

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("grp", StringType()),
        StructField("val", LongType()),
    ]
)


@pytest.fixture()
def table(tmp_path):
    t = str(tmp_path / "t")
    w = DeltaFixtureWriter(t, _SCHEMA)
    w.add_files(
        [({}, [{"doc_id": i, "grp": "a", "val": i} for i in range(5)])],
        timestamp_ms=1000,
    )
    w.add_files(
        [({}, [{"doc_id": i, "grp": "b", "val": i}
               for i in range(5, 8)])],
        timestamp_ms=2000,
    )
    return t, w


def test_derived_inserts(spark, table):
    t, _ = table
    ch = table_changes(spark, t, 0, 1)
    got = sorted(
        (r.doc_id, r._change_type, r._commit_version)
        for r in ch.collect()
    )
    assert got == [(i, "insert", 0) for i in range(5)] + [
        (i, "insert", 1) for i in range(5, 8)
    ]
    # window selects a single commit
    assert table_changes(spark, t, 1, 1).count() == 3
    ts = {r._commit_timestamp for r in
          table_changes(spark, t, 1, 1).collect()}
    assert ts == {2000}


def test_derived_delete_from_remove(spark, table):
    t, w = table
    first = sorted(
        os.path.relpath(p, t) for p in glob.glob(t + "/part-*.parquet")
    )[0]
    w.remove_files([first], timestamp_ms=3000)
    ch = table_changes(spark, t, 2, 2)
    got = sorted((r.doc_id, r._change_type) for r in ch.collect())
    assert got == [(i, "delete") for i in range(5)]


def test_cdc_action_wins_over_derivation(spark, table):
    t, w = table
    first = sorted(
        os.path.relpath(p, t) for p in glob.glob(t + "/part-*.parquet")
    )[0]
    # an UPDATE recorded via cdc: pre/post images for one row
    w.commit_with_cdc(
        [first],
        [
            {"doc_id": 2, "grp": "a", "val": 2,
             "_change_type": "update_preimage"},
            {"doc_id": 2, "grp": "a", "val": 99,
             "_change_type": "update_postimage"},
        ],
        timestamp_ms=3000,
    )
    ch = table_changes(spark, t, 2, 2)
    got = sorted((r.doc_id, r.val, r._change_type) for r in ch.collect())
    # ONLY the cdc rows — the remove in the same commit must not also
    # derive deletes
    assert got == [
        (2, 2, "update_preimage"), (2, 99, "update_postimage")
    ]


def test_dv_delete_without_cdc_raises(spark, table):
    t, w = table
    first = sorted(
        os.path.relpath(p, t) for p in glob.glob(t + "/part-*.parquet")
    )[0]
    w.delete_rows(first, [0], timestamp_ms=3000)
    with pytest.raises(ValueError, match="deletion vectors"):
        table_changes(spark, t, 2, 2).collect()
    # earlier windows still work
    assert table_changes(spark, t, 0, 1).count() == 8


def test_empty_window_raises(spark, table):
    t, _ = table
    with pytest.raises(ValueError, match="no changes"):
        table_changes(spark, t, 5, 9)


def test_partitioned_table_changes(spark, tmp_path):
    t = str(tmp_path / "p")
    w = DeltaFixtureWriter(t, _SCHEMA, partition_cols=["grp"])
    w.add_files(
        [({"grp": "a"},
          [{"doc_id": i, "grp": "a", "val": i} for i in range(3)]),
         ({"grp": "b"},
          [{"doc_id": 9, "grp": "b", "val": 9}])],
        timestamp_ms=1000,
    )
    ch = table_changes(spark, t, 0)
    got = sorted((r.doc_id, r.grp) for r in ch.collect())
    assert got == [(0, "a"), (1, "a"), (2, "a"), (9, "b")]


def test_writer_dv_delete_emits_cdc_when_cdf_enabled(spark, tmp_path):
    """r8: DeltaStandardWriter(enable_cdf=True) — a DV delete_where
    writes the deleted rows as _change_data/ cdc parquet + cdc
    actions, so table_changes serves the exact change set (without
    CDF the same commit raises, pinned below)."""
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.delta_standard import (
        DeltaStandardWriter,
        read_delta,
    )

    t = str(tmp_path / "wcdf")
    w = DeltaStandardWriter(t, enable_cdf=True)
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") * 10).alias("val"),
    )
    w.write(df)                                   # v0
    v = w.delete_where(spark, "doc_id % 3 = 0")   # v1: DV + cdc
    # live view: DV applied
    assert sorted(
        r.doc_id for r in read_delta(spark, t).collect()
    ) == [i for i in range(10) if i % 3 != 0]
    # CDF serves the DELETE's exact change set
    ch = table_changes(spark, t, v, v)
    got = sorted(
        (r.doc_id, r._change_type) for r in ch.collect()
    )
    assert got == [(i, "delete") for i in range(10) if i % 3 == 0]
    assert {r._commit_version for r in ch.collect()} == {v}
    # metaData carries the table property
    from kafka_delta_ingest_spark.delta_standard import (
        DeltaStandardSink,
    )

    meta = DeltaStandardSink(t).snapshot()["metaData"]
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"
    # contrast: a CDF-OFF writer's DV delete stays underivable
    t2 = str(tmp_path / "nocdf")
    w2 = DeltaStandardWriter(t2)
    w2.write(df)
    v2 = w2.delete_where(spark, "doc_id = 1")
    with pytest.raises(ValueError, match="enable CDF"):
        table_changes(spark, t2, v2, v2).collect()
