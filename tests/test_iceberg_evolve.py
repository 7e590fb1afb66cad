"""Iceberg schema evolution (ALTER TABLE ADD COLUMNS analog).

evolve_schema commits a NEW schema object (fresh schema-id,
current-schema-id updated, last-column-id advanced — ids never
reused, the spec rule that keeps old files readable forever) as a
metadata-only version; snapshots and data files are untouched. The
writer refuses stray frame columns until evolution (the Delta legs'
guard), adopts an evolved schema committed by another instance, and
the mid-stream e2e mirrors the reference's evolve-while-streaming
scenario (tests/schema_update_tests.rs:23-113) on the Iceberg leg.
"""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_delta_ingest_spark.iceberg import (
    IcebergWriter,
    load_metadata,
    read_iceberg,
)

FIELDS = [
    {"id": 1, "name": "id", "type": "long", "required": False},
    {"id": 2, "name": "color", "type": "string", "required": False},
]


def _df(spark, rows, schema="id long, color string"):
    return spark.createDataFrame(rows, schema)


def test_evolve_commits_new_schema_id_and_null_fills(spark, tmp_path):
    t = str(tmp_path / "ev")
    w = IcebergWriter(t, FIELDS)
    w.append(_df(spark, [(1, "red"), (2, "blue")]).coalesce(1),
             ts_ms=1000)
    v2 = StructType(
        [
            StructField("id", LongType()),
            StructField("color", StringType()),
            StructField("size", IntegerType()),
        ]
    )
    w.evolve_schema(v2)
    meta = load_metadata(t)
    assert meta["current-schema-id"] == 1
    assert len(meta["schemas"]) == 2
    assert meta["last-column-id"] == 3
    new_field = [
        f for f in meta["schemas"][1]["fields"] if f["name"] == "size"
    ][0]
    assert new_field["id"] == 3 and new_field["type"] == "int"
    # post-evolution append carries the new column; old rows null-fill
    w.append(
        _df(spark, [(3, "green", 7)],
            "id long, color string, size int").coalesce(1),
        ts_ms=2000,
    )
    got = {
        r["id"]: r["size"] for r in read_iceberg(spark, t).collect()
    }
    assert got == {1: None, 2: None, 3: 7}


def test_stray_column_refused_until_evolution(spark, tmp_path):
    t = str(tmp_path / "ev2")
    w = IcebergWriter(t, FIELDS)
    w.append(_df(spark, [(1, "red")]).coalesce(1), ts_ms=1000)
    with pytest.raises(ValueError, match="evolve_schema"):
        w.append(
            _df(spark, [(2, "blue", 9)],
                "id long, color string, size int").coalesce(1),
            ts_ms=2000,
        )


def test_append_never_rolls_back_anothers_evolution(spark, tmp_path):
    """A stale writer instance (constructed with the ORIGINAL fields)
    appending after an external evolve must carry the evolved schema
    forward, never rebuild metadata from its own stale fields."""
    t = str(tmp_path / "ev3")
    w1 = IcebergWriter(t, FIELDS)
    w1.append(_df(spark, [(1, "red")]).coalesce(1), ts_ms=1000)
    w2 = IcebergWriter(t, FIELDS)  # stale instance
    v2 = StructType(
        [
            StructField("id", LongType()),
            StructField("color", StringType()),
            StructField("size", IntegerType()),
        ]
    )
    w1.evolve_schema(v2)
    w2.append(_df(spark, [(2, "blue")]).coalesce(1), ts_ms=2000)
    meta = load_metadata(t)
    assert meta["current-schema-id"] == 1  # evolution survived
    assert len(meta["schemas"]) == 2


def test_evolve_guards(spark, tmp_path):
    t = str(tmp_path / "ev4")
    w = IcebergWriter(t, FIELDS)
    w.append(_df(spark, [(1, "red")]).coalesce(1), ts_ms=1000)
    # omission refused
    with pytest.raises(ValueError, match="add-only"):
        w.evolve_schema(StructType([StructField("id", LongType())]))
    # type change refused
    with pytest.raises(ValueError, match="type change"):
        w.evolve_schema(
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("color", StringType()),
                ]
            )
        )
    # identical schema is a no-op: no new metadata version lands
    before, _ = w._current()
    v = w.evolve_schema(
        StructType(
            [
                StructField("id", LongType()),
                StructField("color", StringType()),
            ]
        )
    )
    after, _ = w._current()
    assert v == before == after
    assert len(load_metadata(t).get("schemas", [])) == 1


def test_evolve_mid_stream_iceberg_destination(spark, tmp_path):
    """The reference's evolve-while-streaming scenario on the Iceberg
    destination: batch 1 streams under the v1 schema; an external
    ALTER lands as an evolve_schema metadata version; the SAME running
    job adopts it via sync_schema (IcebergSink.table_schema now
    reconstructs the declared schema once evolution happened) and
    batch 2 carries the new column; replay of batch 2 is SKIPPED
    (exactly-once survives evolution)."""
    from kafka_delta_ingest_spark.ingest import IngestJob, IngestOptions

    table = str(tmp_path / "ice_evolve")
    opts = IngestOptions(
        topic="t", table_uri=table, app_id="iev", transforms={},
        log_format="iceberg",
    )
    v1 = StructType(
        [StructField("id", StringType()),
         StructField("color", StringType())]
    )
    job = IngestJob(opts, v1)

    def raw(lo, n, extra=None):
        rows = []
        for i in range(lo, lo + n):
            payload = {"id": str(i), "color": "red"}
            if extra:
                payload.update(extra(i))
            rows.append(
                Row(
                    value=bytearray(json.dumps(payload).encode()),
                    partition=0,
                    offset=i,
                    topic="t",
                    timestamp=None,
                    timestampType=0,
                )
            )
        sdf = spark.createDataFrame(
            rows,
            "value binary, partition int, offset long, topic string, "
            "timestamp timestamp, timestampType int",
        )
        return sdf

    job.run_batch(raw(0, 3))

    v2 = StructType(
        list(v1.fields) + [StructField("size", IntegerType())]
    )
    job.table.evolve_schema(v2)

    job.run_batch(raw(3, 3, extra=lambda i: {"size": i * 10}))
    assert job.target_schema == v2

    out = {
        r["id"]: (r["color"], r["size"])
        for r in read_iceberg(spark, table).collect()
    }
    assert len(out) == 6
    assert out["1"] == ("red", None)
    assert out["4"] == ("red", 40)
    assert job.run_batch(
        raw(3, 3, extra=lambda i: {"size": i * 10})
    ).skipped
