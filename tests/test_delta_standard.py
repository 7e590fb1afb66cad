"""Standard-layout Delta reader tests: log replay, checkpoints, time
travel, partition reconstruction, column mapping, unsupported-feature
errors."""

import glob
import json
import os

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_delta_ingest_spark.delta_standard import (
    DeltaFixtureWriter,
    delta_history,
    read_delta,
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
    w = DeltaFixtureWriter(t, _SCHEMA, partition_cols=["grp"])
    v0 = w.add_files(
        [
            ({"grp": "a"},
             [{"doc_id": i, "grp": "a", "val": i * 10} for i in range(5)]),
            ({"grp": "b"},
             [{"doc_id": i, "grp": "b", "val": i * 10}
              for i in range(5, 10)]),
        ],
        timestamp_ms=1000,
    )
    v1 = w.add_files(
        [
            ({"grp": "a"},
             [{"doc_id": i, "grp": "a", "val": i * 10}
              for i in range(10, 13)]),
        ],
        timestamp_ms=2000,
    )
    w.checkpoint()
    rel = os.path.relpath(glob.glob(t + "/grp=b/*.parquet")[0], t)
    v2 = w.remove_files([rel], timestamp_ms=3000)
    return t, (v0, v1, v2)


def test_latest_state_and_partition_columns(spark, table):
    t, _ = table
    df = read_delta(spark, t)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,grp:string,val:bigint>"
    )
    got = sorted((r.doc_id, r.grp, r.val) for r in df.collect())
    assert got == [
        (i, "a", i * 10) for i in list(range(5)) + list(range(10, 13))
    ]


def test_version_and_timestamp_travel(spark, table):
    t, (v0, v1, v2) = table
    assert sorted(
        r.doc_id for r in read_delta(spark, t, version=v0).collect()
    ) == list(range(10))
    assert sorted(
        r.doc_id for r in read_delta(spark, t, version=v1).collect()
    ) == list(range(13))
    assert sorted(
        r.doc_id for r in read_delta(spark, t, timestamp_ms=2500).collect()
    ) == list(range(13))
    with pytest.raises(ValueError, match="no commit at or before"):
        read_delta(spark, t, timestamp_ms=500)
    with pytest.raises(ValueError, match="beyond log end"):
        read_delta(spark, t, version=99)


def test_checkpoint_is_actually_used(spark, table):
    t, _ = table
    # removing the pre-checkpoint commit forces state from checkpoint
    os.remove(os.path.join(t, "_delta_log", "%020d.json" % 0))
    got = sorted(r.doc_id for r in read_delta(spark, t).collect())
    assert got == list(range(5)) + list(range(10, 13))


def test_history(table):
    t, _ = table
    hist = delta_history(t)
    assert [(h["version"], h["operation"]) for h in hist] == [
        (0, "WRITE"), (1, "WRITE"), (2, "DELETE")
    ]


def test_column_mapping_name_mode(spark, tmp_path):
    t = str(tmp_path / "cm")
    phys = {"doc_id": "col-aaaa", "val": "col-bbbb"}
    schema = StructType(
        [
            StructField(
                "doc_id", LongType(), True,
                {"delta.columnMapping.physicalName": "col-aaaa"},
            ),
            StructField(
                "val", LongType(), True,
                {"delta.columnMapping.physicalName": "col-bbbb"},
            ),
        ]
    )
    w = DeltaFixtureWriter(
        t, schema,
        configuration={"delta.columnMapping.mode": "name"},
    )
    w.add_files(
        [({}, [{"doc_id": 1, "val": 10}, {"doc_id": 2, "val": 20}])],
        timestamp_ms=1000,
        physical_names=phys,
    )
    df = read_delta(spark, t)
    assert set(df.columns) == {"doc_id", "val"}
    assert sorted((r.doc_id, r.val) for r in df.collect()) == [
        (1, 10), (2, 20)
    ]


def test_column_mapping_with_physical_partition_names(spark, tmp_path):
    # r6 review finding: in mapping mode the log stores
    # partitionColumns and add.partitionValues under PHYSICAL names.
    t = str(tmp_path / "cmp")
    schema = StructType(
        [
            StructField(
                "doc_id", LongType(), True,
                {"delta.columnMapping.physicalName": "col-id"},
            ),
            StructField(
                "lang", StringType(), True,
                {"delta.columnMapping.physicalName": "col-lang"},
            ),
        ]
    )
    w = DeltaFixtureWriter(
        t, schema,
        partition_cols=["col-lang"],  # physical, as real writers do
        configuration={"delta.columnMapping.mode": "name"},
    )
    w.add_files(
        [
            ({"col-lang": "en"}, [{"doc_id": 1}, {"doc_id": 2}]),
            ({"col-lang": "fr"}, [{"doc_id": 3}]),
        ],
        timestamp_ms=1000,
        physical_names={"doc_id": "col-id"},
    )
    df = read_delta(spark, t)
    assert set(df.columns) == {"doc_id", "lang"}
    got = sorted((r.doc_id, r.lang) for r in df.collect())
    assert got == [(1, "en"), (2, "en"), (3, "fr")]


def test_null_partition_value_does_not_crash_sort(spark, tmp_path):
    t = str(tmp_path / "np")
    w = DeltaFixtureWriter(t, _SCHEMA, partition_cols=["grp"])
    w.add_files(
        [({"grp": "a"}, [{"doc_id": 1, "grp": "a", "val": 1}])],
        timestamp_ms=1000,
    )
    # hand-add a file whose partition value is null (non-hive path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = os.path.join(t, "loose.parquet")
    pq.write_table(pa.table({"doc_id": [9], "val": [90]}), p)
    with open(os.path.join(t, "_delta_log", "%020d.json" % 1), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "WRITE",
                                           "timestamp": 2000}}) + "\n")
        f.write(json.dumps({"add": {"path": "loose.parquet",
                                    "partitionValues": {"grp": None},
                                    "size": 1, "modificationTime": 2000,
                                    "dataChange": True}}) + "\n")
    got = sorted(
        (r.doc_id, r.grp) for r in read_delta(spark, t).collect()
    )
    assert got == [(1, "a"), (9, None)]


def test_hive_detection_matches_whole_segments(spark, tmp_path):
    # a partition column named "e" must NOT substring-match "date=..."
    t = str(tmp_path / "seg")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("e", StringType())]
    )
    w = DeltaFixtureWriter(t, schema, partition_cols=["e"])
    # non-hive layout whose path contains "date=" but no "e=" segment
    import pyarrow as pa
    import pyarrow.parquet as pq

    sub = os.path.join(t, "date=2024")
    os.makedirs(sub, exist_ok=True)
    pq.write_table(pa.table({"doc_id": [5]}), os.path.join(sub, "f.parquet"))
    with open(os.path.join(t, "_delta_log", "%020d.json" % 0), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "WRITE",
                                           "timestamp": 1000}}) + "\n")
        f.write(json.dumps({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps(w._meta_action()) + "\n")
        f.write(json.dumps({"add": {"path": "date=2024/f.parquet",
                                    "partitionValues": {"e": "x"},
                                    "size": 1, "modificationTime": 1000,
                                    "dataChange": True}}) + "\n")
    got = read_delta(spark, t).collect()
    assert [(r.doc_id, r.e) for r in got] == [(5, "x")]


def test_version_before_earliest_commit_raises(spark, table):
    t, _ = table
    with pytest.raises(ValueError, match="before earliest|beyond"):
        read_delta(spark, t, version=-3)


def test_id_mapping_and_deletion_vectors_raise(spark, tmp_path):
    t = str(tmp_path / "bad")
    w = DeltaFixtureWriter(
        t, _SCHEMA, configuration={"delta.columnMapping.mode": "id"}
    )
    w.add_files(
        [({}, [{"doc_id": 1, "grp": "a", "val": 1}])], timestamp_ms=1
    )
    with pytest.raises(ValueError, match="columnMapping mode 'id'"):
        read_delta(spark, t)

    t2 = str(tmp_path / "dv")
    w2 = DeltaFixtureWriter(t2, _SCHEMA)
    w2.add_files(
        [({}, [{"doc_id": 1, "grp": "a", "val": 1}])], timestamp_ms=1
    )
    # tamper: attach a deletionVector to the add action
    log = os.path.join(t2, "_delta_log", "%020d.json" % 0)
    lines = [json.loads(x) for x in open(log)]
    for a in lines:
        if "add" in a:
            a["add"]["deletionVector"] = {"storageType": "u",
                                          "pathOrInlineDv": "x"}
    with open(log, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="deletion vectors"):
        read_delta(spark, t2)


def test_missing_log_raises(tmp_path):
    with pytest.raises(ValueError, match="_delta_log"):
        delta_history(str(tmp_path / "none"))
