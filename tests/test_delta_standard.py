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
