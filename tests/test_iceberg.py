"""Iceberg reader tests against fixture tables the reader's own Spark
session did not write: snapshot selection, time travel, v2
position/equality deletes, manifest-level partition pruning, metadata
discovery, and malformed-input errors."""

import json
import os

from pyspark.sql import functions as F

import pytest

from kafka_delta_ingest_spark.iceberg import (
    IcebergFixtureWriter,
    load_metadata,
    plan_files,
    read_iceberg,
    snapshots,
)

_FIELDS = [
    {"id": 1, "name": "doc_id", "type": "long", "required": False},
    {"id": 2, "name": "grp", "type": "string", "required": False},
]


@pytest.fixture()
def table(tmp_path):
    w = IcebergFixtureWriter(str(tmp_path / "t"), _FIELDS)
    s1 = w.append(
        [{"doc_id": i, "grp": "a" if i % 2 else "b"} for i in range(10)],
        ts_ms=1000,
        partition={"bucket": "p0"},
    )
    s2 = w.append(
        [{"doc_id": i, "grp": "c"} for i in range(10, 15)],
        ts_ms=2000,
        partition={"bucket": "p1"},
    )
    first = os.path.join(str(tmp_path / "t"), "data", "data-00001.parquet")
    s3 = w.position_delete([(first, 0), (first, 3)], ts_ms=3000)
    s4 = w.equality_delete([{"grp": "c"}], field_ids=[2], ts_ms=4000)
    return str(tmp_path / "t"), (s1, s2, s3, s4)


def test_current_snapshot_applies_both_delete_kinds(spark, table):
    t, _ = table
    got = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    # doc_id 0 and 3 position-deleted; 10..14 equality-deleted (grp=c)
    assert got == [1, 2] + list(range(4, 10))


def test_snapshot_id_and_timestamp_time_travel(spark, table):
    t, (s1, s2, s3, s4) = table
    assert sorted(
        r.doc_id for r in read_iceberg(spark, t, snapshot_id=s1).collect()
    ) == list(range(10))
    assert sorted(
        r.doc_id for r in read_iceberg(spark, t, snapshot_id=s2).collect()
    ) == list(range(15))
    assert sorted(
        r.doc_id
        for r in read_iceberg(spark, t, as_of_timestamp_ms=3500).collect()
    ) == [1, 2] + list(range(4, 15))
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg(spark, t, as_of_timestamp_ms=500)
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, t, snapshot_id=999999)


def test_partition_pruning_is_metadata_level(spark, table):
    t, (s1, s2, *_) = table
    # prune to the p0 bucket at snapshot 2: only the first file scans
    d, p, e, _ = plan_files(
        t, snapshot_id=s2,
        partition_filter=lambda part: part.get("bucket") == "p0",
    )
    assert len(d) == 1 and d[0][0].endswith("data-00001.parquet")
    got = sorted(
        r.doc_id
        for r in read_iceberg(
            spark, t, snapshot_id=s2,
            partition_filter=lambda part: part.get("bucket") == "p0",
        ).collect()
    )
    assert got == list(range(10))


def test_partition_pruning_never_drops_delete_files(spark, table):
    # r6 review finding: delete files carry empty/global partition
    # structs; pruning must apply to DATA files only or deleted rows
    # resurrect inside the kept partitions.
    t, _ = table
    d, p, e, _ = plan_files(
        t, partition_filter=lambda part: part.get("bucket") == "p0"
    )
    assert len(p) == 1 and len(e) == 1  # both delete files kept
    got = sorted(
        r.doc_id
        for r in read_iceberg(
            spark, t,
            partition_filter=lambda part: part.get("bucket") == "p0",
        ).collect()
    )
    # p0 bucket minus the two position-deleted rows (0 and 3)
    assert got == [1, 2] + list(range(4, 10))


def test_schema_evolution_union_across_files(spark, tmp_path):
    # additive evolution: a column added to the TABLE SCHEMA after
    # snapshot 1 must surface for every file (mergeSchema unions the
    # footers; old files read it as null) instead of depending on
    # which file Spark samples. The evolved commit carries the NEW
    # schema in its metadata — reads are schema-driven (r11), so a
    # physical column absent from the schema would NOT surface.
    w = IcebergFixtureWriter(str(tmp_path / "ev"), _FIELDS)
    w.append([{"doc_id": 1, "grp": "a"}], ts_ms=1)
    evolved = _FIELDS + [
        {"id": 3, "name": "extra", "required": False, "type": "long"}
    ]
    w2 = IcebergFixtureWriter(str(tmp_path / "ev"), evolved)
    w2.snaps = snapshots(str(tmp_path / "ev"))
    w2.version = 1
    w2._file_no = 1
    w2._live = []  # appended entries below merge with snapshot1's via
    # a fresh commit that carries BOTH files
    import pyarrow as pa
    import pyarrow.parquet as pq

    p2 = os.path.join(str(tmp_path / "ev"), "data", "data-00002.parquet")
    pq.write_table(
        pa.table({"doc_id": [2], "grp": ["b"], "extra": [99]}), p2
    )
    w2._live = [
        {
            "content": 0,
            "file_path": os.path.join(
                str(tmp_path / "ev"), "data", "data-00001.parquet"
            ),
            "file_format": "PARQUET",
            "partition": {},
            "record_count": 1,
            "file_size_in_bytes": 1,
            "equality_ids": None,
        },
        {
            "content": 0,
            "file_path": p2,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": 1,
            "file_size_in_bytes": 1,
            "equality_ids": None,
        },
    ]
    w2._commit([], ts_ms=2)
    df = read_iceberg(spark, str(tmp_path / "ev"))
    assert "extra" in df.columns
    got = {r.doc_id: r for r in df.collect()}
    assert got[2].extra == 99 and got[1].extra is None


def test_snapshot_history_and_metadata_discovery(table):
    t, (s1, s2, s3, s4) = table
    hist = snapshots(t)
    assert [s["snapshot-id"] for s in hist] == [s1, s2, s3, s4]
    # version-hint fallback: removing the hint still finds max vN
    os.remove(os.path.join(t, "metadata", "version-hint.text"))
    meta = load_metadata(t)
    assert meta["current-snapshot-id"] == s4


def test_malformed_inputs_raise(tmp_path):
    with pytest.raises(ValueError, match="no Iceberg metadata"):
        load_metadata(str(tmp_path / "nope"))
    # a non-parquet data file format is rejected at planning
    w = IcebergFixtureWriter(str(tmp_path / "t2"), _FIELDS)
    w.append([{"doc_id": 1, "grp": "a"}], ts_ms=1)
    man_meta = load_metadata(str(tmp_path / "t2"))
    # tamper: rewrite metadata pointing at an ORC file entry
    from kafka_delta_ingest_spark.avro_python import (
        read_container,
        write_container,
    )
    from kafka_delta_ingest_spark.iceberg import (
        _MANIFEST_ENTRY_SCHEMA,
    )

    snap = man_meta["snapshots"][-1]
    with open(snap["manifest-list"].replace("file://", ""), "rb") as f:
        _, manifests = read_container(f.read())
    mpath = manifests[0]["manifest_path"]
    with open(mpath, "rb") as f:
        _, entries = read_container(f.read())
    entries[0]["data_file"]["file_format"] = "ORC"
    with open(mpath, "wb") as f:
        f.write(write_container(entries, _MANIFEST_ENTRY_SCHEMA))
    with pytest.raises(ValueError, match="unsupported file format"):
        plan_files(str(tmp_path / "t2"))


def test_deleted_manifest_entries_are_skipped(spark, tmp_path):
    # status == 2 marks an entry removed from the snapshot
    w = IcebergFixtureWriter(str(tmp_path / "t3"), _FIELDS)
    w.append([{"doc_id": 1, "grp": "a"}], ts_ms=1)
    w.append([{"doc_id": 2, "grp": "a"}], ts_ms=2)
    meta = load_metadata(str(tmp_path / "t3"))
    from kafka_delta_ingest_spark.avro_python import (
        read_container,
        write_container,
    )
    from kafka_delta_ingest_spark.iceberg import _MANIFEST_ENTRY_SCHEMA

    snap = meta["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as f:
        _, manifests = read_container(f.read())
    mpath = manifests[0]["manifest_path"]
    with open(mpath, "rb") as f:
        _, entries = read_container(f.read())
    for e in entries:
        if e["data_file"]["file_path"].endswith("data-00001.parquet"):
            e["status"] = 2
    with open(mpath, "wb") as f:
        f.write(write_container(entries, _MANIFEST_ENTRY_SCHEMA))
    got = [r.doc_id for r in read_iceberg(spark, str(tmp_path / "t3")).collect()]
    assert got == [2]


def test_equality_delete_sequence_scoping(spark, tmp_path):
    # r7: interleaved delete/data commits — the r6 "all deletes apply
    # to all data" simplification gives the WRONG answer here: doc 5
    # is re-inserted AFTER the grp=c equality delete and must survive
    # (spec: equality deletes apply only to data files with STRICTLY
    # lower data sequence numbers).
    w = IcebergFixtureWriter(str(tmp_path / "sq"), _FIELDS)
    w.append([{"doc_id": 5, "grp": "c"}, {"doc_id": 1, "grp": "a"}],
             ts_ms=1000)                                    # seq 1
    w.equality_delete([{"grp": "c"}], field_ids=[2], ts_ms=2000)  # seq 2
    w.append([{"doc_id": 6, "grp": "c"}], ts_ms=3000)       # seq 3
    got = sorted(
        r.doc_id for r in read_iceberg(spark, str(tmp_path / "sq")).collect()
    )
    assert got == [1, 6]  # 5 deleted; 6 (post-delete insert) survives


def test_equality_delete_null_values_match_null_rows(spark, tmp_path):
    # spec: an equality delete row with a NULL column value deletes
    # rows whose column is null (plain join equality would resurrect
    # them) — r7 ADVICE fix, eqNullSafe.
    w = IcebergFixtureWriter(str(tmp_path / "nl"), _FIELDS)
    w.append(
        [{"doc_id": 1, "grp": None}, {"doc_id": 2, "grp": "a"}],
        ts_ms=1000,
    )
    w.equality_delete([{"grp": None}], field_ids=[2], ts_ms=2000)
    got = sorted(
        r.doc_id for r in read_iceberg(spark, str(tmp_path / "nl")).collect()
    )
    assert got == [2]


def test_position_delete_applies_at_equal_sequence(spark, tmp_path):
    # spec: position deletes apply to data files with data_seq <= the
    # delete's — a later position delete still hits earlier data, and
    # data appended AFTER the delete is untouched even at same path
    # positions.
    w = IcebergFixtureWriter(str(tmp_path / "pq"), _FIELDS)
    w.append([{"doc_id": i, "grp": "a"} for i in range(4)], ts_ms=1000)
    first = os.path.join(str(tmp_path / "pq"), "data",
                         "data-00001.parquet")
    w.position_delete([(first, 1)], ts_ms=2000)             # seq 2
    w.append([{"doc_id": 9, "grp": "a"}], ts_ms=3000)       # seq 3: new
    # file also has a row at pos 1? no — single row at pos 0; the
    # point is the delete's (file_path, pos) targets only `first`.
    got = sorted(
        r.doc_id for r in read_iceberg(spark, str(tmp_path / "pq")).collect()
    )
    assert got == [0, 2, 3, 9]


def test_avro_manifest_roundtrip_schema():
    # the fixture writer's manifests decode through the same avro
    # codec with unions, nested records, arrays, and maps intact
    from kafka_delta_ingest_spark.avro_python import (
        read_container,
        write_container,
    )
    from kafka_delta_ingest_spark.iceberg import _MANIFEST_ENTRY_SCHEMA

    entry = {
        "status": 1,
        "snapshot_id": 7,
        "sequence_number": 3,
        "data_file": {
            "content": 2,
            "file_path": "/x.parquet",
            "file_format": "PARQUET",
            "partition": {"bucket": "p0", "n": 3},
            "record_count": 5,
            "file_size_in_bytes": 100,
            "equality_ids": [2, 3],
        },
    }
    blob = write_container([entry], _MANIFEST_ENTRY_SCHEMA)
    _, out = read_container(blob)
    assert out[0]["data_file"]["equality_ids"] == [2, 3]
    assert out[0]["data_file"]["partition"]["bucket"] == "p0"
    assert out[0]["data_file"]["partition"]["n"] == 3


def test_iceberg_writer_append_roundtrip(spark, tmp_path):
    # the production-shape writer's output reads back through the
    # independent metadata walk, including time travel
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    t = str(tmp_path / "w")
    w = IcebergWriter(t, _FIELDS)
    df1 = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("grp")
    )
    df2 = spark.range(5, 8).select(
        F.col("id").alias("doc_id"), F.lit("b").alias("grp")
    )
    s1 = w.append(df1, ts_ms=1000)
    s2 = w.append(df2, ts_ms=2000)
    assert sorted(
        r.doc_id for r in read_iceberg(spark, t).collect()
    ) == list(range(8))
    assert read_iceberg(spark, t, snapshot_id=s1).count() == 5
    assert read_iceberg(spark, t, as_of_timestamp_ms=1500).count() == 5
    # commit shape: the second snapshot's manifest list carries the
    # FIRST manifest forward plus one new manifest — O(new files)
    from kafka_delta_ingest_spark.avro_python import read_container
    from kafka_delta_ingest_spark.iceberg import load_metadata

    meta = load_metadata(t)
    snap2 = [s for s in meta["snapshots"] if s["snapshot-id"] == s2][0]
    with open(snap2["manifest-list"], "rb") as f:
        _, manifests = read_container(f.read())
    assert len(manifests) == 2
    assert manifests[0]["sequence_number"] == 1
    assert manifests[1]["sequence_number"] == 2
    # sequence numbers flow to the plan
    d, p, e, _ = plan_files(t)
    seqs = sorted(seq for _, seq in d)
    assert seqs == [1] * 5 + [2] * 3 or set(seqs) == {1, 2}


def test_iceberg_writer_version_race_retries(spark, tmp_path):
    # claim v2 before the writer commits its second append: the
    # O_EXCL claim must fail, the writer must re-read and land at v3
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.iceberg import IcebergWriter, snapshots

    t = str(tmp_path / "r")
    w = IcebergWriter(t, _FIELDS)
    w.append(
        spark.range(3).select(
            F.col("id").alias("doc_id"), F.lit("a").alias("grp")
        ),
        ts_ms=1000,
    )
    # a racing writer claims v2 with the same content as v1
    meta_dir = _os.path.join(t, "metadata")
    with open(_os.path.join(meta_dir, "v1.metadata.json")) as f:
        racing = _json.load(f)
    with open(_os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        _json.dump(racing, f)
    w.append(
        spark.range(3, 5).select(
            F.col("id").alias("doc_id"), F.lit("b").alias("grp")
        ),
        ts_ms=2000,
    )
    assert _os.path.exists(_os.path.join(meta_dir, "v3.metadata.json"))
    assert read_iceberg(spark, t).count() == 5
    assert len(snapshots(t)) == 2


def test_iceberg_writer_delete_where(spark, tmp_path):
    # row-level DELETE as a position-delete snapshot: no data file
    # rewritten, reader applies it with sequence scoping
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    t = str(tmp_path / "dw")
    w = IcebergWriter(t, _FIELDS)
    w.append(
        spark.range(10).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("string").alias("grp"),
        ),
        ts_ms=1000,
    )
    w.delete_where(spark, "doc_id % 3 = 0", ts_ms=2000)
    got = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(10) if i % 3 != 0]
    # repeated delete on the live view: already-deleted rows are not
    # re-tombstoned; new matches still land
    w.delete_where(spark, "doc_id % 2 = 0", ts_ms=3000)
    got = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    assert got == [1, 5, 7]
    # a no-match delete is a no-op (no new snapshot)
    n_before = len(snapshots(t))
    w.delete_where(spark, "doc_id > 999", ts_ms=4000)
    assert len(snapshots(t)) == n_before
    # data appended AFTER the deletes is untouched by them (sequence
    # scoping), even when it matches the old predicates
    w.append(
        spark.range(100, 103).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("grp")
        ),
        ts_ms=5000,
    )
    got = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    assert got == [1, 5, 7, 100, 101, 102]


def test_iceberg_writer_upsert(spark, tmp_path):
    # one snapshot = equality-delete manifest (incoming keys) + data
    # manifest (incoming rows); sequence scoping keeps the same-commit
    # inserts alive while masking every prior key version.
    # The equality-delete key file is written executor-side via the
    # delete_where staging-promote shape — driver memory is O(1) in
    # the batch key count, not O(distinct incoming keys).
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    t = str(tmp_path / "up")
    w = IcebergWriter(t, _FIELDS)
    w.append(
        spark.range(6).select(
            F.col("id").alias("doc_id"), F.lit("v1").alias("grp")
        ),
        ts_ms=1000,
    )
    # upsert: update 2 and 4, insert 100
    w.upsert(
        spark.createDataFrame(
            [(2, "v2"), (4, "v2"), (100, "v2")], "doc_id long, grp string"
        ),
        key_cols=["doc_id"],
        ts_ms=2000,
    )
    got = {r.doc_id: r.grp for r in read_iceberg(spark, t).collect()}
    assert got == {0: "v1", 1: "v1", 2: "v2", 3: "v1", 4: "v2",
                   5: "v1", 100: "v2"}
    # a second upsert of the SAME key wins again (stacked eq deletes)
    w.upsert(
        spark.createDataFrame([(2, "v3")], "doc_id long, grp string"),
        key_cols=["doc_id"],
        ts_ms=3000,
    )
    got = {r.doc_id: r.grp for r in read_iceberg(spark, t).collect()}
    assert got[2] == "v3" and got[4] == "v2"
    with pytest.raises(ValueError, match="unknown key"):
        w.upsert(
            spark.createDataFrame([(1, "x")], "doc_id long, grp string"),
            key_cols=["nope"],
        )


def test_iceberg_writer_identity_partitioned_roundtrip(spark, tmp_path):
    """r8: identity-partitioned writes — spec fields in metadata, hive
    layout under data/, typed partition values in manifest entries,
    plan-time pruning, typed reconstruction on read (including a
    digit-leading string partition value that must NOT be inferred
    into an int)."""
    from kafka_delta_ingest_spark.avro_python import read_container
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        load_metadata,
        read_iceberg,
    )

    t = str(tmp_path / "pw")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "lang", "type": "string", "required": False},
        {"id": 3, "name": "bucket", "type": "long", "required": False},
    ]
    w = IcebergWriter(t, fields, partition_by=["lang", "bucket"])
    df = spark.range(12).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en")
        .otherwise("0123")  # leading zero: stays a STRING
        .alias("lang"),
        (F.col("id") % 3).alias("bucket"),
    )
    w.append(df, ts_ms=1000)
    meta = load_metadata(t)
    assert [
        (f["name"], f["transform"], f["source-id"])
        for f in meta["partition-specs"][0]["fields"]
    ] == [("lang", "identity", 2), ("bucket", "identity", 3)]
    # manifest entries carry TYPED partition values
    snap = meta["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as f:
        _, manifests = read_container(f.read())
    with open(manifests[0]["manifest_path"], "rb") as f:
        _, entries = read_container(f.read())
    parts = {tuple(sorted(e["data_file"]["partition"].items()))
             for e in entries}
    assert (("bucket", 0), ("lang", "en")) in parts
    assert (("bucket", 1), ("lang", "0123")) in parts
    back = read_iceberg(spark, t)
    assert dict(back.dtypes)["bucket"] == "bigint"
    assert dict(back.dtypes)["lang"] == "string"
    got = sorted(
        (r.doc_id, r.lang, r.bucket) for r in back.collect()
    )
    assert got == [
        (i, "en" if i % 2 == 0 else "0123", i % 3) for i in range(12)
    ]
    # plan-time partition pruning: only matching data files are read
    en_only = read_iceberg(
        spark, t, partition_filter=lambda p: p.get("lang") == "en"
    )
    assert sorted(r.doc_id for r in en_only.collect()) == [
        i for i in range(12) if i % 2 == 0
    ]
    assert all("lang=en" in f for f in en_only.inputFiles())


def test_iceberg_writer_partitioned_delete_where(spark, tmp_path):
    """Row-level MoR deletes on an identity-partitioned table: the
    position-delete file is spec-global (never pruned) and the live
    view stays exact."""
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        read_iceberg,
    )

    t = str(tmp_path / "pd")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "lang", "type": "string", "required": False},
    ]
    w = IcebergWriter(t, fields, partition_by=["lang"])
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    w.append(df, ts_ms=1000)
    w.delete_where(spark, "doc_id % 3 = 0", ts_ms=2000)
    got = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(10) if i % 3 != 0]
    # pruning keeps the delete in scope: 'fr' rows %3 stay deleted
    fr = read_iceberg(
        spark, t, partition_filter=lambda p: p.get("lang") == "fr"
    )
    assert sorted(r.doc_id for r in fr.collect()) == [1, 5, 7]


def test_iceberg_writer_optimize_compacts_and_materializes_deletes(
    spark, tmp_path
):
    """r8 (closes the r7 seam): optimize() bin-packs small data files
    into one ``replace`` snapshot — compacted inputs leave the plan,
    surviving files keep their ORIGINAL sequence numbers (older
    equality deletes still scope over them), position/equality deletes
    touching the inputs are MATERIALIZED into the rewritten output,
    and the live view is row-identical before and after."""
    from kafka_delta_ingest_spark.avro_python import read_container
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        load_metadata,
        plan_files,
        read_iceberg,
    )

    t = str(tmp_path / "opt")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "grp", "type": "string", "required": False},
    ]
    w = IcebergWriter(t, fields)
    mk = lambda lo, n: spark.range(lo, lo + n).select(  # noqa: E731
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("grp"),
    )
    w.append(mk(0, 5).coalesce(1), ts_ms=1000)
    w.append(mk(5, 5).coalesce(1), ts_ms=2000)
    w.append(mk(10, 5).coalesce(1), ts_ms=3000)
    w.delete_where(spark, "doc_id % 4 = 0", ts_ms=4000)  # MoR delete
    before = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    n_files_before = len(plan_files(t)[0])
    snap = w.optimize(spark)  # everything is tiny -> one output file
    after = sorted(r.doc_id for r in read_iceberg(spark, t).collect())
    assert after == before  # row-identical live view
    data_files, pos_del, _eq, meta = plan_files(t)
    assert len(data_files) == 1 < n_files_before
    # the compacted output's sequence number is NEWER than the delete's
    out_seq = data_files[0][1]
    assert all(out_seq > dseq for _p, dseq in pos_del)
    # operation recorded as replace
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert cur["summary"]["operation"] == "replace"
    assert snap == meta["current-snapshot-id"]
    # deleted rows stay deleted (materialized, not resurrected)
    assert all(d % 4 != 0 for d in after)
    # time travel to the pre-compaction snapshot still works
    assert sorted(
        r.doc_id
        for r in read_iceberg(spark, t, as_of_timestamp_ms=3500).collect()
    ) == list(range(15))


def test_iceberg_optimize_partitioned_and_noop(spark, tmp_path):
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        plan_files,
        read_iceberg,
    )

    t = str(tmp_path / "optp")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "lang", "type": "string", "required": False},
    ]
    w = IcebergWriter(t, fields, partition_by=["lang"])
    df = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    w.append(df, ts_ms=1000)
    w.append(df.withColumn("doc_id", F.col("doc_id") + 100), ts_ms=2000)
    w.optimize(spark)
    data_files, _, _, _ = plan_files(t)
    # one compacted file per partition
    assert len(data_files) == 2
    got = sorted(
        (r.doc_id, r.lang) for r in read_iceberg(spark, t).collect()
    )
    assert got == sorted(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(8)]
        + [(i + 100, "en" if i % 2 == 0 else "fr") for i in range(8)]
    )
    # second optimize: single file per partition -> no-op, same snapshot
    cur = w._current()[1]["current-snapshot-id"]
    assert w.optimize(spark) == cur


def test_murmur3_spec_vectors():
    # the Iceberg spec appendix's own bucket-hash test vectors
    import struct as _struct

    from kafka_delta_ingest_spark.iceberg import (
        iceberg_bucket,
        murmur3_32,
    )

    def i32(u):
        return u - (1 << 32) if u >= (1 << 31) else u

    assert i32(murmur3_32(_struct.pack("<q", 34))) == 2017239379
    assert i32(murmur3_32("iceberg".encode())) == 1210000089
    assert iceberg_bucket(34, 16) == 2017239379 % 16
    assert iceberg_bucket("iceberg", 16) == 1210000089 % 16
    assert iceberg_bucket(None, 16) is None


def test_iceberg_hidden_partitioning_bucket_truncate_day(
    spark, tmp_path
):
    """r8: HIDDEN partitioning in the writer — bucket (spec murmur3),
    truncate, and day transforms land as spec fields with transform
    strings, data files keep the SOURCE columns, manifest entries
    carry the transformed values (plan-time pruning on them), and a
    spec-less second writer adopts the declared transforms."""
    import datetime

    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        iceberg_bucket,
        load_metadata,
        read_iceberg,
    )

    t = str(tmp_path / "hp")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "lang", "type": "string", "required": False},
        {"id": 3, "name": "ts", "type": "timestamp", "required": False},
    ]
    w = IcebergWriter(
        t, fields,
        partition_by=["bucket(4, doc_id)", "truncate(2, lang)",
                      "day(ts)"],
    )
    rows = [
        (i, ["english", "french", "german"][i % 3],
         datetime.datetime(2024, 1, 1 + i % 2, 12, 0, 0))
        for i in range(24)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, ts timestamp_ntz"
    )
    w.append(df, ts_ms=1000)
    meta = load_metadata(t)
    assert [
        (f["name"], f["transform"])
        for f in meta["partition-specs"][0]["fields"]
    ] == [
        ("doc_id_bucket", "bucket[4]"),
        ("lang_trunc", "truncate[2]"),
        ("ts_day", "day"),
    ]
    # data files keep the source columns; rows roundtrip exactly
    back = read_iceberg(spark, t)
    got = sorted((r.doc_id, r.lang, r.ts) for r in back.collect())
    assert got == sorted(rows)
    # manifest partition values == spec-defined transform outputs
    from kafka_delta_ingest_spark.avro_python import read_container

    snap = meta["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as f:
        _, manifests = read_container(f.read())
    with open(manifests[0]["manifest_path"], "rb") as f:
        _, entries = read_container(f.read())
    epoch_day = (datetime.date(2024, 1, 1)
                 - datetime.date(1970, 1, 1)).days
    for e in entries:
        p = e["data_file"]["partition"]
        assert p["doc_id_bucket"] in {
            iceberg_bucket(i, 4) for i in range(24)
        }
        assert p["lang_trunc"] in {"en", "fr", "ge"}
        assert p["ts_day"] in (epoch_day, epoch_day + 1)
    # plan-time pruning on the HIDDEN values
    b0 = read_iceberg(
        spark, t,
        partition_filter=lambda p: p.get("doc_id_bucket") == 0,
    )
    expect_b0 = sorted(
        i for i in range(24) if iceberg_bucket(i, 4) == 0
    )
    assert sorted(r.doc_id for r in b0.collect()) == expect_b0
    assert len(b0.inputFiles()) < len(back.inputFiles())
    # a spec-less writer instance adopts the declared transforms
    w2 = IcebergWriter(t, fields)
    w2.append(
        spark.createDataFrame(
            [(100, "english",
              datetime.datetime(2024, 1, 1, 1, 0, 0))],
            "doc_id long, lang string, ts timestamp_ntz",
        ),
        ts_ms=2000,
    )
    assert read_iceberg(spark, t).count() == 25
    meta2 = load_metadata(t)
    assert meta2["partition-specs"][0]["fields"][0]["transform"] == (
        "bucket[4]"
    )


# ---------------------------------------------------------------------------
# incremental scan (snapshot diff)


def test_incremental_returns_only_added_files(spark, tmp_path):
    from kafka_delta_ingest_spark.iceberg import (
        read_iceberg_incremental,
    )

    t = str(tmp_path / "inc")
    w = IcebergFixtureWriter(t, _FIELDS)
    s1 = w.append(
        [{"doc_id": i, "grp": "a"} for i in range(5)], ts_ms=1000
    )
    s2 = w.append(
        [{"doc_id": i, "grp": "b"} for i in range(5, 8)], ts_ms=2000
    )
    s3 = w.append(
        [{"doc_id": i, "grp": "c"} for i in range(8, 12)], ts_ms=3000
    )
    inc = read_iceberg_incremental(spark, t, s1)
    assert sorted(r.doc_id for r in inc.collect()) == list(range(5, 12))
    # pruning: ONLY the two added data files are in the scan
    full = read_iceberg(spark, t)
    assert len(inc.inputFiles()) == 2
    assert len(full.inputFiles()) == 3
    # sub-window (s1, s2]
    mid = read_iceberg_incremental(spark, t, s1, to_snapshot_id=s2)
    assert sorted(r.doc_id for r in mid.collect()) == [5, 6, 7]
    # empty window
    assert read_iceberg_incremental(spark, t, s3).count() == 0


def test_incremental_gates_and_live_view(spark, tmp_path):
    from kafka_delta_ingest_spark.iceberg import (
        read_iceberg_incremental,
    )

    t = str(tmp_path / "incd")
    w = IcebergFixtureWriter(t, _FIELDS)
    s1 = w.append(
        [{"doc_id": i, "grp": "a"} for i in range(4)], ts_ms=1000
    )
    w.append([{"doc_id": i, "grp": "b"} for i in range(4, 8)], ts_ms=2000)
    w.equality_delete([{"grp": "b"}], field_ids=[2], ts_ms=3000)
    # strict (Spark's default): a delete snapshot in the window raises
    with pytest.raises(ValueError, match="non-append"):
        read_iceberg_incremental(spark, t, s1)
    # live view: the added files, with the delete applied
    live = read_iceberg_incremental(
        spark, t, s1, strict_append_only=False
    )
    assert live.count() == 0  # every added row was grp='b'
    # unknown / non-ancestor snapshots raise
    with pytest.raises(ValueError, match="not found"):
        read_iceberg_incremental(spark, t, 999999)


def test_vectorized_string_murmur_matches_scalar():
    """r9 (r8 advice #3): the batched string-bucket hash must equal
    the scalar spec implementation byte-for-byte — unicode,
    empty, all tail lengths, and long strings."""
    import numpy as np

    from kafka_delta_ingest_spark.iceberg import (
        _murmur3_32_utf8,
        iceberg_bucket,
        murmur3_32,
    )

    vals = [
        "", "a", "ab", "abc", "abcd", "abcde",
        "iceberg", "iceéberg", "日本語",
        "x" * 37, "y" * 128, "mixed üñî 123",
    ]
    enc = [v.encode("utf-8") for v in vals]
    got = _murmur3_32_utf8(enc)
    want = np.array(
        [murmur3_32(b) & 0xFFFFFFFF for b in enc], dtype=np.uint32
    )
    assert (got == want).all()
    # and the bucket law holds end to end
    for v, h in zip(vals, got):
        assert int(h & np.uint32(0x7FFFFFFF)) % 16 == iceberg_bucket(
            v, 16
        )


def test_vectorized_string_murmur_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from kafka_delta_ingest_spark.iceberg import (
        _murmur3_32_utf8,
        murmur3_32,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(max_size=64), min_size=1, max_size=40))
    def check(texts):
        enc = [t.encode("utf-8") for t in texts]
        got = _murmur3_32_utf8(enc)
        want = np.array(
            [murmur3_32(b) & 0xFFFFFFFF for b in enc],
            dtype=np.uint32,
        )
        assert (got == want).all()

    check()


# ---------------------------------------------------------------------------
# expire_snapshots (table service)


def _ice_writer(spark, tmp_path, name):
    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "grp", "type": "string", "required": False},
    ]
    t = str(tmp_path / name)
    w = IcebergWriter(t, fields)
    df = spark.createDataFrame(
        [(i, "a") for i in range(6)], "doc_id long, grp string"
    )
    return t, w, df


def test_expire_reclaims_compacted_files(spark, tmp_path):
    from kafka_delta_ingest_spark.iceberg import (
        read_iceberg,
        snapshots,
    )

    t, w, df = _ice_writer(spark, tmp_path, "exp")
    w.append(df.coalesce(1), ts_ms=1000)
    w.append(df.coalesce(1), ts_ms=2000)
    w.optimize(spark, ts_ms=3000)  # rewrites both small files
    n_data_before = len(os.listdir(os.path.join(t, "data")))
    assert read_iceberg(spark, t).count() == 12
    deleted = w.expire_snapshots(older_than_ms=2500)
    # the two pre-compaction snapshots are gone; their exclusive
    # data files are physically reclaimed
    assert len(snapshots(t)) == 1
    assert any(p.endswith(".parquet") and "/data/" in p for p in deleted)
    assert len(os.listdir(os.path.join(t, "data"))) < n_data_before
    # the live view is untouched
    assert read_iceberg(spark, t).count() == 12
    # time travel to expired history raises
    with pytest.raises(ValueError):
        read_iceberg(spark, t, as_of_timestamp_ms=1500)


def test_expire_pure_append_deletes_no_data(spark, tmp_path):
    from kafka_delta_ingest_spark.iceberg import (
        read_iceberg,
        snapshots,
    )

    t, w, df = _ice_writer(spark, tmp_path, "expa")
    w.append(df.coalesce(1), ts_ms=1000)
    w.append(df.coalesce(1), ts_ms=2000)
    w.append(df.coalesce(1), ts_ms=3000)
    deleted = w.expire_snapshots(older_than_ms=2500)
    # appends carry manifests forward: every data file is still
    # referenced by the kept snapshot — only metadata reclaims
    assert not any("/data/" in p for p in deleted)
    assert len(snapshots(t)) == 1
    assert read_iceberg(spark, t).count() == 18


def test_expire_noop_when_nothing_qualifies(spark, tmp_path):
    t, w, df = _ice_writer(spark, tmp_path, "expn")
    w.append(df.coalesce(1), ts_ms=1000)
    assert w.expire_snapshots(older_than_ms=500) == []


def test_iceberg_hidden_partitioning_month_year_hour(spark, tmp_path):
    """r9: the remaining time transforms — month (months from
    1970-01), year (years from 1970), hour (hours from epoch) — land
    as spec fields with transform strings and spec-exact manifest
    partition values; rows roundtrip with source columns intact."""
    import datetime

    from kafka_delta_ingest_spark.avro_python import read_container
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        load_metadata,
        read_iceberg,
    )

    t = str(tmp_path / "hp2")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "ts", "type": "timestamp", "required": False},
    ]
    w = IcebergWriter(
        t, fields, partition_by=["month(ts)", "year(ts)", "hour(ts)"]
    )
    rows = [
        (0, datetime.datetime(1970, 1, 1, 0, 0, 0)),
        (1, datetime.datetime(1970, 2, 1, 5, 0, 0)),
        (2, datetime.datetime(2024, 3, 15, 7, 30, 0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp_ntz")
    w.append(df, ts_ms=1000)
    meta = load_metadata(t)
    assert [
        (f["name"], f["transform"])
        for f in meta["partition-specs"][0]["fields"]
    ] == [("ts_month", "month"), ("ts_year", "year"),
          ("ts_hour", "hour")]
    back = read_iceberg(spark, t)
    assert sorted((r.doc_id, r.ts) for r in back.collect()) == rows
    snap = meta["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as f:
        _, manifests = read_container(f.read())
    vals = {}
    for m in manifests:
        with open(m["manifest_path"], "rb") as f:
            _, entries = read_container(f.read())
        for e in entries:
            p = e["data_file"]["partition"]
            vals[(p["ts_month"], p["ts_year"], p["ts_hour"])] = True
    # spec-exact: 1970-01-01T00 -> (0,0,0); 1970-02-01T05 ->
    # (1,0,31*24+5); 2024-03-15T07:30 -> (650, 54, hours from epoch)
    h3 = int(datetime.datetime(
        2024, 3, 15, 7, tzinfo=datetime.timezone.utc
    ).timestamp() // 3600)
    assert set(vals) == {(0, 0, 0), (1, 0, 31 * 24 + 5),
                         ((2024 - 1970) * 12 + 2, 54, h3)}
    # a spec-less writer instance adopts the declared transforms
    w2 = IcebergWriter(t, fields)
    w2.append(
        spark.createDataFrame(
            [(3, datetime.datetime(2024, 3, 15, 9, 0, 0))],
            "doc_id long, ts timestamp_ntz",
        ),
        ts_ms=2000,
    )
    assert read_iceberg(spark, t).count() == 4


def test_mixed_era_partition_value_representation(
    spark, tmp_path, monkeypatch
):
    """r12 (advice): typed_partition_value (r11) changed the manifest
    representation of float/boolean identity partition values from
    string to typed FOR NEW APPENDS ONLY — a pre-r11 table with such
    partitions holds both eras across its manifests. plan_files now
    normalizes every decoded tuple through typed_partition_value at
    plan time, so a partition_filter like pv['flag'] is True keeps
    files from BOTH eras instead of silently pruning the old ones."""
    import kafka_delta_ingest_spark.iceberg as ice
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        plan_files,
        read_iceberg,
    )

    t = str(tmp_path / "mixed_era")
    fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "ratio", "type": "double", "required": False},
        {"id": 3, "name": "flag", "type": "boolean", "required": False},
    ]
    w = IcebergWriter(t, fields, partition_by=["ratio", "flag"])

    def df(lo):
        return spark.range(lo, lo + 8).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, 1.5).otherwise(2.5)
            .alias("ratio"),
            (F.col("id") % 2 == 0).alias("flag"),
        )

    # era 1: pre-r11 writer stamped raw hive-directory STRINGS
    monkeypatch.setattr(
        ice, "typed_partition_value", lambda v, _t: v
    )
    w.append(df(0), ts_ms=1000)
    monkeypatch.undo()
    # era 2: current writer stamps TYPED values
    w.append(df(100), ts_ms=2000)

    # raw manifests really do hold both representations
    raw = set()
    _, _, _, meta = plan_files(t)
    snap = meta["snapshots"][-1]
    with open(snap["manifest-list"], "rb") as f:
        _, manifests = ice.read_container(f.read())
    for m in manifests:
        with open(m["manifest_path"], "rb") as f:
            _, entries = ice.read_container(f.read())
        for e in entries:
            raw.add(type(e["data_file"]["partition"]["flag"]).__name__)
    assert raw == {"str", "bool"}

    # the filter sees ONE typed representation for both eras
    seen = []
    data_files, _, _, _ = plan_files(
        t,
        partition_filter=lambda pv: seen.append(dict(pv))
        or (pv["flag"] is True and pv["ratio"] == 1.5),
    )
    assert all(
        isinstance(pv["flag"], bool) and isinstance(pv["ratio"], float)
        for pv in seen
    )
    # both eras' matching files kept: era-1 and era-2 even doc_ids
    got = sorted(
        r.doc_id
        for r in read_iceberg(
            spark, t,
            partition_filter=lambda pv: pv["flag"] is True,
        ).collect()
    )
    assert got == [0, 2, 4, 6, 100, 102, 104, 106]
