"""Regression pins for the round-8 advisor findings (ADVICE.md r8).

Each test reproduces a defect that existed before the r9 fix:

1. HIGH — ``DeltaStandardWriter.optimize()`` read compaction inputs
   via bare ``spark.read.parquet(*paths)``: on a table widened by
   ``evolve_schema()`` Spark samples ONE footer, and when it samples
   an old-schema file the evolved column silently vanishes from the
   rewritten files while the originals are tombstoned — permanent
   data loss. The zorder path rewrites EVERY live file, maximizing
   exposure. Fixed: inputs read under an explicit schema derived
   from ``metaData.schemaString`` (non-partition fields).
2. MEDIUM — ``HudiCowWriter.cluster()`` had the same defect while
   the CoW sink accepts per-batch drift; fixed with
   ``mergeSchema=true`` (the sink has no canonical schema).
3. LOW — ``delete_where()`` wrote CDF parquet into ``_change_data/``
   before the conflict check, orphaning files on abort, and nothing
   ever reclaimed ``_change_data``. Fixed: abort cleans its own cdc
   files; ``vacuum()`` ages out cdc on the retention clock.
"""

import json
import os

from pyspark.sql import functions as F


def _docs(spark, n=12, lo=0):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") * 10).alias("val"),
    )


def test_optimize_preserves_evolved_column(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField

    from kafka_delta_ingest_spark.delta_standard import (
        DeltaStandardWriter,
        read_delta,
    )

    t = str(tmp_path / "evopt")
    w = DeltaStandardWriter(t)
    # many old-schema files first: footer sampling is overwhelmingly
    # likely to pick one of them
    for i in range(4):
        w.write(_docs(spark, n=3, lo=i * 3).coalesce(1))
    from pyspark.sql.types import StructType

    stored = StructType.fromJson(
        json.loads(w._py_replay()["meta"]["schemaString"])
    )
    evolved = StructType(
        list(stored.fields) + [StructField("score", LongType())]
    )
    w.evolve_schema(evolved)
    w.write(
        _docs(spark, n=5, lo=100)
        .withColumn("score", F.col("doc_id") * 7)
        .coalesce(1)
    )
    before = read_delta(spark, t)
    assert before.filter("score IS NOT NULL").count() == 5
    w.optimize(spark, target_file_bytes=1 << 20)
    after = read_delta(spark, t)
    assert "score" in after.columns
    assert after.count() == 17
    got = {
        r.doc_id: r.score
        for r in after.filter("score IS NOT NULL").collect()
    }
    assert got == {d: d * 7 for d in range(100, 105)}


def test_optimize_zorder_preserves_evolved_column(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField

    from kafka_delta_ingest_spark.delta_standard import (
        DeltaStandardWriter,
        read_delta,
    )

    t = str(tmp_path / "evz")
    w = DeltaStandardWriter(t)
    for i in range(4):
        w.write(_docs(spark, n=3, lo=i * 3).coalesce(1))
    from pyspark.sql.types import StructType

    stored = StructType.fromJson(
        json.loads(w._py_replay()["meta"]["schemaString"])
    )
    evolved = StructType(
        list(stored.fields) + [StructField("score", LongType())]
    )
    w.evolve_schema(evolved)
    w.write(
        _docs(spark, n=5, lo=100)
        .withColumn("score", F.col("doc_id") * 7)
        .coalesce(1)
    )
    w.optimize(spark, target_file_bytes=1 << 20, zorder_by=["doc_id"])
    after = read_delta(spark, t)
    assert after.count() == 17
    assert after.filter("score IS NOT NULL").count() == 5
    assert after.agg(F.sum("score")).collect()[0][0] == sum(
        d * 7 for d in range(100, 105)
    )


def test_hudi_cluster_merges_heterogeneous_schemas(spark, tmp_path):
    from kafka_delta_ingest_spark.hudi import HudiCowWriter, read_hudi

    t = str(tmp_path / "hcl")
    w = HudiCowWriter(t)
    w.insert_batch(_docs(spark, n=4).coalesce(1))
    w.insert_batch(
        _docs(spark, n=4, lo=10)
        .withColumn("score", F.col("doc_id") * 3)
        .coalesce(1)
    )
    assert read_hudi(spark, t).filter("score IS NOT NULL").count() == 4
    instant = w.cluster(spark, target_file_bytes=1 << 20)
    assert instant is not None
    after = read_hudi(spark, t)
    assert after.count() == 8
    got = {
        r.doc_id: r.score
        for r in after.filter("score IS NOT NULL").collect()
    }
    assert got == {d: d * 3 for d in range(10, 14)}


def test_delete_where_conflict_cleans_cdc(spark, tmp_path, monkeypatch):
    import pytest

    import kafka_delta_ingest_spark.roaring as roaring
    from kafka_delta_ingest_spark.delta_standard import (
        ConcurrentDeltaWriteError,
        DeltaStandardWriter,
    )

    t = str(tmp_path / "cdcabort")
    w = DeltaStandardWriter(t, enable_cdf=True)
    w.write(_docs(spark).coalesce(1))

    real = roaring.write_dv_file
    fired = {"done": False}

    def wrapper(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            monkeypatch.undo()
            # racer DV-deletes from the same file -> our commit conflicts
            DeltaStandardWriter(t).delete_where(spark, "doc_id = 1")
        return real(*a, **k)

    monkeypatch.setattr(roaring, "write_dv_file", wrapper)
    with pytest.raises(ConcurrentDeltaWriteError):
        w.delete_where(spark, "doc_id = 2")
    # every surviving _change_data file is referenced by a committed
    # cdc action — the aborted delete left no orphan
    referenced = set()
    log = os.path.join(t, "_delta_log")
    for fname in os.listdir(log):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(log, fname)) as f:
            for line in f:
                act = json.loads(line)
                if "cdc" in act:
                    referenced.add(act["cdc"]["path"])
    cd = os.path.join(t, "_change_data")
    on_disk = {
        f"_change_data/{f}" for f in os.listdir(cd)
    } if os.path.isdir(cd) else set()
    assert on_disk == referenced
    assert referenced  # the racer's own CDF files did land


def test_vacuum_reclaims_aged_change_data(spark, tmp_path):
    from kafka_delta_ingest_spark.delta_standard import (
        DeltaStandardWriter,
        read_delta,
    )

    t = str(tmp_path / "cdcvac")
    w = DeltaStandardWriter(t, enable_cdf=True)
    w.write(_docs(spark).coalesce(1))
    w.delete_where(spark, "doc_id = 3")
    cd = os.path.join(t, "_change_data")
    assert os.listdir(cd)
    # inside the retention window: kept
    assert not any(
        d.startswith("_change_data/") for d in w.vacuum()
    )
    assert os.listdir(cd)
    # aged past retention: reclaimed (same clock as data tombstones)
    future = int(os.path.getmtime(os.path.join(t, "_delta_log")) * 1000)
    deleted = w.vacuum(retention_ms=0, now_ms=future + 10**10)
    assert any(d.startswith("_change_data/") for d in deleted)
    assert not os.listdir(cd)
    # live rows unaffected
    assert read_delta(spark, t).count() == 11
