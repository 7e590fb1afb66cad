"""Metadata-only Delta -> Iceberg conversion (convert.py): the
XTable / UniForm capability — one Iceberg snapshot referencing the
Delta table's live parquet files in place, zero data bytes
rewritten."""

import os

import pytest

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.convert import convert_delta_to_iceberg
from kafka_delta_ingest_spark.delta_standard import (
    DeltaStandardWriter,
    read_delta,
)
from kafka_delta_ingest_spark.iceberg import read_iceberg


def _docs(spark, n=40, lo=0):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )


def test_convert_reads_identically_and_rewrites_nothing(
    spark, tmp_path
):
    t = str(tmp_path / "delta")
    ice = str(tmp_path / "ice")
    w = DeltaStandardWriter(t)
    w.write(_docs(spark, 40).repartition(4))
    w.write(_docs(spark, 20, lo=100).repartition(2))  # second commit
    # churn: an UPDATE rewrites some files (remove+add in the log) so
    # the LIVE set differs from everything-ever-written
    w.update_where(spark, "doc_id % 10 = 0", {"val": "val + 1000"})

    before = {
        p: os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(t)
        for p in fs
        if p.endswith(".parquet")
    }
    v = convert_delta_to_iceberg(spark, t, ice, ts_ms=1000)
    assert v >= 1
    # no data file was rewritten or added
    after = {
        p: os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(t)
        for p in fs
        if p.endswith(".parquet")
    }
    assert after == before
    assert not os.path.isdir(os.path.join(ice, "data")) or not any(
        f.endswith(".parquet")
        for f in os.listdir(os.path.join(ice, "data"))
    )

    d = read_delta(spark, t).select("doc_id", "grp", "val")
    i = read_iceberg(spark, ice).select("doc_id", "grp", "val")
    assert i.exceptAll(d).count() == 0 and d.exceptAll(i).count() == 0
    assert i.count() == 60
    got = {r.doc_id: r.val for r in i.collect()}
    assert got[0] == 1000.0 and got[3] == 4.5  # update visible


def test_convert_is_a_real_iceberg_table(spark, tmp_path):
    """The converted metadata must behave like any Iceberg table:
    follow-up appends commit on top, and the snapshot carries
    footer-derived column metrics for data skipping."""
    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    t = str(tmp_path / "delta")
    ice = str(tmp_path / "ice")
    w = DeltaStandardWriter(t)
    w.write(_docs(spark, 30))
    convert_delta_to_iceberg(spark, t, ice, ts_ms=1000)

    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "string"},
        {"id": 3, "name": "val", "required": False, "type": "double"},
    ]
    w2 = IcebergWriter(ice, fields)
    w2.append(_docs(spark, 5, lo=500), ts_ms=2000)
    assert read_iceberg(spark, ice).count() == 35
    # bounds-based skipping: a row_filter outside every file's range
    # plans zero data files
    with pytest.raises(ValueError, match="no data files"):
        read_iceberg(
            spark, ice, row_filter=[("doc_id", ">", 10_000)]
        )


def test_convert_refuses_deletion_vectors(spark, tmp_path):
    t = str(tmp_path / "delta")
    w = DeltaStandardWriter(t)
    w.write(_docs(spark, 30))
    w.delete_where(spark, "doc_id % 3 = 0")  # writes a DV
    with pytest.raises(ValueError, match="deletion vector"):
        convert_delta_to_iceberg(spark, t, str(tmp_path / "ice"))


def test_convert_partitioned_delta_identity_fallback(
    spark, tmp_path
):
    """Hive-layout Delta drops partition columns from the data pages;
    the converted Iceberg table serves them from the manifest
    partition tuple (the spec's identity-from-metadata rule,
    read_iceberg._reattach_identity_partitions) — correct values,
    correct TYPE, and manifest-level partition pruning."""
    t = str(tmp_path / "delta")
    ice = str(tmp_path / "ice")
    w = DeltaStandardWriter(t)
    w.write(_docs(spark, 30), partition_by=["grp"])
    convert_delta_to_iceberg(spark, t, ice, ts_ms=1000)
    d = read_delta(spark, t).select("doc_id", "grp", "val")
    i = read_iceberg(spark, ice).select("doc_id", "grp", "val")
    assert i.exceptAll(d).count() == 0 and d.exceptAll(i).count() == 0
    got = {r.doc_id: r.grp for r in i.collect()}
    assert got[7] == "2" and got[10] == "0"
    assert dict(i.dtypes)["grp"] == "string"
    # plan-time partition pruning still works off the manifests
    pruned = read_iceberg(
        spark, ice, partition_filter=lambda pv: pv.get("grp") == "3"
    )
    assert sorted(r.doc_id for r in pruned.collect()) == [3, 8, 13, 18, 23, 28]


def test_convert_partitioned_delta_int_partition_type(spark, tmp_path):
    """Long-typed identity partition values reconstruct as LONGS."""
    t = str(tmp_path / "delta")
    ice = str(tmp_path / "ice")
    w = DeltaStandardWriter(t)
    df = spark.range(20).selectExpr(
        "id AS doc_id", "id % 3 AS bucket", "CAST(id * 1.5 AS DOUBLE) AS val"
    )
    w.write(df, partition_by=["bucket"])
    convert_delta_to_iceberg(spark, t, ice, ts_ms=1000)
    i = read_iceberg(spark, ice)
    assert dict(i.dtypes)["bucket"] == "bigint"
    assert {r.bucket for r in i.collect()} == {0, 1, 2}
    assert i.filter("bucket = 1").count() == 7  # ids 1,4,7,10,13,16,19


def test_convert_at_explicit_version(spark, tmp_path):
    t = str(tmp_path / "delta")
    ice = str(tmp_path / "ice")
    w = DeltaStandardWriter(t)
    v0 = w.write(_docs(spark, 10))
    w.write(_docs(spark, 10, lo=50))
    convert_delta_to_iceberg(spark, t, ice, ts_ms=1000, version=v0)
    assert read_iceberg(spark, ice).count() == 10


def test_convert_iceberg_to_delta_reads_identically(spark, tmp_path):
    """Reverse bridge: a native IcebergWriter table (two snapshots)
    converts to a v0 Delta log referencing the same parquet files;
    reads match both ways and nothing is rewritten."""
    from kafka_delta_ingest_spark.convert import convert_iceberg_to_delta
    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    ice = str(tmp_path / "ice")
    d2 = str(tmp_path / "delta2")
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "string"},
        {"id": 3, "name": "val", "required": False, "type": "double"},
    ]
    w = IcebergWriter(ice, fields)
    w.append(_docs(spark, 30), ts_ms=1000)
    w.append(_docs(spark, 10, lo=100), ts_ms=2000)
    v = convert_iceberg_to_delta(spark, ice, d2, ts_ms=3000)
    assert v == 0
    i = read_iceberg(spark, ice).select("doc_id", "grp", "val")
    d = read_delta(spark, d2).select("doc_id", "grp", "val")
    assert d.exceptAll(i).count() == 0 and i.exceptAll(d).count() == 0
    assert d.count() == 40
    # the delta table dir holds ONLY the log — no copied parquet
    non_log = [
        f
        for dp, _, fs in os.walk(d2)
        for f in fs
        if "_delta_log" not in dp
    ]
    assert non_log == []


def test_convert_iceberg_to_delta_refuses_deletes(spark, tmp_path):
    from kafka_delta_ingest_spark.convert import convert_iceberg_to_delta
    from kafka_delta_ingest_spark.iceberg import IcebergWriter

    ice = str(tmp_path / "ice")
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "string"},
        {"id": 3, "name": "val", "required": False, "type": "double"},
    ]
    w = IcebergWriter(ice, fields)
    w.append(_docs(spark, 30), ts_ms=1000)
    w.delete_where(spark, "doc_id % 3 = 0", ts_ms=2000)
    with pytest.raises(ValueError, match="delete"):
        convert_iceberg_to_delta(spark, ice, str(tmp_path / "d2"))


def test_convert_roundtrip_delta_iceberg_delta(spark, tmp_path):
    """delta -> iceberg -> delta: both hops metadata-only, the final
    read still matches the original (including an UPDATE applied
    before the first hop)."""
    from kafka_delta_ingest_spark.convert import convert_iceberg_to_delta

    t = str(tmp_path / "delta")
    ice = str(tmp_path / "ice")
    d2 = str(tmp_path / "delta2")
    w = DeltaStandardWriter(t)
    w.write(_docs(spark, 40).repartition(3))
    w.update_where(spark, "doc_id % 10 = 0", {"val": "val + 1000"})
    convert_delta_to_iceberg(spark, t, ice, ts_ms=1000)
    convert_iceberg_to_delta(spark, ice, d2, ts_ms=2000)
    a = read_delta(spark, t).select("doc_id", "grp", "val")
    b = read_delta(spark, d2).select("doc_id", "grp", "val")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_convert_hudi_cow_to_delta(spark, tmp_path):
    """Third bridge: Hudi CoW base files -> v0 Delta log. The hoodie
    meta columns stay in the parquet but the declared Delta schema
    prunes them; rows match the independent read_hudi view."""
    from kafka_delta_ingest_spark.convert import convert_hudi_to_delta
    from kafka_delta_ingest_spark.hudi import HudiCowWriter, read_hudi

    h = str(tmp_path / "hudi")
    d2 = str(tmp_path / "delta2")
    w = HudiCowWriter(h, record_key="doc_id")
    w.insert_batch(_docs(spark, 30))
    w.upsert_batch(_docs(spark, 10, lo=100))
    v = convert_hudi_to_delta(spark, h, d2, ts_ms=1000)
    assert v == 0
    hv = read_hudi(spark, h).select("doc_id", "grp", "val")
    dv = read_delta(spark, d2).select("doc_id", "grp", "val")
    assert dv.exceptAll(hv).count() == 0 and hv.exceptAll(dv).count() == 0
    assert dv.count() == 40
    assert "_hoodie_record_key" not in dv.columns


def test_convert_hudi_mor_pending_logs_refused(spark, tmp_path):
    from kafka_delta_ingest_spark.convert import convert_hudi_to_delta
    from kafka_delta_ingest_spark.hudi import HudiMorWriter

    h = str(tmp_path / "mor")
    w = HudiMorWriter(h, record_key="doc_id")
    w.insert_batch(_docs(spark, 20))
    w.upsert_log_batch(_docs(spark, 5).withColumn("val", F.lit(9.9)))
    with pytest.raises(ValueError, match="compact"):
        convert_hudi_to_delta(spark, h, str(tmp_path / "d2"))
