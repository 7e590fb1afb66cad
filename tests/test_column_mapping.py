"""Column mapping: RENAME / DROP COLUMN without touching data files.

Delta's columnMapping.mode=name decouples the LOGICAL schema name from
the PHYSICAL parquet name: a rename is one metaData commit — on a
100 TB table, zero bytes move. Files, stats, partition directories,
blooms, and change files stay keyed by the frozen physical name; the
read path re-attaches logical names, and every stats-pruning boundary
translates logical predicates to physical before consulting the log.
"""

import json
import os
import shutil
import tempfile

import pytest

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="kdi-cmap-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _seed(t, spark, batches=3, n=10):
    for b in range(batches):
        lo = b * n
        t.write_batch(
            spark.createDataFrame(
                [(i, f"s{i}") for i in range(lo, lo + n)], "id long, s string"
            ).coalesce(1)
        )


def _data_files(path):
    return {
        os.path.join(dp, f)
        for dp, _dn, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_kdi" not in dp and "_change_data" not in dp
    }


def test_rename_is_metadata_only_and_reads_back(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark)
    before = _data_files(root + "/t")
    t.rename_column("id", "doc_id")
    assert _data_files(root + "/t") == before  # zero bytes moved
    df = t.read(spark)
    assert df.columns == ["doc_id", "s"]
    assert sorted(r.doc_id for r in df.collect()) == list(range(30))


def test_rename_keeps_stats_pruning_under_logical_name(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark)  # files: 0-9, 10-19, 20-29 (stats keyed physical "id")
    t.rename_column("id", "doc_id")
    # Logical predicate must translate to the physical stats key.
    assert len(t.files_for([("doc_id", "<", 10)])) == 1
    assert t.count_rows([("doc_id", ">=", 10)]) == 20
    assert t.min_max("doc_id") == (0, 29)
    got = t.read(spark, [("doc_id", "<", 10)])
    assert sorted(r.doc_id for r in got.collect()) == list(range(10))


def test_writes_after_rename_store_physical_name(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark, batches=1)
    t.rename_column("id", "doc_id")
    t.write_batch(
        spark.createDataFrame([(100, "new")], "doc_id long, s string")
    )
    # EVERY data file stores the frozen physical name "id".
    import pyarrow.parquet as pq

    for f in _data_files(root + "/t"):
        assert "id" in pq.read_schema(f).names
        assert "doc_id" not in pq.read_schema(f).names
    assert sorted(r.doc_id for r in t.read(spark).collect()) == list(
        range(10)
    ) + [100]


def test_dml_after_rename(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark)
    t.rename_column("id", "doc_id")
    t.delete_where(spark, [("doc_id", "<", 5)])
    t.update_where(spark, {"s": "concat(s, '!')"}, [("doc_id", "=", 7)])
    t.merge(
        spark,
        spark.createDataFrame([(7, "merged")], "doc_id long, s string"),
        key_cols=["doc_id"],
    )
    got = {r.doc_id: r.s for r in t.read(spark).collect()}
    assert len(got) == 25 and got[7] == "merged" and got[8] == "s8"


def test_rename_partition_column(spark, root):
    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd") for i in range(20)],
            "id long, par string",
        ),
        partition_by=["par"],
    )
    t.rename_column("par", "bucket")
    df = t.read(spark, [("bucket", "=", "odd")])
    assert {r.bucket for r in df.collect()} == {"odd"}
    assert df.count() == 10
    # New writes keep landing under the physical directory name.
    t.write_batch(
        spark.createDataFrame([(100, "odd")], "id long, bucket string")
    )
    assert t.read(spark, [("bucket", "=", "odd")]).count() == 11
    assert any("par=odd" in d for d, _dn, _f in os.walk(root + "/t"))


def test_cdf_survives_rename(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark, batches=1)
    t.enable_cdf()
    v = t.latest_version()
    t.delete_where(spark, [("id", "<", 2)])  # cdc written pre-rename
    t.rename_column("id", "doc_id")
    t.delete_where(spark, [("doc_id", "=", 5)])  # cdc written post-rename
    ch = t.table_changes(spark, v).collect()
    assert sorted((r.doc_id, r._change_type) for r in ch) == [
        (0, "delete"),
        (1, "delete"),
        (5, "delete"),
    ]


def test_rename_refused_when_referenced(spark, root):
    t = DeltaLikeTable(root + "/t")
    t.write_batch(spark.createDataFrame([(1, 2)], "id long, val long"))
    t.add_constraint(spark, "val_pos", "val > 0")
    with pytest.raises(ValueError, match="referenced"):
        t.rename_column("val", "v2")
    t.drop_constraint("val_pos")
    t.rename_column("val", "v2")  # now fine
    assert t.read(spark).columns == ["id", "v2"]


def test_drop_column(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark, batches=1)
    before = _data_files(root + "/t")
    t.drop_column("s")
    assert _data_files(root + "/t") == before  # metadata only
    assert t.read(spark).columns == ["id"]
    # New writes need not carry the dropped column; reads stay clean.
    t.write_batch(spark.createDataFrame([(100,)], "id long"))
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(10)) + [100]


def test_drop_partition_column_refused(spark, root):
    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame([(1, "a")], "id long, par string"),
        partition_by=["par"],
    )
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("par")


def test_rename_chain_and_history(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark, batches=1)
    t.rename_column("id", "a")
    t.rename_column("a", "b")  # physical stays "id" across the chain
    cfg = t.snapshot()["metaData"]["configuration"]
    assert cfg["kdi.colmap.b"] == "id"
    assert "kdi.colmap.a" not in cfg
    assert sorted(r.b for r in t.read(spark).collect()) == list(range(10))
    ops = [r.operation for r in t.describe_history(spark).collect()]
    assert "RENAME COLUMN a TO b" in ops
