"""UPDATE and MERGE on the STANDARD Delta log (DeltaStandardWriter).

The kdi-format sink has had merge/delete since r3
(tests/test_merge_delete.py); these are the standard-log
counterparts, emitting protocol-conformant action streams any Delta
reader applies. The reference daemon is append-only (README.adoc:3-5)
— row mutation is the delta-rs-parity surface a curation pipeline
needs for late corrections and GDPR erasure.

Pinned properties:
* copy-on-write rewrites ONLY files containing a matched/updated row
  (scale: O(touched), not O(table));
* CDF tables emit update_preimage/update_postimage (UPDATE) and
  insert/delete/update pairs (MERGE) served by table_changes;
* merge cardinality violations raise;
* history stays time-travelable across the mutation.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.delta_standard import (
    DeltaStandardWriter,
    read_delta,
    table_changes,
)


def _seed(w, spark, batches=3, n=10):
    for b in range(batches):
        lo = b * n
        df = spark.createDataFrame(
            [(i, f"old{i}", i * 10) for i in range(lo, lo + n)],
            "id long, s string, val long",
        ).coalesce(1)
        w.write(df)


def _rows(spark, root, version=None):
    return {
        r["id"]: (r["s"], r["val"])
        for r in read_delta(spark, root, version=version).collect()
    }


def test_update_where_rewrites_only_touched_files(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdupd-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark)
        before = set(w._py_replay()["adds"])
        v = w.update_where(
            spark, "id >= 25", {"s": "concat('new', id)", "val": "val + 1"}
        )
        got = _rows(spark, root)
        assert len(got) == 30
        for i in range(30):
            if i >= 25:
                assert got[i] == (f"new{i}", i * 10 + 1)
            else:
                assert got[i] == (f"old{i}", i * 10)
        after = set(w._py_replay()["adds"])
        # files 0-9 and 10-19 hold no matching row — never rewritten
        assert len(before & after) == 2
        # pre-update snapshot still time-travelable
        assert _rows(spark, root, version=v - 1)[29] == ("old29", 290)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_update_where_noop_and_schema_guards(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdupd2-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark, batches=1)
        v0 = w.latest_version()
        assert w.update_where(spark, "id > 1000", {"val": "0"}) == v0
        with pytest.raises(ValueError, match="not in table schema"):
            w.update_where(spark, "id = 1", {"nope": "0"})
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_update_where_cdf_pre_and_post_images(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdupd3-") + "/t"
    try:
        w = DeltaStandardWriter(root, enable_cdf=True)
        _seed(w, spark, batches=1)
        v = w.update_where(spark, "id = 3", {"val": "999"})
        ch = table_changes(spark, root, v, v).filter(
            F.col("_change_type").startswith("update")
        ).collect()
        by_type = {r["_change_type"]: r for r in ch}
        assert set(by_type) == {"update_preimage", "update_postimage"}
        assert by_type["update_preimage"]["val"] == 30
        assert by_type["update_postimage"]["val"] == 999
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_update_insert_delete_clauses(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdmerge-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark)
        src = spark.createDataFrame(
            # 5: update; 27: delete; 100,101: insert
            [(5, "upd5", -1), (27, "del", -1),
             (100, "ins100", 1000), (101, "ins101", 1010)],
            "id long, s string, val long",
        )
        w.merge(
            spark, src, "source.id = target.id",
            when_matched_delete="source.s = 'del'",
            when_matched_update={"s": "source.s", "val": "source.val"},
            when_not_matched_insert=True,
        )
        got = _rows(spark, root)
        assert 27 not in got
        assert got[5] == ("upd5", -1)
        assert got[100] == ("ins100", 1000)
        assert got[101] == ("ins101", 1010)
        assert got[6] == ("old6", 60)
        assert len(got) == 30 - 1 + 2
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_prunes_untouched_files_and_cdf(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdmerge2-") + "/t"
    try:
        w = DeltaStandardWriter(root, enable_cdf=True)
        _seed(w, spark)
        before = set(w._py_replay()["adds"])
        src = spark.createDataFrame(
            [(12, "upd12", 5), (200, "ins200", 6)],
            "id long, s string, val long",
        )
        v = w.merge(
            spark, src, "source.id = target.id",
            when_matched_update={"s": "source.s", "val": "source.val"},
            when_not_matched_insert=True,
        )
        after = set(w._py_replay()["adds"])
        # only the 10-19 file was rewritten; the other two survive
        assert len(before & after) == 2
        ch = table_changes(spark, root, v, v)
        types = {
            r["_change_type"]: r["id"]
            for r in ch.filter(F.col("id").isin(12, 200)).collect()
        }
        assert types == {
            "update_preimage": 12,
            "update_postimage": 12,
            "insert": 200,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_cardinality_violation_raises(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdmerge3-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark, batches=1)
        src = spark.createDataFrame(
            [(5, "a", 0), (5, "b", 0)], "id long, s string, val long"
        )
        with pytest.raises(ValueError, match="cardinality"):
            w.merge(
                spark, src, "source.id = target.id",
                when_matched_update={"s": "source.s"},
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_insert_only_into_partitioned_table(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdmerge4-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        df = spark.createDataFrame(
            [(i, f"old{i}", i * 10, str(i % 2)) for i in range(10)],
            "id long, s string, val long, p string",
        ).coalesce(1)
        w.write(df, partition_by=["p"])
        before = set(w._py_replay()["adds"])
        src = spark.createDataFrame(
            [(50, "ins", 1, "0"), (51, "ins", 2, "1")],
            "id long, s string, val long, p string",
        )
        w.merge(spark, src, "source.id = target.id")
        live = read_delta(spark, root)
        assert live.count() == 12
        # inserts landed in their hive partitions with typed reads
        assert (
            live.filter("id = 51").select("p").first()["p"] == "1"
        )
        # no file was rewritten: insert-only merge has no touched set
        assert before <= set(w._py_replay()["adds"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_update_set_expr_type_drift_raises(spark):
    """A SET expression that retypes a column must raise, never land
    parquet whose schema drifts from metaData.schemaString."""
    root = tempfile.mkdtemp(prefix="kdi-stdupd4-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark, batches=1)
        with pytest.raises(ValueError, match="type"):
            # when/otherwise unifies on DOUBLE, retyping the column;
            # double->long is not a safe store assignment
            w.update_where(spark, "id = 1", {"val": "val * 1.5"})
        # the failed update must not have committed
        assert w.latest_version() == 0
        assert len(_rows(spark, root)) == 10
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_txn_replay_skips(spark):
    """merge(txn=...) is exactly-once: a replay of the same CDC batch
    (same appId floors) returns the current version without touching
    the table — crash/restart semantics for streaming CDC-apply."""
    root = tempfile.mkdtemp(prefix="kdi-stdmerge6-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark, batches=1)
        src = spark.createDataFrame(
            [(5, "upd", -1), (100, "ins", 1)],
            "id long, s string, val long",
        )
        v = w.merge(
            spark, src, "source.id = target.id",
            when_matched_update={"s": "source.s", "val": "source.val"},
            txn={"cdc-0": 9},
        )
        assert v == 1
        # replay: same floors -> skipped, no new version
        v2 = w.merge(
            spark, src, "source.id = target.id",
            when_matched_update={"s": "source.s", "val": "source.val"},
            txn={"cdc-0": 9},
        )
        assert v2 == 1 and w.latest_version() == 1
        # a NEW writer instance replays the same batch after "restart"
        assert DeltaStandardWriter(root).merge(
            spark, src, "source.id = target.id",
            when_matched_update={"s": "source.s", "val": "source.val"},
            txn={"cdc-0": 9},
        ) == 1
        # higher floor -> applies
        src2 = spark.createDataFrame(
            [(6, "upd6", -2)], "id long, s string, val long"
        )
        v3 = w.merge(
            spark, src2, "source.id = target.id",
            when_matched_update={"s": "source.s", "val": "source.val"},
            txn={"cdc-0": 10},
        )
        assert v3 == 2
        got = _rows(spark, root)
        assert got[5] == ("upd", -1) and got[6] == ("upd6", -2)
        assert got[100] == ("ins", 1) and len(got) == 11
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_on_empty_match_keeps_table_identical(spark):
    root = tempfile.mkdtemp(prefix="kdi-stdmerge5-") + "/t"
    try:
        w = DeltaStandardWriter(root)
        _seed(w, spark, batches=1)
        src = spark.createDataFrame(
            [(999, "x", 0)], "id long, s string, val long"
        )
        w.merge(
            spark, src, "source.id = target.id",
            when_matched_update={"s": "source.s"},
            when_not_matched_insert=False,
        )
        assert len(_rows(spark, root)) == 10
    finally:
        shutil.rmtree(root, ignore_errors=True)
