"""MERGE (upsert) and DELETE with stats-pruned file rewrites.

The reference is append-only by design; these are the Delta-native
row-mutation operators a training-data pipeline needs (late-arriving
corrections, GDPR deletes). The tests pin the scale property — files
whose stats window provably misses the source keys / predicate are NOT
rewritten — alongside the row-level semantics.
"""

import shutil
import tempfile

import pytest

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


def _seed(t, spark, batches=3, n=10):
    for b in range(batches):
        lo = b * n
        df = spark.createDataFrame(
            [(i, f"old{i}") for i in range(lo, lo + n)], "id long, s string"
        ).coalesce(1)
        t.write_batch(df)


def test_merge_upserts_and_prunes_untouched_files(spark):
    root = tempfile.mkdtemp(prefix="kdi-merge-")
    try:
        t = DeltaLikeTable(root + "/t")
        _seed(t, spark)  # files: ids 0-9, 10-19, 20-29
        files_before = {f["path"] for f in t._live_files()}

        # Updates confined to ids 0-4: stats prove files 10-19 and
        # 20-29 cannot match, so they must survive untouched.
        src = spark.createDataFrame(
            [(i, f"new{i}") for i in range(5)], "id long, s string"
        )
        res = t.merge(spark, src, key_cols=["id"])
        assert not res.skipped

        got = {r.id: r.s for r in t.read(spark).collect()}
        assert len(got) == 30
        assert all(got[i] == f"new{i}" for i in range(5))
        assert all(got[i] == f"old{i}" for i in range(5, 30))

        files_after = {f["path"] for f in t._live_files()}
        # Two of the three original files survived the merge unrewritten.
        assert len(files_before & files_after) == 2

        # Insert-only merge (keys beyond every file's window): nothing
        # is rewritten, the source appends.
        ins = spark.createDataFrame(
            [(i, f"ins{i}") for i in range(100, 105)], "id long, s string"
        )
        pre = {f["path"] for f in t._live_files()}
        t.merge(spark, ins, key_cols=["id"])
        post = {f["path"] for f in t._live_files()}
        assert pre <= post  # old files all survive
        assert t.read(spark).count() == 35
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_merge_source_dedup_and_time_travel(spark):
    root = tempfile.mkdtemp(prefix="kdi-merge2-")
    try:
        t = DeltaLikeTable(root + "/t")
        _seed(t, spark, batches=1)
        v_before = t.snapshot()["version"]
        # Duplicate keys in the source collapse before the upsert.
        src = spark.createDataFrame(
            [(3, "a"), (3, "b"), (99, "x")], "id long, s string"
        )
        t.merge(spark, src, key_cols=["id"])
        assert t.read(spark).count() == 11
        # Pre-merge snapshot still reconstructable (tombstones, no deletes).
        assert t.read(spark, version=v_before).count() == 10
        assert {
            r.s for r in t.read(spark, version=v_before).filter("id = 3").collect()
        } == {"old3"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_delete_where_rewrites_only_matching_files(spark):
    root = tempfile.mkdtemp(prefix="kdi-del-")
    try:
        t = DeltaLikeTable(root + "/t")
        _seed(t, spark)
        files_before = {f["path"] for f in t._live_files()}

        res = t.delete_where(spark, [("id", ">=", 20)])
        assert not res.skipped
        assert sorted(r.id for r in t.read(spark).collect()) == list(range(20))
        files_after = {f["path"] for f in t._live_files()}
        # files 0-9 and 10-19 survive by stats proof; 20-29 fully
        # matched -> tombstoned with no replacement (0 surviving rows).
        assert len(files_before & files_after) == 2
        assert res.num_records == 0

        # A predicate no file can match is a no-op commit-free skip.
        assert t.delete_where(spark, [("id", ">=", 1000)]).skipped
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_delete_where_keeps_null_predicate_rows(spark):
    """SQL DELETE removes rows where the predicate is TRUE — rows where
    it evaluates to NULL (here: s IS NULL under ``s = 'x'``) must
    survive, not be silently dropped by ``~NULL``."""
    root = tempfile.mkdtemp(prefix="kdi-delnull-")
    try:
        t = DeltaLikeTable(root + "/t")
        df = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, None), (4, "x"), (5, None)],
            "id long, s string",
        ).coalesce(1)
        t.write_batch(df)

        res = t.delete_where(spark, [("s", "=", "x")])
        assert not res.skipped
        got = {(r.id, r.s) for r in t.read(spark).collect()}
        # Only the TRUE rows (1, 4) are deleted; NULL-predicate rows stay.
        assert got == {(2, "y"), (3, None), (5, None)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_delete_everything_reads_empty(spark, tmp_path):
    """Deleting every row must leave a readable EMPTY table — the
    zero-live-files read path must not fall back to a directory scan,
    which would resurrect tombstoned-but-unvacuumed physical files
    (minimal case of the model-fuzz falsifying example: optimize →
    delete-all doubled the row count)."""
    from pyspark.sql import Row

    t = DeltaLikeTable(str(tmp_path / "t"))
    t.write_batch(spark.createDataFrame([Row(id=i, val=f"v{i}") for i in range(8)]))
    t.optimize(spark, target_file_bytes=1 << 20)
    res = t.delete_where(spark, [("id", "<", 100)])
    assert not res.skipped
    empty = t.read(spark)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "val"}  # schema survives
