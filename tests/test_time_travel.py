"""Time travel + VACUUM on the Delta-style log.

The reference gets versioned reads for free from delta-rs/Delta Lake
(`DeltaTable::load_version`); these tests prove our log replay gives
the same guarantees: any historical version is reconstructable until
vacuum reclaims its files, OPTIMIZE never breaks in-flight readers
(tombstones, not deletions), and vacuum honors its retention window.
"""

import os
import shutil
import tempfile

import pytest

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


def _write(t, spark, lo, n=10):
    df = spark.createDataFrame([(i, f"r{i}") for i in range(lo, lo + n)], "id long, s string")
    return t.write_batch(df)


def test_time_travel_reads_historical_versions(spark):
    root = tempfile.mkdtemp(prefix="kdi-tt-")
    try:
        t = DeltaLikeTable(root + "/t")
        v0 = _write(t, spark, 0).version
        v1 = _write(t, spark, 10).version
        v2 = _write(t, spark, 20).version
        assert (v0, v1, v2) == (0, 1, 2)
        assert t.read(spark, version=0).count() == 10
        assert t.read(spark, version=1).count() == 20
        assert sorted(r.id for r in t.read(spark, version=1).collect()) == list(range(20))
        assert t.read(spark).count() == 30

        with pytest.raises(ValueError, match="does not exist"):
            t.snapshot(as_of=99)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_optimize_preserves_time_travel_until_vacuum(spark):
    root = tempfile.mkdtemp(prefix="kdi-ttvac-")
    try:
        t = DeltaLikeTable(root + "/t")
        for b in range(3):
            _write(t, spark, b * 10)
        before = {f["path"] for f in t._live_files()}
        res = t.optimize(spark, target_file_bytes=64 * 1024 * 1024)
        assert not res.skipped

        # Tombstoned files stay on disk: reading the pre-OPTIMIZE
        # version still works and sees the identical row set.
        old = t.read(spark, version=2)
        assert sorted(r.id for r in old.collect()) == list(range(30))
        assert t.read(spark).count() == 30

        # Inside the retention window nothing is reclaimed.
        assert t.vacuum(retention_ms=24 * 3600 * 1000) == []
        for p in before:
            assert os.path.exists(os.path.join(t.path, p))

        # retention 0: tombstones go, the live snapshot is untouched.
        deleted = t.vacuum(retention_ms=0)
        assert sorted(deleted) == sorted(before)
        assert t.read(spark).count() == 30
        for p in before:
            assert not os.path.exists(os.path.join(t.path, p))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_vacuum_reclaims_aborted_staging_orphans(spark):
    root = tempfile.mkdtemp(prefix="kdi-orph-")
    try:
        t = DeltaLikeTable(root + "/t")
        _write(t, spark, 0)
        # Simulate an aborted write: a data file on disk, never committed.
        orphan = os.path.join(t.path, "part-orphan-dead.snappy.parquet")
        with open(orphan, "wb") as f:
            f.write(b"not really parquet")
        assert t.vacuum(retention_ms=0) == ["part-orphan-dead.snappy.parquet"]
        assert not os.path.exists(orphan)
        assert t.read(spark).count() == 10
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_append_change_feed_skips_rewrites(spark):
    root = tempfile.mkdtemp(prefix="kdi-cdf-")
    try:
        t = DeltaLikeTable(root + "/t")
        for b in range(3):  # versions 0, 1, 2
            _write(t, spark, b * 10)
        assert not t.optimize(spark, target_file_bytes=64 * 1024 * 1024).skipped  # v3
        _write(t, spark, 100)  # version 4
        src = spark.createDataFrame([(0, "fix")], "id long, s string")
        t.merge(spark, src, key_cols=["id"])  # version 5 (rewrite, excluded)

        feed = t.appended_between(spark, from_version=0)
        rows = feed.collect()
        # versions 1, 2, 4 — never the OPTIMIZE or MERGE rewrites.
        assert sorted({r._commit_version for r in rows}) == [1, 2, 4]
        assert sorted(r.id for r in rows) == list(range(10, 30)) + list(range(100, 110))
        # cursor semantics: from_version=-1 also yields the first commit
        assert t.appended_between(spark, from_version=-1).count() == 40
        # empty window
        assert t.appended_between(spark, from_version=5).count() == 0

        import pytest as _pytest

        with _pytest.raises(ValueError, match="does not exist"):
            t.appended_between(spark, from_version=0, to_version=99)
    finally:
        shutil.rmtree(root, ignore_errors=True)
