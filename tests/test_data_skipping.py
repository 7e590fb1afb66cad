"""Reader-side data skipping over add-action stats.

The writer collects per-file min/max/nullCount for parity with the
reference (src/writer.rs:657-1076); these tests prove the READER
consumes them — a time-range or partition predicate prunes files before
Spark ever lists them. That pruning is what makes the 100 TB table
readable: the scan cost follows the predicate's selectivity, not the
table size.
"""

import shutil
import tempfile

import pytest

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


@pytest.fixture()
def table(spark):
    root = tempfile.mkdtemp(prefix="kdi-skip-")
    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame(
            [(i, float(i), "2024-01-01") for i in range(10)], "id long, v double, date string"
        ).coalesce(1),
        partition_by=["date"],
    )
    t.write_batch(
        spark.createDataFrame(
            [(i, float(i), "2024-01-02") for i in range(100, 110)],
            "id long, v double, date string",
        ).coalesce(1),
        partition_by=["date"],
    )
    yield t
    shutil.rmtree(root, ignore_errors=True)


def test_minmax_stats_prune_files(table):
    assert len(table.files_for()) == 2
    assert len(table.files_for([("v", ">", 50)])) == 1
    assert len(table.files_for([("v", "<=", 9)])) == 1
    assert len(table.files_for([("v", ">", 500)])) == 0
    # Point lookup inside a gap between the two files' windows.
    assert len(table.files_for([("id", "=", 55)])) == 0
    assert len(table.files_for([("id", "=", 105)])) == 1


def test_partition_values_prune_typed(table):
    assert len(table.files_for([("date", "=", "2024-01-02")])) == 1
    assert len(table.files_for([("date", ">=", "2024-01-03")])) == 0
    # Conjunction across a partition column and a stats column.
    assert len(table.files_for([("date", "=", "2024-01-01"), ("v", ">", 50)])) == 0


def test_numeric_partition_values_not_lexicographic(spark):
    root = tempfile.mkdtemp(prefix="kdi-skip-num-")
    try:
        t = DeltaLikeTable(root + "/t")
        for b in (2, 10):  # "10" < "9" lexicographically — must not matter
            t.write_batch(
                spark.createDataFrame([(b, b)], "id long, bucket long").coalesce(1),
                partition_by=["bucket"],
            )
        assert len(t.files_for([("bucket", ">=", 9)])) == 1
        assert len(t.files_for([("bucket", "<", 9)])) == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_with_predicates_matches_full_filter(table, spark):
    full = table.read(spark).filter("v > 50").count()
    pruned = table.read(spark, predicates=[("v", ">", 50)]).filter("v > 50").count()
    assert full == pruned == 10


def test_clustered_optimize_enables_skipping(spark):
    """Before clustering, every file's id min/max window spans the whole
    domain (round-robin writes) so a point predicate prunes nothing;
    after optimize(cluster_by=["id"]), files own disjoint ranges and the
    same predicate hits ~one file."""
    root = tempfile.mkdtemp(prefix="kdi-zorder-")
    try:
        t = DeltaLikeTable(root + "/t")
        # 4 batches, each containing ids spread across the full 0..400
        # domain (i, i+4, i+8, ...) — worst case for min/max skipping.
        for b in range(4):
            t.write_batch(
                spark.createDataFrame(
                    [(i,) for i in range(b, 400, 4)], "id long"
                ).coalesce(1)
            )
        before = t.files_for([("id", "=", 250)])
        assert len(before) == 4  # every file's window covers 250

        res = t.optimize(spark, target_file_bytes=1, cluster_by=["id"])
        assert not res.skipped
        after = t.files_for([("id", "=", 250)])
        assert len(after) == 1  # disjoint sorted ranges → one file
        # Row set is unchanged through the rewrite.
        assert sorted(r.id for r in t.read(spark).collect()) == list(range(400))
        # And predicate reads agree.
        assert t.read(spark, predicates=[("id", "=", 250)]).filter(
            "id = 250"
        ).count() == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_unknown_columns_and_missing_stats_keep_files(table):
    # Conservative fallback: pruning must never drop a file it cannot prove.
    assert len(table.files_for([("nonexistent", ">", 1)])) == 2
    assert len(table.files_for([("v", "is_not_null")])) == 2


def test_zorder_optimize_prunes_every_clustered_dimension(spark):
    """Z-order vs lexicographic clustering on a 2-D grid: after
    optimize(zorder_by=["x","y"]) a point predicate on EITHER column
    prunes most files; after cluster_by=["x","y"] only the leading
    column prunes (the y windows all span the full domain)."""
    rows = [(x, y) for x in range(20) for y in range(20)]

    def build(**opt_kw):
        root = tempfile.mkdtemp(prefix="kdi-z2d-")
        t = DeltaLikeTable(root + "/t")
        # 4 round-robin batches: every file spans both full domains.
        for b in range(4):
            t.write_batch(
                spark.createDataFrame(
                    rows[b::4], "x long, y long"
                ).coalesce(1)
            )
        total = sum(f["size"] for f in t._live_files(t.snapshot()))
        res = t.optimize(spark, target_file_bytes=max(1, total // 16), **opt_kw)
        assert not res.skipped
        return root, t

    zroot, zt = build(zorder_by=["x", "y"])
    lroot, lt = build(cluster_by=["x", "y"])
    try:
        z_all = len(zt.files_for([]))
        l_all = len(lt.files_for([]))
        assert z_all >= 8 and l_all >= 8

        # leading column prunes under both layouts
        assert len(zt.files_for([("x", "=", 5)])) <= z_all // 2
        assert len(lt.files_for([("x", "=", 5)])) <= l_all // 2
        # trailing column prunes ONLY under z-order
        assert len(zt.files_for([("y", "=", 5)])) <= z_all // 2
        assert len(lt.files_for([("y", "=", 5)])) == l_all
        # conjunction narrows further than either alone under z-order
        both = len(zt.files_for([("x", "=", 5), ("y", "=", 5)]))
        assert both <= len(zt.files_for([("x", "=", 5)]))

        # the rewrite preserved the row multiset and predicate reads
        got = sorted((r.x, r.y) for r in zt.read(spark).collect())
        assert got == sorted(rows)
        assert (
            zt.read(spark, predicates=[("x", "=", 5), ("y", "=", 5)])
            .filter("x = 5 and y = 5")
            .count()
            == 1
        )
    finally:
        shutil.rmtree(zroot, ignore_errors=True)
        shutil.rmtree(lroot, ignore_errors=True)


def test_zorder_rejects_unordered_types(spark):
    import pytest as _pytest

    from kafka_delta_ingest_spark.sinks.delta_like import zorder_value

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with _pytest.raises(ValueError, match="unordered type"):
        zorder_value(df, ["id", "s"])


def test_zorder_null_and_constant_columns(spark):
    """Null values rank 0 (sorted first); a constant column contributes
    zero bits but must not error or perturb the other dimension."""
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.sinks.delta_like import zorder_value

    df = spark.createDataFrame(
        [(None, 7), (5, 7), (9, 7)], "a int, b int"
    )
    out = df.withColumn("z", zorder_value(df, ["a", "b"])).orderBy("z").collect()
    assert [r.a for r in out] == [None, 5, 9]


def test_bloom_index_prunes_wide_minmax_windows(spark):
    """High-cardinality ids in arrival order: every file's min/max
    window spans the whole domain, so point lookups prune nothing by
    stats — but the per-file bloom built by OPTIMIZE prunes to the one
    file actually holding the value (plus rare false positives)."""
    root = tempfile.mkdtemp(prefix="kdi-bloom-")
    try:
        t = DeltaLikeTable(root + "/t")
        # Knuth-hash spread: each batch's ids scatter over [0, 99991).
        batches = [
            [(i * 4 + b) * 2654435761 % 99991 for i in range(200)]
            for b in range(4)
        ]
        for ids in batches:
            t.write_batch(
                spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1)
            )
        total = sum(f["size"] for f in t._live_files(t.snapshot()))
        res = t.optimize(
            spark, target_file_bytes=max(1, total // 4), bloom_for=["id"]
        )
        assert not res.skipped
        all_files = t.files_for([])
        assert len(all_files) >= 3
        assert all("bloom" in f and "id" in f["bloom"] for f in all_files)

        # every live id resolves to very few files...
        probe_ids = [ids[0] for ids in batches]
        for pid in probe_ids:
            hit = t.files_for([("id", "=", pid)])
            assert 1 <= len(hit) <= 2, (pid, len(hit), len(all_files))
            # ...and the pruned read still finds the row
            assert (
                t.read(spark, predicates=[("id", "=", pid)])
                .filter(f"id = {pid}")
                .count()
                == sum(ids.count(pid) for ids in batches)
            )
        # a value no file contains prunes to (almost) nothing
        assert len(t.files_for([("id", "=", 99990)])) <= 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_bloom_rejects_uncanonical_types(spark):
    root = tempfile.mkdtemp(prefix="kdi-bloomty-")
    try:
        t = DeltaLikeTable(root + "/t")
        for _ in range(2):
            t.write_batch(
                spark.createDataFrame([(1.5,), (2.5,)], "v double").coalesce(1)
            )
        with pytest.raises(ValueError, match="canonical hash form"):
            t.optimize(spark, target_file_bytes=1, bloom_for=["v"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_bloom_string_column_and_survives_checkpoint(spark):
    """String blooms work, and bloom actions survive log checkpoints
    (the consolidated state carries add actions wholesale)."""
    from kafka_delta_ingest_spark.sinks.delta_like import CHECKPOINT_EVERY

    root = tempfile.mkdtemp(prefix="kdi-blooms-")
    try:
        t = DeltaLikeTable(root + "/t")
        keys = [f"user-{i * 7919 % 1000:03d}" for i in range(300)]
        for b in range(3):
            t.write_batch(
                spark.createDataFrame(
                    [(k,) for k in keys[b::3]], "k string"
                ).coalesce(1)
            )
        total = sum(f["size"] for f in t._live_files(t.snapshot()))
        t.optimize(spark, target_file_bytes=max(1, total // 4), bloom_for=["k"])
        # force a checkpoint by committing empty-ish appends up to the boundary
        while t.latest_version() % CHECKPOINT_EVERY != 0:
            t.write_batch(
                spark.createDataFrame([("zzz-none",)], "k string").coalesce(1)
            )
        n_all = len(t.files_for([]))
        hit = t.files_for([("k", "=", keys[0])])
        assert len(hit) < n_all
        assert t.read(spark, predicates=[("k", "=", keys[0])]).filter(
            f"k = '{keys[0]}'"
        ).count() == keys.count(keys[0])
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_zorder_and_bloom_compose(spark):
    """One OPTIMIZE can lay out rows by z-order AND build a bloom on a
    third, unclustered column: range predicates prune via the z-layout
    windows while point lookups on the bloomed key prune via bitmaps."""
    root = tempfile.mkdtemp(prefix="kdi-zb-")
    try:
        t = DeltaLikeTable(root + "/t")
        rows = [
            (x, y, (x * 31 + y) * 2654435761 % 99991)
            for x in range(20)
            for y in range(20)
        ]
        for b in range(4):
            t.write_batch(
                spark.createDataFrame(
                    rows[b::4], "x long, y long, key long"
                ).coalesce(1)
            )
        total = sum(f["size"] for f in t._live_files(t.snapshot()))
        res = t.optimize(
            spark,
            target_file_bytes=max(1, total // 8),
            zorder_by=["x", "y"],
            bloom_for=["key"],
        )
        assert not res.skipped
        n_all = len(t.files_for([]))
        assert n_all >= 4
        assert len(t.files_for([("y", "=", 3)])) < n_all
        probe = rows[7][2]
        hit = t.files_for([("key", "=", probe)])
        assert len(hit) < n_all
        assert (
            t.read(spark, predicates=[("key", "=", probe)])
            .filter(f"key = {probe}")
            .count()
            == sum(1 for r in rows if r[2] == probe)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
