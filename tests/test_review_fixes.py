"""Regression pins for the round-3 self-review findings — each test
reproduces a bug that silently lost or corrupted data (or metadata)
before the fix."""

import os
import shutil
import tempfile

import pytest

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="kdi-rf-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_escaped_partition_values_round_trip(spark, root):
    """Spark percent-escapes ':' etc. in partition dirs; the add action
    must store the UNESCAPED value or predicate pruning silently skips
    the matching file."""
    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00")],
            "id long, ts string",
        ),
        partition_by=["ts"],
    )
    assert any("%3A" in f["path"] for f in t._live_files())  # escaped dir
    got = t.read(spark, [("ts", "=", "2024-01-01 00:00:00")]).collect()
    assert [(r.id, r.ts) for r in got] == [(1, "2024-01-01 00:00:00")]
    # DML through the same window.
    t.delete_where(spark, [("ts", "=", "2024-01-02 00:00:00")])
    assert t.read(spark).count() == 1


def test_min_max_numeric_partition_column_typed(spark, root):
    """Partition values are directory strings; MIN/MAX must compare
    numerically ('9' < '10'), never lexicographically."""
    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame(
            [(i, b) for b in (9, 10) for i in range(3)], "id long, bucket long"
        ),
        partition_by=["bucket"],
    )
    assert t.min_max("bucket") == (9, 10)


def test_apply_changes_restore_tie_applies_insert(spark, root):
    """A RESTORE records a changed key as delete(old)+insert(new) at
    the SAME commit version; apply_changes must land the insert, never
    nondeterministically the delete."""
    src = DeltaLikeTable(root + "/src")
    dst = DeltaLikeTable(root + "/dst")
    src.write_batch(
        spark.createDataFrame([(1, "v1"), (2, "x")], "id long, s string").coalesce(1)
    )
    src.enable_cdf()
    v0 = src.latest_version()
    dst.write_batch(src.read(spark))
    src.update_where(spark, {"s": "'v2'"}, [("id", "=", 1)])
    src.restore(spark, v0)  # id=1: delete('v2') + insert('v1') same commit
    dst.apply_changes(spark, src.table_changes(spark, v0), key_cols=["id"])
    got = {r.id: r.s for r in dst.read(spark).collect()}
    assert got == {1: "v1", 2: "x"}  # the key survived with the restored value


def test_concurrent_constraint_ddls_merge_not_lost(spark, root):
    """Two ADD CONSTRAINTs racing from the same snapshot must BOTH land
    (CAS re-derive), not have the loser erase the winner."""
    t = DeltaLikeTable(root + "/t")
    t.write_batch(spark.createDataFrame([(1, 5)], "id long, val long"))
    # Writer B pins the pre-race snapshot the way the other race tests
    # do, then A commits first; B's CAS must re-derive and merge.
    stale = t.snapshot()
    b = DeltaLikeTable(root + "/t")
    orig = b.snapshot
    calls = {"n": 0}

    def snap_once(as_of=None):
        calls["n"] += 1
        return stale if calls["n"] == 1 else orig(as_of)

    t.add_constraint(spark, "a_pos", "id > 0")
    b.snapshot = snap_once  # type: ignore[method-assign]
    b.add_constraint(spark, "b_pos", "val > 0")
    assert set(t.constraints()) == {"a_pos", "b_pos"}


def test_vacuum_reclaims_aborted_staging(spark, root):
    t = DeltaLikeTable(root + "/t")
    t.write_batch(spark.createDataFrame([(1,)], "id long"))
    orphan = os.path.join(root + "/t", "_staging-deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-0.parquet"), "wb").write(b"x")
    would = t.vacuum(retention_ms=0, dry_run=True)
    assert "_staging-deadbeef" in would
    t.vacuum(retention_ms=0)
    assert not os.path.exists(orphan)


def test_bloom_bits_not_multiple_of_8(spark, root):
    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame([(i,) for i in range(50)], "id long").coalesce(1)
    )
    t.write_batch(
        spark.createDataFrame([(i,) for i in range(50, 100)], "id long").coalesce(1)
    )
    t.optimize(spark, bloom_for=["id"], bloom_bits=100)  # used to IndexError
    assert t.read(spark).count() == 100
    assert len(t.files_for([("id", "=", 7)])) >= 1


def test_merge_into_fresh_table_records_schema(spark, root):
    t = DeltaLikeTable(root + "/t")
    src = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, s string, par string"
    )
    t.merge(spark, src, key_cols=["id"], partition_by=["par"])
    assert t.table_schema() is not None
    assert t.snapshot()["metaData"]["partitionColumns"] == ["par"]
    # Follow-up writes inherit the partitioning like write_batch-created
    # tables do.
    t.write_batch(spark.createDataFrame([(3, "c", "p1")], "id long, s string, par string"))
    assert t.read(spark, [("par", "=", "p1")]).count() == 2


def test_deep_clone_drops_column_mapping_config(spark, root):
    src = DeltaLikeTable(root + "/src")
    src.write_batch(spark.createDataFrame([(1, "a")], "id long, s string"))
    src.rename_column("id", "doc_id")
    src.add_constraint(spark, "pos", "doc_id > 0")
    deep = src.clone_to(spark, root + "/deep", shallow=False)
    cfg = deep.snapshot()["metaData"]["configuration"]
    # Constraints carry; the colmap must NOT (deep files are logical).
    assert "delta.constraints.pos" in cfg
    assert not any(k.startswith("kdi.colmap.") for k in cfg)
    deep.write_batch(spark.createDataFrame([(2, "b")], "doc_id long, s string"))
    assert sorted(r.doc_id for r in deep.read(spark).collect()) == [1, 2]


def test_readding_renamed_or_dropped_physical_name_refused(spark, root):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    t = DeltaLikeTable(root + "/t")
    t.write_batch(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.rename_column("id", "doc_id")
    # Re-adding a column named like the frozen physical 'id' would read
    # the old files' bytes as its values.
    with pytest.raises(ValueError, match="physical"):
        t.evolve_schema(
            StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("s", StringType()),
                    StructField("id", LongType()),
                ]
            )
        )
    t.drop_column("s")
    with pytest.raises(ValueError, match="physical"):
        t.evolve_schema(
            StructType(
                [StructField("doc_id", LongType()), StructField("s", StringType())]
            )
        )
    with pytest.raises(ValueError, match="physical"):
        t.merge(
            spark,
            spark.createDataFrame([(1, "zz")], "doc_id long, s string"),
            key_cols=["doc_id"],
            evolve=True,
        )


def test_source_mix_decorrelated_from_split(spark):
    """source_mix's salted hash must be independent of
    deterministic_split's bucket: a 0.4-weight source must still land
    rows in the holdout split (unsalted, every survivor had
    bucket < 40 < 90 -> train, emptying the holdout)."""
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.operators.sampling import (
        deterministic_split,
        source_mix,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mixed = source_mix(d, {f"src{i}": (1.0 if i % 2 == 0 else 0.4) for i in range(20)})
    split = deterministic_split(mixed, "doc_id", train_pct=90)
    odd_holdout = split.filter(
        (F.col("split") == "holdout")
        & (F.expr("CAST(substr(source, 4) AS INT) % 2 = 1"))
    ).count()
    assert odd_holdout > 0


def test_stratified_subpercent_fraction_not_dropped(spark):
    """A 0.5% fraction must sample ~0.5%, not quantize to zero."""
    from kafka_delta_ingest_spark.operators.sampling import (
        hash_stratified_sample,
    )

    d = spark.range(200_000).selectExpr("id AS doc_id", "'en' AS lang")
    got = hash_stratified_sample(d, "lang", {"en": 0.005}).count()
    assert 500 <= got <= 1500  # ~1000 expected; zero was the bug


def test_table_changes_seeds_from_checkpoint_not_v0(spark, root):
    """An incremental poll must read O(range) version files, seeded
    from the newest checkpoint at or below the cursor — never replay
    the whole log per poll."""
    t = DeltaLikeTable(root + "/t")
    for i in range(12):  # checkpoint lands at version 10
        t.write_batch(spark.createDataFrame([(i,)], "id long"))
    t.enable_cdf()  # v12
    t.write_batch(spark.createDataFrame([(100,)], "id long"))  # v13

    opened = []
    orig = t._version_file
    t._version_file = lambda v: (opened.append(v), orig(v))[1]  # type: ignore[method-assign]
    ch = t.table_changes(spark, from_version=12).collect()
    assert [r.id for r in ch] == [100]
    # Seeded from checkpoint.10: versions 0..9 never opened.
    assert opened and min(opened) >= 11
