"""Metadata-only COUNT(*) and CLONE (shallow/deep).

Two more Delta-parity levers the append-only reference lacks:
``count_rows`` answers SELECT COUNT(*) from add-action stats + DV
cardinalities (zero files read — the same cost at 100 TB as at 100
rows); ``clone_to`` forks a table instantly by re-referencing its live
files (shallow) or materializing them (deep), after which the clone
evolves independently.
"""

import shutil
import tempfile

import pytest

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="kdi-clone-")
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


# -- count_rows ------------------------------------------------------------


def test_count_rows_matches_scan_through_dml(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark)
    assert t.count_rows() == 30 == t.read(spark).count()
    t.delete_where(spark, [("id", "<", 7)])
    assert t.count_rows() == 23 == t.read(spark).count()
    t.delete_where(spark, [("id", "=", 15)], dv=True)  # DV cardinality path
    assert t.count_rows() == 22 == t.read(spark).count()
    t.merge(
        spark,
        spark.createDataFrame([(100, "new")], "id long, s string"),
        key_cols=["id"],
    )
    assert t.count_rows() == 23 == t.read(spark).count()


def test_count_rows_with_predicates_exact_or_none(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark)  # files: 0-9, 10-19, 20-29
    # Whole files provably match: exact without reading anything.
    assert t.count_rows([("id", "<", 10)]) == 10
    assert t.count_rows([("id", ">=", 10)]) == 20
    # A straddling window cannot be answered from stats: must be None,
    # never a wrong number.
    assert t.count_rows([("id", "<", 5)]) is None


# -- clone -----------------------------------------------------------------


def test_shallow_clone_instant_and_independent(spark, root):
    src = DeltaLikeTable(root + "/src")
    _seed(src, spark)
    clone = src.clone_to(spark, root + "/clone", shallow=True)

    # Same rows, zero data files copied into the clone.
    assert sorted(map(tuple, clone.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )
    import os

    clone_parquet = [
        f
        for _dp, _dn, fs in os.walk(root + "/clone")
        for f in fs
        if f.endswith(".parquet")
    ]
    assert clone_parquet == []

    # The clone evolves independently: a delete rewrites locally...
    clone.delete_where(spark, [("id", "<", 10)])
    assert clone.read(spark).count() == 20
    # ...and the source is untouched.
    assert src.read(spark).count() == 30
    # Metadata-only count agrees on the cloned lineage.
    assert clone.count_rows() == 20


def test_shallow_clone_of_partitioned_table(spark, root):
    src = DeltaLikeTable(root + "/src")
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(20)],
        "id long, par string",
    )
    src.write_batch(df, partition_by=["par"])
    clone = src.clone_to(spark, root + "/clone")
    got = sorted(map(tuple, clone.read(spark).collect()))
    assert got == sorted(map(tuple, df.collect()))
    # Partition pruning still works from the cloned add actions.
    assert {r.par for r in clone.read(spark, [("par", "=", "odd")]).collect()} == {
        "odd"
    }


def test_shallow_clone_as_of_version(spark, root):
    src = DeltaLikeTable(root + "/src")
    _seed(src, spark, batches=2)
    v0 = src.latest_version()
    src.write_batch(
        spark.createDataFrame([(99, "late")], "id long, s string")
    )
    clone = src.clone_to(spark, root + "/clone", version=v0)
    assert clone.read(spark).count() == 20  # pre-late-batch state


def test_shallow_clone_refuses_live_dvs(spark, root):
    src = DeltaLikeTable(root + "/src")
    _seed(src, spark, batches=1)
    src.delete_where(spark, [("id", "=", 3)], dv=True)
    with pytest.raises(ValueError, match="deletion vectors"):
        src.clone_to(spark, root + "/clone")
    # Deep clone handles it: DVs materialize away.
    deep = src.clone_to(spark, root + "/deep", shallow=False)
    assert sorted(r.id for r in deep.read(spark).collect()) == [
        i for i in range(10) if i != 3
    ]


def test_dv_delete_on_external_files_refused_but_rewrite_works(spark, root):
    src = DeltaLikeTable(root + "/src")
    _seed(src, spark, batches=1)
    clone = src.clone_to(spark, root + "/clone")
    with pytest.raises(ValueError, match="external"):
        clone.delete_where(spark, [("id", "=", 2)], dv=True)
    # The rewriting delete localizes the file and succeeds.
    clone.delete_where(spark, [("id", "=", 2)])
    assert clone.read(spark).count() == 9
    # Now every live file is local; DV deletes work again.
    clone.delete_where(spark, [("id", "=", 4)], dv=True)
    assert sorted(r.id for r in clone.read(spark).collect()) == [
        0, 1, 3, 5, 6, 7, 8, 9
    ]


def test_deep_clone_carries_configuration(spark, root):
    src = DeltaLikeTable(root + "/src")
    _seed(src, spark, batches=1)
    src.add_constraint(spark, "id_pos", "id >= 0")
    src.enable_cdf()
    deep = src.clone_to(spark, root + "/deep", shallow=False)
    assert deep.constraints() == {"id_pos": "id >= 0"}
    assert deep._cdf_enabled(deep.snapshot())
    # The carried constraint actually enforces on the clone.
    from kafka_delta_ingest_spark.sinks.delta_like import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        deep.write_batch(
            spark.createDataFrame([(-1, "bad")], "id long, s string")
        )


def test_clone_into_nonempty_destination_refused(spark, root):
    src = DeltaLikeTable(root + "/src")
    _seed(src, spark, batches=1)
    other = DeltaLikeTable(root + "/other")
    _seed(other, spark, batches=1)
    with pytest.raises(ValueError, match="not empty"):
        src.clone_to(spark, root + "/other")


def test_min_max_from_stats(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark)  # ids 0..29 across 3 files
    assert t.min_max("id") == (0, 29)
    t.delete_where(spark, [("id", ">=", 20)])  # rewrite drops a file
    assert t.min_max("id") == (0, 19)
    # A DV makes the metadata answer unsound: must be None, not wrong.
    t.delete_where(spark, [("id", "=", 0)], dv=True)
    assert t.min_max("id") is None
    assert t.min_max("no_such_column") is None


def test_describe_history_audit_trail(spark, root):
    t = DeltaLikeTable(root + "/t")
    _seed(t, spark, batches=2)
    t.delete_where(spark, [("id", "<", 5)])
    t.restore(spark, 1)
    h = t.describe_history(spark).collect()
    assert [r.version for r in h] == [3, 2, 1, 0]
    assert [r.operation for r in h] == [
        "RESTORE",
        "DELETE",
        "STREAMING UPDATE",
        "STREAMING UPDATE",
    ]
    import json as _json

    restore_params = _json.loads(h[0].operationParameters)
    assert restore_params["version"] == 1
    assert h[1].numRemovedFiles == 1  # the delete tombstoned one file


def test_optimize_where_scopes_to_partition(spark, root):
    t = DeltaLikeTable(root + "/t")
    for b in range(3):  # 3 small files per partition value
        t.write_batch(
            spark.createDataFrame(
                [(b * 10 + i, "a" if i % 2 == 0 else "b") for i in range(10)],
                "id long, par string",
            ),
            partition_by=["par"],
        )
    before = {f["path"] for f in t._live_files()}
    b_files_before = {p for p in before if "par=b" in p}
    t.optimize(spark, where=[("par", "=", "a")])
    after = {f["path"] for f in t._live_files()}
    # Partition b untouched; partition a compacted.
    assert b_files_before <= after
    assert len([p for p in after if "par=a" in p]) < len(
        [p for p in before if "par=a" in p]
    )
    assert t.read(spark).count() == 30


def test_vacuum_dry_run_touches_nothing(spark, root):
    import os

    t = DeltaLikeTable(root + "/t")
    _seed(t, spark, batches=1)
    t.delete_where(spark, [("id", "<", 100)])  # tombstones the file
    would = t.vacuum(retention_ms=0, dry_run=True)
    assert len(would) == 1
    assert os.path.exists(os.path.join(root + "/t", would[0]))  # untouched
    really = t.vacuum(retention_ms=0)
    assert really == would
    assert not os.path.exists(os.path.join(root + "/t", would[0]))


def test_merge_schema_evolution(spark, root):
    t = DeltaLikeTable(root + "/t")
    t.write_batch(spark.createDataFrame([(1, "a")], "id long, s string"))
    wide = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    )
    # Strict by default: never silently drop source data.
    with pytest.raises(ValueError, match="evolve"):
        t.merge(spark, wide, key_cols=["id"])
    t.merge(spark, wide, key_cols=["id"], evolve=True)
    df = t.read(spark)
    assert df.columns == ["id", "s", "score"]
    got = {r.id: r.score for r in df.collect()}
    assert got == {1: None, 2: 9.5}  # old rows surface NULL
    assert len(t.table_schema().fields) == 3  # schema evolved in-commit


def test_evolve_schema_guards(spark, root):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame([(1, "a", "x")], "id long, s string, par string"),
        partition_by=["par"],
    )
    # Omitted partition_by KEEPS the partitioning (used to reset to []).
    t.evolve_schema(
        StructType(
            [
                StructField("id", LongType()),
                StructField("s", StringType()),
                StructField("par", StringType()),
                StructField("extra", LongType()),
            ]
        )
    )
    assert t.snapshot()["metaData"]["partitionColumns"] == ["par"]
    # Changing partition columns on a non-empty table is refused.
    with pytest.raises(ValueError, match="directory layouts"):
        t.evolve_schema(t.table_schema(), partition_by=["s"])
    # Type changes on existing columns are refused.
    with pytest.raises(ValueError, match="type change"):
        t.evolve_schema(
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("s", StringType()),
                    StructField("par", StringType()),
                ]
            )
        )


def test_incremental_clustering_skips_already_clustered(spark, root):
    from pyspark.sql import functions as F

    t = DeltaLikeTable(root + "/t")
    t.write_batch(
        spark.createDataFrame(
            [(i, i % 7) for i in range(100)], "id long, k long"
        ).repartition(3)
    )
    # Full clustering pass tags every output file.
    t.optimize(spark, cluster_by=["id"], incremental=True)
    clustered = {f["path"] for f in t._live_files()}
    assert all(
        f.get("clusteredBy", {}).get("keys") == ["id"]
        for f in t._live_files()
    )

    # Idempotence: nothing new -> the next incremental pass is a no-op.
    res = t.optimize(spark, cluster_by=["id"], incremental=True)
    assert res.skipped
    assert {f["path"] for f in t._live_files()} == clustered

    # New append: ONLY the new file rewrites; the clustered generation
    # survives untouched.
    t.write_batch(
        spark.createDataFrame(
            [(1000 + i, i % 7) for i in range(50)], "id long, k long"
        ).coalesce(1)
    )
    res = t.optimize(spark, cluster_by=["id"], incremental=True)
    assert not res.skipped
    after = {f["path"] for f in t._live_files()}
    assert clustered <= after  # first generation untouched
    assert t.read(spark).count() == 150
    # Point predicate pruning: at most one file per clustering
    # generation may match.
    assert len(t.files_for([("id", "=", 3)])) <= 2

    # A FULL pass (incremental=False) still rewrites everything.
    res = t.optimize(spark, cluster_by=["id"])
    assert not res.skipped
    assert clustered.isdisjoint({f["path"] for f in t._live_files()})
