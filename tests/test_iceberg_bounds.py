"""Iceberg column metrics + bounds-based file skipping.

The writer stamps every manifest data_file entry with
null_value_counts / lower_bounds / upper_bounds from the parquet
FOOTERS (spec Appendix D single-value binary serialization, string
bounds truncated to 16 code points with the upper bound incremented —
write.metadata.metrics truncate(16)); plan_files(row_filter=...)
then prunes files whose bounds provably exclude the predicate — the
Iceberg leg's analog of the Delta add-action stats (P8). Delete files
are never pruned, and bounds-less manifests (older writers, the
fixture writer) stay unpruned-but-readable.
"""

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.iceberg import (
    IcebergWriter,
    bound_from_bytes,
    bound_to_bytes,
    plan_files,
    read_iceberg,
    _truncate_bounds_str,
)

FIELDS = [
    {"id": 1, "name": "id", "type": "long", "required": False},
    {"id": 2, "name": "s", "type": "string", "required": False},
    {"id": 3, "name": "v", "type": "double", "required": False},
]


def test_bound_serialization_roundtrip():
    cases = [
        (42, "int"), (-7, "int"),
        (1 << 40, "long"), (-(1 << 40), "long"),
        (3.5, "float"), (2.25, "double"),
        (True, "boolean"), (False, "boolean"),
        ("iceberg", "string"), ("", "string"),
    ]
    for v, t in cases:
        b = bound_to_bytes(v, t)
        assert bound_from_bytes(b, t) == v, (v, t)
    # spec widths: little-endian fixed-size numerics
    assert bound_to_bytes(1, "int") == b"\x01\x00\x00\x00"
    assert len(bound_to_bytes(1, "long")) == 8
    assert bound_to_bytes(None, "long") is None


def test_string_truncation_increments_upper():
    lo, hi = _truncate_bounds_str("a" * 40, "b" * 40)
    assert lo == "a" * 16
    assert hi == "b" * 15 + "c"  # prefix incremented: >= every "bbb…"
    assert hi > "b" * 40
    # short bounds pass through exact
    assert _truncate_bounds_str("aa", "zz") == ("aa", "zz")
    # un-incrementable upper (all at the max code point) is omitted
    lo2, hi2 = _truncate_bounds_str("a", chr(0x10FFFF) * 20)
    assert hi2 is None


def _seeded(spark, tmp_path, name):
    t = str(tmp_path / name)
    w = IcebergWriter(t, FIELDS)
    # three appends with DISJOINT id ranges -> tight per-file bounds
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(i, f"k{i:05d}", float(i)) for i in range(lo, lo + 50)],
            "id long, s string, v double",
        ).coalesce(1)
        w.append(df, ts_ms=1000 + lo)
    return t, w


def test_row_filter_prunes_files_at_plan_time(spark, tmp_path):
    t, _w = _seeded(spark, tmp_path, "b1")
    all_files, _, _, _ = plan_files(t)
    assert len(all_files) == 3
    # files hold ids 0-49 / 100-149 / 200-249
    pruned, _, _, _ = plan_files(t, row_filter=[("id", ">", 120)])
    assert len(pruned) == 2  # 100-149 straddles, 200-249 qualifies
    pruned2, _, _, _ = plan_files(t, row_filter=[("id", ">=", 220)])
    assert len(pruned2) == 1
    eq, _, _, _ = plan_files(t, row_filter=[("id", "=", 120)])
    assert len(eq) == 1
    # conjunction: impossible range -> nothing survives
    none, _, _, _ = plan_files(
        t, row_filter=[("id", ">", 120), ("id", "<", 100)]
    )
    assert none == []


def test_row_filter_read_matches_plain_filter(spark, tmp_path):
    t, _w = _seeded(spark, tmp_path, "b2")
    got = (
        read_iceberg(spark, t, row_filter=[("id", ">=", 205)])
        .orderBy("id").collect()
    )
    want = (
        read_iceberg(spark, t).filter("id >= 205").orderBy("id")
        .collect()
    )
    assert got == want and len(got) == 45
    # the pruned read scanned ONE file, the plain read all three
    pruned_df = read_iceberg(spark, t, row_filter=[("id", ">=", 205)])
    assert len(pruned_df.inputFiles()) == 1


def test_string_bounds_prune(spark, tmp_path):
    t, _w = _seeded(spark, tmp_path, "b3")
    pruned, _, _, _ = plan_files(t, row_filter=[("s", ">", "k00210")])
    assert len(pruned) == 1
    got = read_iceberg(
        spark, t, row_filter=[("s", ">", "k00210")]
    ).count()
    assert got == 39  # k00211..k00249


def test_deletes_survive_bounds_pruning(spark, tmp_path):
    t, w = _seeded(spark, tmp_path, "b4")
    # equality-delete two ids inside the 200-249 file
    src = spark.createDataFrame(
        [(205, "k00205", -1.0), (206, "gone", -2.0)],
        "id long, s string, v double",
    )
    w.upsert(src, ["id"], ts_ms=5000)
    got = {
        r["id"]: r["s"]
        for r in read_iceberg(
            spark, t, row_filter=[("id", ">=", 200)]
        ).collect()
    }
    assert len(got) == 50  # every key once: upsert masked the old rows
    assert got[206] == "gone"


def test_boundless_manifests_still_plan_and_read(spark, tmp_path):
    """Manifests written before bounds existed (or by the fixture
    writer) lack the metrics fields entirely — row_filter must keep
    their files (unbounded), never raise."""
    from kafka_delta_ingest_spark.iceberg import IcebergFixtureWriter

    t = str(tmp_path / "b5")
    w = IcebergFixtureWriter(
        t,
        [
            {"id": 1, "name": "doc_id", "type": "long",
             "required": False},
        ],
    )
    w.append([{"doc_id": i} for i in range(10)], ts_ms=1000)
    files, _, _, _ = plan_files(t, row_filter=[("doc_id", ">", 1)])
    assert files  # nothing pruned, nothing broken
    assert read_iceberg(
        spark, t, row_filter=[("doc_id", ">", 1)]
    ).count() > 0


def test_unknown_filter_column_raises(spark, tmp_path):
    t, _w = _seeded(spark, tmp_path, "b6")
    with pytest.raises(ValueError, match="unknown filter column"):
        plan_files(t, row_filter=[("nope", ">", 1)])
