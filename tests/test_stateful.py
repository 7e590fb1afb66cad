"""Stateful streaming (applyInPandasWithState) + bucketed range join.

The offset-dedup operator mirrors the reference's per-partition
ValueBuffer guard (reference src/value_buffers.rs:14-35, tested there by
value_buffers_test src/value_buffers.rs:126-240): offsets must strictly
increase per partition, replays are rejected — here proven *across*
micro-batches through checkpointed state.
"""

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_delta_ingest_spark.operators.joins import range_join
from kafka_delta_ingest_spark.streaming.stateful import (
    stateful_offset_dedup,
    stateful_running_totals,
)

SCHEMA = StructType(
    [
        StructField("kafka_partition", IntegerType()),
        StructField("kafka_offset", LongType()),
        StructField("payload", StringType()),
    ]
)


def _write_batch(spark, path, rows, n_file):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("append").parquet(path)
    # FileStreamSource orders by modification time; keep batches apart.
    time.sleep(0.05)
    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) == n_file


def test_offset_dedup_state_survives_across_microbatches(spark):
    src = tempfile.mkdtemp(prefix="kdi-stateful-src-")
    ckpt = tempfile.mkdtemp(prefix="kdi-stateful-ckpt-")
    try:
        # Batch 1: partition 0 offsets 0-2 (offset 1 duplicated in-batch),
        # partition 1 offset 10.
        _write_batch(
            spark,
            src,
            [(0, 0, "a"), (0, 1, "b"), (0, 1, "b-dup"), (0, 2, "c"), (1, 10, "x")],
            1,
        )
        # Memory sink cannot recover from a checkpoint, so collect emitted
        # rows via foreachBatch (runs on the driver in local mode).
        emitted: list[tuple] = []

        def sink(batch_df, _bid):
            emitted.extend(
                (r.kafka_partition, r.kafka_offset) for r in batch_df.collect()
            )

        stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
        deduped = stateful_offset_dedup(stream)
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert set(emitted) == {(0, 0), (0, 1), (0, 2), (1, 10)}

        # Batch 2: replay of old offsets (≤ state) must be dropped even
        # though this is a brand-new micro-batch; genuinely new offsets pass.
        _write_batch(
            spark, src, [(0, 1, "replay"), (0, 2, "replay"), (0, 3, "d"), (1, 9, "old")], 2
        )
        emitted.clear()
        q2 = (
            stateful_offset_dedup(
                spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        # Only the one new offset comes through; replays and the stale
        # partition-1 offset 9 are rejected by checkpointed state.
        assert set(emitted) == {(0, 3)}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_running_totals_accumulate_across_batches(spark):
    src = tempfile.mkdtemp(prefix="kdi-totals-src-")
    ckpt = tempfile.mkdtemp(prefix="kdi-totals-ckpt-")
    sch = StructType([StructField("user_id", LongType()), StructField("value", LongType())])
    try:
        spark.createDataFrame([(1, 10), (1, 5), (2, 7)], sch).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.05)
        spark.createDataFrame([(1, 1), (3, 2)], sch).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        out = stateful_running_totals(
            spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
            key_col="user_id",
            value_col="value",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("totals_sink")
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("totals_sink").collect()
        # Memory sink in update mode appends each emission; the LAST
        # emission per key is the lifetime total.
        final = {}
        for r in rows:
            final[r.user_id] = (r.n_events, r.total_value_micros)
        assert final[1] == (3, 16_000_000)
        assert final[2] == (1, 7_000_000)
        assert final[3] == (1, 2_000_000)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_offset_dedup_works_on_batch_frames(spark):
    df = spark.createDataFrame(
        [(0, 5, "a"), (0, 5, "a2"), (0, 7, "b"), (1, 5, "c")], SCHEMA
    )
    got = {
        (r.kafka_partition, r.kafka_offset)
        for r in stateful_offset_dedup(df).collect()
    }
    assert got == {(0, 5), (0, 7), (1, 5)}


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def test_range_join_numeric_half_open(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 35)], "pid int, v int"
    )
    intervals = spark.createDataFrame(
        [(100, 0, 10), (200, 10, 20), (300, 30, 40)], "iid int, s int, e int"
    )
    out = range_join(points, intervals, "v", "s", "e", bucket_width=7)
    got = {(r.pid, r.iid) for r in out.collect()}
    # v=10 is excluded from [0,10) and included in [10,20); v=20 matches
    # nothing ([10,20) is half-open, [30,40) starts later).
    assert got == {(1, 100), (2, 200), (3, 200), (5, 300)}


def test_range_join_matches_naive_theta_join(spark):
    points = spark.range(0, 500).select(
        F.col("id").alias("pid"), (F.col("id") * 13 % 211).alias("v")
    )
    intervals = spark.range(0, 40).select(
        F.col("id").alias("iid"),
        (F.col("id") * 5).alias("s"),
        (F.col("id") * 5 + F.col("id") % 11 + 1).alias("e"),
    )
    fast = range_join(points, intervals, "v", "s", "e", bucket_width=8).select(
        "pid", "iid", "v", "s", "e"
    )
    naive = points.join(
        intervals, (points.v >= intervals.s) & (points.v < intervals.e)
    ).select("pid", "iid", "v", "s", "e")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_range_join_timestamps_with_keys(spark):
    points = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:05:00"), (2, 7, "2024-01-01 00:25:00"), (3, 8, "2024-01-01 00:05:00")],
        "eid int, user int, ts string",
    ).select("eid", "user", F.col("ts").cast("timestamp_ntz").alias("ts"))
    intervals = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "2024-01-01 00:10:00")],
        "user int, s string, e string",
    ).select(
        "user",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    out = range_join(points, intervals, "ts", "s", "e", bucket_width=3600, on=["user"])
    assert {r.eid for r in out.collect()} == {1}


def test_range_join_subsecond_timestamps(spark):
    """A point in the same truncated second as a fractional interval end
    must still match (micro-precision bucketing; second-truncation would
    drop it into an uncovered bucket)."""
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:59:59.2"), (2, "2024-01-01 00:59:59.8")],
        "eid int, ts string",
    ).select("eid", F.col("ts").cast("timestamp_ntz").alias("ts"))
    intervals = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", "2024-01-01 00:59:59.5")], "iid int, s string, e string"
    ).select(
        "iid",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    out = range_join(points, intervals, "ts", "s", "e", bucket_width=3600)
    assert {r.eid for r in out.collect()} == {1}  # .2 < end .5 ≤ .8


def test_range_join_inverted_interval_no_explosion(spark):
    """A corrupt interval with end <= start (here spanning ~3e9 bucket
    widths backwards) must be dropped before bucket explosion — it can
    match nothing under [start, end) — instead of emitting one exploded
    row per bucket between the endpoints."""
    points = spark.createDataFrame([(1, 5), (2, 15)], "pid int, v int")
    intervals = spark.createDataFrame(
        [(100, 0, 10), (666, 3_000_000_000, -3_000_000_000), (777, 7, 7)],
        "iid long, s long, e long",
    )
    out = range_join(points, intervals, "v", "s", "e", bucket_width=1)
    got = {(r.pid, r.iid) for r in out.collect()}  # completes instantly
    assert got == {(1, 100)}


def test_stateful_funnel_progresses_across_microbatches(spark):
    from datetime import datetime

    from pyspark.sql.types import TimestampType

    from kafka_delta_ingest_spark.streaming.stateful import stateful_funnel

    src = tempfile.mkdtemp(prefix="kdi-funnel-src-")
    ckpt = tempfile.mkdtemp(prefix="kdi-funnel-ckpt-")
    sch = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
        ]
    )

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    try:
        # Batch 1: u1 views; u2 clicks (no view yet -> stage 0).
        spark.createDataFrame(
            [(1, t(1), "view"), (2, t(1), "click")], sch
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)
        # Batch 2: u1 clicks then purchases (advances 1->3 using the
        # anchor carried in state); u2 views (enters stage 1); u3 does
        # click-at-same-ts-as-view -> strict > keeps it at stage 1.
        spark.createDataFrame(
            [
                (1, t(2), "click"),
                (1, t(3), "purchase"),
                (2, t(5), "view"),
                (3, t(7), "view"),
                (3, t(7), "click"),
            ],
            sch,
        ).coalesce(1).write.mode("append").parquet(src)

        latest: dict[int, tuple] = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                latest[r.user_id] = (r.stage, r.step)

        q = (
            stateful_funnel(
                spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src),
                ["view", "click", "purchase"],
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert latest == {
            1: (3, "purchase"),
            2: (1, "view"),
            3: (1, "view"),
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
