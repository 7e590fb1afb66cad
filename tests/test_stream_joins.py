"""Stream-stream interval join, watermark-bounded dedup, and streaming
session windows on real (file-source) streams.

The reference has none of these by design (doc/DESIGN.md:52); they are
the Structured-Streaming-native extensions of the build plan. Each test
drives an actual streaming query — not a batch stand-in — so the
watermark/state semantics exercised are the ones a production stream
hits.
"""

import datetime
import shutil
import tempfile

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.streaming.joins import (
    dedup_within_watermark,
    interval_join,
)
from kafka_delta_ingest_spark.streaming.windows import streaming_session_window


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def _run(stream_df, ckpt, mode="append"):
    rows = []

    def sink(bdf, _bid):
        rows.extend(bdf.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return rows


def test_stream_stream_interval_join(spark):
    d = tempfile.mkdtemp(prefix="kdi-ssj-")
    try:
        imp, clk, ckpt = d + "/imp", d + "/clk", d + "/ckpt"
        spark.createDataFrame(
            [(1, _ts(0)), (2, _ts(5)), (3, _ts(10))], "ad int, imp_ts timestamp"
        ).coalesce(1).write.parquet(imp)
        spark.createDataFrame(
            # ad1 click 20min after impression (inside 30min bound),
            # ad2 click 40min after (outside), ad3 click before (excluded).
            [(1, _ts(20)), (2, _ts(45)), (3, _ts(9))],
            "ad int, clk_ts timestamp",
        ).coalesce(1).write.parquet(clk)

        out = interval_join(
            spark.readStream.schema("ad int, imp_ts timestamp").parquet(imp),
            spark.readStream.schema("ad int, clk_ts timestamp").parquet(clk),
            on="ad",
            left_ts="imp_ts",
            right_ts="clk_ts",
            lower="0 seconds",
            upper="30 minutes",
        )
        rows = _run(out.select(F.col("imp_ts"), F.col("clk_ts")), ckpt)
        assert len(rows) == 1
        assert rows[0].imp_ts == _ts(0) and rows[0].clk_ts == _ts(20)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_interval_join_batch_twin_same_semantics(spark):
    imp = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(5)), (3, _ts(10))], "ad int, imp_ts timestamp"
    )
    clk = spark.createDataFrame(
        [(1, _ts(20)), (2, _ts(45)), (3, _ts(9))], "ad int, clk_ts timestamp"
    )
    got = interval_join(
        imp, clk, on="ad", left_ts="imp_ts", right_ts="clk_ts", upper="30 minutes"
    )
    assert [r[0] for r in got.select(imp.ad).collect()] == [1]


def test_dedup_within_watermark_bounded_state(spark):
    d = tempfile.mkdtemp(prefix="kdi-wmdedup-")
    try:
        src, ckpt = d + "/src", d + "/ckpt"
        spark.createDataFrame(
            [(10, _ts(0)), (10, _ts(1)), (11, _ts(2)), (11, _ts(2)), (12, _ts(3))],
            "k int, ts timestamp",
        ).coalesce(1).write.parquet(src)
        out = dedup_within_watermark(
            spark.readStream.schema("k int, ts timestamp").parquet(src),
            keys=["k"],
            ts_col="ts",
            watermark="10 minutes",
        )
        rows = _run(out, ckpt)
        assert sorted(r.k for r in rows) == [10, 11, 12]
        # Batch path: plain dropDuplicates.
        b = dedup_within_watermark(
            spark.createDataFrame([(1, _ts(0)), (1, _ts(1))], "k int, ts timestamp"),
            keys=["k"],
            ts_col="ts",
            watermark="10 minutes",
        )
        assert b.count() == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_session_window_on_stream(spark):
    d = tempfile.mkdtemp(prefix="kdi-sesswin-")
    try:
        src, ckpt = d + "/src", d + "/ckpt"
        # user 1: events at 0,2 min (one session, 5-min gap), then 20 min
        # (second session). user 2: one event. In append mode a session
        # emits only when the watermark passes its end, so a second file
        # carries a far-future flush event (user 99) that advances the
        # watermark past every real session.
        import time as _time

        spark.createDataFrame(
            [(1, _ts(0)), (1, _ts(2)), (1, _ts(20)), (2, _ts(1))],
            "user_id int, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.05)
        spark.createDataFrame(
            [(99, datetime.datetime(2024, 1, 1, 6, 0, 0))], "user_id int, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

        out = streaming_session_window(
            spark.readStream.schema("user_id int, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 minute"),
            ts_col="ts",
            user_col="user_id",
            gap="5 minutes",
        )
        rows = _run(out, ckpt, mode="append")
        got = sorted((r.user_id, r.n_events) for r in rows if r.user_id != 99)
        assert got == [(1, 1), (1, 2), (2, 1)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_enrich_stream_static_broadcast_dim(spark):
    from kafka_delta_ingest_spark.streaming.joins import enrich_stream_static

    d = tempfile.mkdtemp(prefix="kdi-enrich-")
    try:
        src, ckpt = d + "/src", d + "/ckpt"
        spark.createDataFrame(
            [(1, 100), (2, 200), (3, 999)], "event_id int, user_id int"
        ).coalesce(1).write.parquet(src)
        dim = spark.createDataFrame(
            [(100, "gold"), (200, "basic")], "user_id int, tier string"
        )
        out = enrich_stream_static(
            spark.readStream.schema("event_id int, user_id int").parquet(src),
            dim,
            on="user_id",
        )
        assert out.isStreaming
        rows = _run(out, ckpt)
        got = {r.event_id: r.tier for r in rows}
        # left join: unmatched user keeps the event with a null tier.
        assert got == {1: "gold", 2: "basic", 3: None}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_decontaminate_stream_per_microbatch(spark):
    """Decontamination in a STREAMING pipeline: Spark disallows an
    anti-join whose flag set derives from the stream itself, so the
    operator runs inside foreachBatch — each micro-batch is scrubbed
    against the static benchmark with the exact batch operator before
    it is committed (the same pattern the CDC-apply sink uses)."""
    from kafka_delta_ingest_spark.operators.decontam import decontaminate

    d = tempfile.mkdtemp(prefix="kdi-deconstream-")
    try:
        src, ckpt = d + "/src", d + "/ckpt"
        docs = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally clean document about watermark state eviction policies"),
        ]
        spark.createDataFrame(docs, "doc_id long, text string").coalesce(
            1
        ).write.parquet(src)
        bench = spark.createDataFrame(
            [(100, docs[0][1])], "bench_id long, text string"
        )
        survivors = []

        def sink(bdf, _bid):
            survivors.extend(decontaminate(bdf, bench, n=8).collect())

        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert {r.doc_id for r in survivors} == {2, 3}
    finally:
        shutil.rmtree(d, ignore_errors=True)
