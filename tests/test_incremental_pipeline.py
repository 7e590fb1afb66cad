"""Incremental curation driven by the change data feed.

The 100 TB operating mode for a curation pipeline is incremental: new
document batches land in a raw table continuously, and each poll must
process ONLY the delta — quality-filter the new rows, drop any that
duplicate the already-curated corpus or each other, and append the
survivors. The invariant proven here is the one that matters: after
every poll, the incrementally-maintained curated table equals a full
batch recompute over the raw table from scratch. Poll cost tracks the
CHANGE RATE (feed rows + an anti-join against the curated keys), never
raw-table size.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.dedup import exact_dedup_normalized
from kafka_delta_ingest_spark.operators.text import normalize_text, quality_score
from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="kdi-incr-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _curate_batch(df):
    """The per-poll curation core: quality gate + in-batch exact dedup."""
    q = df.filter(quality_score(F.col("text")) >= 0.4)
    return exact_dedup_normalized(q, "text", "doc_id")


def _full_recompute(spark, raw):
    """Golden path: the same pipeline over the WHOLE raw table."""
    return _curate_batch(raw.read(spark))


def _poll(spark, raw, curated, cursor):
    """One incremental poll: feed since cursor -> admit -> append."""
    head = raw.latest_version()
    feed = raw.table_changes(spark, cursor, head)
    batch = _curate_batch(
        feed.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_version"
        )
    ).withColumn("_nk", F.md5(normalize_text(F.col("text"))))
    if curated.table_schema() is not None:
        existing = curated.read(spark).select(
            F.md5(normalize_text(F.col("text"))).alias("_nk")
        )
        batch = batch.join(existing, "_nk", "left_anti")
    admitted = batch.drop("_nk")
    curated.write_batch(admitted, txn={"curator": head})
    return head


def test_incremental_equals_batch_recompute(spark, root):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
        .limit(60)
        .collect()
    )
    raw = DeltaLikeTable(root + "/raw")
    curated = DeltaLikeTable(root + "/curated")
    schema = "doc_id long, text string, lang string"

    # Batch 1: first 30 docs.
    raw.write_batch(spark.createDataFrame(docs[:30], schema))
    raw.enable_cdf()
    cursor = -1
    cursor = _poll(spark, raw, curated, cursor)
    golden = {r.doc_id for r in _full_recompute(spark, raw).collect()}
    got = {r.doc_id for r in curated.read(spark).collect()}
    assert got == golden and len(got) > 0

    # Batch 2: 20 fresh docs PLUS 5 re-submissions of batch-1 text
    # under new ids (cross-batch dupes) and one in-batch dupe pair.
    resub = [
        (1000 + i, docs[i].text, docs[i].lang) for i in range(5)
    ]
    inbatch_dupe = [(2000, docs[31].text, docs[31].lang)]
    raw.write_batch(
        spark.createDataFrame(
            [tuple(d) for d in docs[30:50]] + resub + inbatch_dupe, schema
        )
    )
    cursor = _poll(spark, raw, curated, cursor)
    golden = {r.doc_id for r in _full_recompute(spark, raw).collect()}
    got = {r.doc_id for r in curated.read(spark).collect()}
    assert got == golden
    # The cross-batch re-submissions were rejected by the curated-key
    # anti-join, the in-batch dupe by the batch dedup.
    assert not any(i >= 1000 for i in got)

    # Batch 3: the last 10 docs; replaying the SAME poll twice must be
    # idempotent (txn ledger skips the second write).
    raw.write_batch(spark.createDataFrame([tuple(d) for d in docs[50:]], schema))
    head = raw.latest_version()
    feed_cursor = cursor
    cursor = _poll(spark, raw, curated, feed_cursor)
    n_after = curated.read(spark).count()
    _poll(spark, raw, curated, feed_cursor)  # replay, same cursor
    assert curated.read(spark).count() == n_after
    golden = {r.doc_id for r in _full_recompute(spark, raw).collect()}
    got = {r.doc_id for r in curated.read(spark).collect()}
    assert got == golden


def test_poll_reads_only_the_delta(spark, root):
    """The feed for a poll must contain exactly the rows appended since
    the cursor — the incremental-cost contract."""
    raw = DeltaLikeTable(root + "/raw")
    raw.write_batch(
        spark.createDataFrame([(i, f"t{i}") for i in range(100)], "doc_id long, text string")
    )
    raw.enable_cdf()
    v1 = raw.latest_version()
    raw.write_batch(
        spark.createDataFrame([(100 + i, f"t{100+i}") for i in range(7)], "doc_id long, text string")
    )
    feed = raw.table_changes(spark, v1)
    assert feed.count() == 7  # never the 100-row backlog
    assert {r._change_type for r in feed.collect()} == {"insert"}


def test_change_feed_cursor_replication(spark, root):
    """The productized poller: replicate_into maintains a mirror with a
    durable cursor; replayed and empty polls are no-ops."""
    from kafka_delta_ingest_spark.streaming.feed import (
        ChangeFeedCursor,
        replicate_into,
    )

    src = DeltaLikeTable(root + "/src")
    dst = DeltaLikeTable(root + "/dst")
    cursor = root + "/cursor.json"
    src.write_batch(
        spark.createDataFrame([(i, i) for i in range(10)], "id long, val long")
    )
    src.enable_cdf()

    h1 = replicate_into(spark, src, dst, ["id"], cursor)
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )

    src.update_where(spark, {"val": "val + 100"}, [("id", "<", 3)])
    src.delete_where(spark, [("id", "=", 9)])
    h2 = replicate_into(spark, src, dst, ["id"], cursor)
    assert h2 > h1
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )

    # Empty poll: cursor already at head, destination untouched.
    v_dst = dst.latest_version()
    assert replicate_into(spark, src, dst, ["id"], cursor) == h2
    assert dst.latest_version() == v_dst

    # Crash-replay: a stale cursor re-polls the same range; MERGE over
    # the same net changes is idempotent and the mirror still matches.
    ChangeFeedCursor(src, cursor).ack(h1)
    replicate_into(spark, src, dst, ["id"], cursor)
    assert sorted(map(tuple, dst.read(spark).collect())) == sorted(
        map(tuple, src.read(spark).collect())
    )
