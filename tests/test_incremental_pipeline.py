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


def _doc_rows(spark, lo, hi):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(hi)
        .collect()[lo:hi]
    )


def test_indexed_admission_equals_stateless(spark):
    """incremental_ngram_dedup_indexed over build_gram_index(existing)
    must admit exactly the rows the stateless form admits — the
    contract that lets a steady-state deployment swap corpus
    re-shingling for one persisted-index scan."""
    from kafka_delta_ingest_spark.operators.dedup import (
        build_gram_index,
        incremental_ngram_dedup,
        incremental_ngram_dedup_indexed,
    )

    docs = _doc_rows(spark, 0, 40)
    schema = "doc_id long, text string"
    existing = spark.createDataFrame([(d.doc_id, d.text) for d in docs[:25]], schema)
    # incoming: 10 fresh docs + near-dup resubmissions of corpus text
    # (one word appended: high-Jaccard, not exact) + an intra-batch
    # near-dup pair.
    incoming_rows = [(10_000 + i, docs[25 + i].text) for i in range(10)]
    incoming_rows += [
        (20_000 + i, docs[i].text + " extra") for i in range(4)
    ]
    incoming_rows += [(30_000, docs[30].text), (30_001, docs[30].text + " tail")]
    incoming = spark.createDataFrame(incoming_rows, schema)

    stateless = incremental_ngram_dedup(
        existing, incoming, "doc_id", "text", n=3, threshold=0.5
    )
    index = build_gram_index(existing, "doc_id", "text", n=3)
    indexed = incremental_ngram_dedup_indexed(
        index, incoming, "doc_id", "text", n=3, threshold=0.5
    )
    got_a = sorted(r.doc_id for r in stateless.collect())
    got_b = sorted(r.doc_id for r in indexed.collect())
    assert got_a == got_b
    # the resubmissions and the higher intra-batch twin must be gone,
    # the fresh docs admitted
    assert all(i < 20_000 or i == 30_000 for i in got_b)
    assert {10_000 + i for i in range(10)} <= set(got_b)


def test_gram_index_append_invariant(spark):
    """Appending an admitted batch's grams to the index and admitting
    the NEXT batch equals the stateless form run against
    corpus ∪ admitted — the index stays a faithful corpus mirror
    across polls."""
    from kafka_delta_ingest_spark.operators.dedup import (
        build_gram_index,
        incremental_ngram_dedup,
        incremental_ngram_dedup_indexed,
    )

    docs = _doc_rows(spark, 0, 45)
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(d.doc_id, d.text) for d in docs[:20]], schema)
    batch1 = spark.createDataFrame(
        [(1_000 + i, docs[20 + i].text) for i in range(10)]
        + [(2_000, docs[0].text + " x")],
        schema,
    )
    batch2 = spark.createDataFrame(
        [(5_000 + i, docs[30 + i].text) for i in range(10)]
        # near-dups of batch-1 ADMITTED text — only the index append
        # can reject these
        + [(6_000 + i, docs[20 + i].text + " y") for i in range(3)],
        schema,
    )

    index = build_gram_index(corpus, "doc_id", "text", n=3)
    admitted1 = incremental_ngram_dedup_indexed(
        index, batch1, "doc_id", "text", n=3, threshold=0.5
    ).localCheckpoint()
    index2 = index.unionByName(
        build_gram_index(admitted1, "doc_id", "text", n=3)
    )
    admitted2 = incremental_ngram_dedup_indexed(
        index2, batch2, "doc_id", "text", n=3, threshold=0.5
    )

    golden_existing = corpus.unionByName(admitted1)
    golden2 = incremental_ngram_dedup(
        golden_existing, batch2, "doc_id", "text", n=3, threshold=0.5
    )
    assert sorted(r.doc_id for r in admitted2.collect()) == sorted(
        r.doc_id for r in golden2.collect()
    )
    # the batch-1-near-dup plants must be rejected by the appended index
    assert not any(
        6_000 <= r.doc_id < 7_000 for r in admitted2.collect()
    )
