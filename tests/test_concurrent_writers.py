"""Multi-writer optimistic concurrency on the Delta-style log.

The reference's flagship e2e runs 2 concurrent workers over 4 Kafka
partitions and asserts the exact id set 0..199 lands with no dupes or
loss (reference tests/emails_s3_tests.rs:21-77, coordinator-free by
design, doc/DESIGN.md:12,42). This is the same proof against our
commit protocol: many writers race `_commit`'s O_EXCL version claim;
every batch must land exactly once at a distinct version, and the
per-partition txn ledger must converge to the max offset per appId.
"""

import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


def test_concurrent_writers_no_loss_no_dupes(spark):
    root = tempfile.mkdtemp(prefix="kdi-conc-")
    try:
        path = root + "/t"
        DeltaLikeTable(path)  # init log dir

        n_writers, batches_per_writer, rows_per_batch = 4, 5, 10

        def work(w: int) -> list[int]:
            t = DeltaLikeTable(path)  # own handle, like a separate process
            versions = []
            for b in range(w * batches_per_writer, (w + 1) * batches_per_writer):
                lo = b * rows_per_batch
                df = spark.createDataFrame(
                    [(i, f"w{w}") for i in range(lo, lo + rows_per_batch)],
                    "id long, writer string",
                )
                res = t.write_batch(df, txn={f"app-{w}": b})
                assert not res.skipped
                versions.append(res.version)
            return versions

        with ThreadPoolExecutor(max_workers=n_writers) as ex:
            all_versions = [
                v for vs in ex.map(work, range(n_writers)) for v in vs
            ]

        # Every commit claimed a distinct version — no lost updates.
        assert len(all_versions) == len(set(all_versions)) == n_writers * batches_per_writer

        t = DeltaLikeTable(path)
        ids = [r.id for r in t.read(spark).select("id").collect()]
        expect = n_writers * batches_per_writer * rows_per_batch
        assert sorted(ids) == list(range(expect))  # exact set: no dupes, no loss

        # txn ledger converged to each writer's last batch number.
        snap = t.snapshot()
        for w in range(n_writers):
            assert snap["txn"][f"app-{w}"] == (w + 1) * batches_per_writer - 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_replay_after_race_is_skipped(spark):
    """A writer that loses its ack and replays the same (appId, version)
    txn must be skipped — the reference's AlreadyProcessedPartitionOffset
    path (src/value_buffers.rs:14-35) at the commit layer."""
    root = tempfile.mkdtemp(prefix="kdi-replay-")
    try:
        t = DeltaLikeTable(root + "/t")
        df = spark.createDataFrame([(1, "x")], "id long, v string")
        r1 = t.write_batch(df, txn={"app-0": 7})
        assert not r1.skipped
        r2 = t.write_batch(df, txn={"app-0": 7})  # replay
        assert r2.skipped
        assert t.read(spark).count() == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
