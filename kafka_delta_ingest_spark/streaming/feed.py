"""Durable-cursor change-feed consumption.

The productized form of the poll loop ``tests/test_incremental_pipeline.py``
drives by hand: a consumer holds a named cursor against a
``DeltaLikeTable`` and each ``poll`` returns exactly the rows committed
since its last acknowledged version. The cursor advances atomically
with the CONSUMER's own commit (ride the ``txn`` ledger of the
destination table) or, for side-effect consumers, via ``ack`` writing a
cursor file with the same tmp+rename discipline the sink's checkpoints
use. Either way a crashed consumer resumes from its last durable
position and reprocesses at most one poll — the same at-least-once +
idempotent-write contract the reference's offset ledger gives the Kafka
path (reference src/offsets.rs:36-102).

At 100 TB the property that matters: a poll's cost is the CHANGE RATE
(the cdc/add files of the new versions), never the table size — the
feed reader opens only files committed inside the polled version range.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from kafka_delta_ingest_spark.sinks.delta_like import DeltaLikeTable


class ChangeFeedCursor:
    """A named, durable position in a table's change feed."""

    def __init__(self, table: DeltaLikeTable, cursor_path: str, name: str = "consumer"):
        self.table = table
        self.cursor_path = cursor_path
        self.name = name

    def position(self) -> int:
        """Last acknowledged version (-1 before the first ack)."""
        try:
            with open(self.cursor_path) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return -1

    def poll(self, spark: SparkSession) -> tuple[DataFrame | None, int]:
        """(changes since the cursor, head version to ack).

        The frame is the ``table_changes`` slice ``(position, head]``,
        or ``None`` when nothing new landed — the head check costs one
        directory listing, so an idle poll never touches the log
        replay at all. The returned head is what ``ack`` must receive
        AFTER the consumer durably processed the frame; acknowledging
        before processing turns at-least-once into at-most-once."""
        head = self.table.latest_version()
        pos = self.position()
        if head <= pos:
            return None, head
        return self.table.table_changes(spark, pos, head), head

    def ack(self, head: int) -> None:
        """Durably advance the cursor (tmp + atomic rename)."""
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": int(head), "name": self.name}, f)
        os.replace(tmp, self.cursor_path)


def replicate_into(
    spark: SparkSession,
    source: DeltaLikeTable,
    dest: DeltaLikeTable,
    key_cols: list[str],
    cursor_path: str,
) -> int:
    """One replication poll: apply the source's new changes to ``dest``
    and advance the side-file cursor.

    Delivery is AT-LEAST-ONCE with an idempotent apply: the cursor acks
    only after ``apply_changes`` commits, so a crash between apply and
    ack replays exactly one poll — and replaying the same feed slice
    re-derives the same net-effect-per-key changes, for which MERGE is
    idempotent, so the replica converges to the same state. An idle
    poll is one directory listing (no log replay, no Spark job).
    Returns the head version applied (or the current one if nothing
    new)."""
    cur = ChangeFeedCursor(source, cursor_path, name="cdf-replica")
    frame, head = cur.poll(spark)
    if frame is None:
        return head
    dest.apply_changes(spark, frame, key_cols=key_cols)
    cur.ack(head)
    return head
