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

    def poll(self, spark: SparkSession) -> tuple[DataFrame, int]:
        """(changes since the cursor, head version to ack).

        The frame is the ``table_changes`` slice ``(position, head]`` —
        empty when nothing new landed. The returned head is what
        ``ack`` must receive AFTER the consumer durably processed the
        frame; acknowledging before processing turns at-least-once into
        at-most-once."""
        head = self.table.latest_version()
        frame = self.table.table_changes(spark, self.position(), head)
        return frame, head

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
    and advance the cursor, exactly-once.

    The cursor here is the DESTINATION's txn ledger (appId
    ``cdf-replica``), not a side file: ``apply_changes`` lands the
    changes and the ``txn`` action in ONE commit... the jar-free sink's
    merge path records no txn, so this helper instead checks the ledger
    BEFORE applying and skips an already-applied head — a replayed poll
    (crash between apply and cursor write) re-derives the same net
    changes and MERGE is idempotent for them, so the replica converges
    regardless. Returns the head version applied (or the current one if
    nothing new)."""
    cur = ChangeFeedCursor(source, cursor_path, name="cdf-replica")
    frame, head = cur.poll(spark)
    if head <= cur.position():
        return head
    dest.apply_changes(spark, frame, key_cols=key_cols)
    cur.ack(head)
    return head
