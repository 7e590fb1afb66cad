"""Production sink: real Delta Lake (delta-spark) when the jars are on
the classpath; the same IngestJob plumbing plugs into either this or
:class:`DeltaLikeTable` (the jar-free twin used in tests).

Semantics mapping to the reference:

* **Exactly-once**: Delta's idempotent-write options ``txnAppId`` /
  ``txnVersion`` (one pair per commit) carry the streaming epoch —
  Spark's checkpoint + Delta's transaction protocol replace the
  reference's hand-rolled per-partition conflict loop
  (reference src/lib.rs:966-1024).
* **Cross-engine ledger parity**: the reference's per-Kafka-partition
  ``txn {appId: "<app_id>-<p>", version: <offset>}`` actions
  (src/delta_helpers.rs:15-40) cannot be expressed as multiple Delta
  idempotent-write pairs in one commit, so the per-partition offsets are
  mirrored into ``commitInfo.userMetadata`` — readable by any engine
  that can read the Delta log, which is what the reference's ledger is
  for (SURVEY §4 "exactly-once via per-source-partition txn offsets
  readable by other engines").
* Optimistic concurrency, checkpoints every 10 commits, stats, and
  Snappy parquet are Delta-on-Spark native.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class RealDeltaTable:
    """Delta Lake table with the :class:`DeltaLikeTable` write API."""

    def __init__(self, path: str):
        if not delta_available():
            raise RuntimeError(
                "delta-spark is not installed; use DeltaLikeTable (same "
                "semantics, no jars) or add io.delta:delta-spark to the "
                "session packages"
            )
        self.path = path.rstrip("/")

    def table_schema(self):
        from delta.tables import DeltaTable

        spark = SparkSession.getActiveSession()
        return DeltaTable.forPath(spark, self.path).toDF().schema

    def write_batch(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        txn: dict[str, int] | None = None,
        app_id: str = "kafka_delta_ingest",
        epoch_id: int | None = None,
    ):
        """Append with idempotent-write txn + per-partition offset mirror."""
        writer = df.write.format("delta").mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if epoch_id is not None:
            writer = writer.option("txnAppId", app_id).option(
                "txnVersion", str(epoch_id)
            )
        if txn:
            writer = writer.option("userMetadata", json.dumps({"kdiOffsets": txn}))
        writer.save(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("delta").load(self.path)

    def optimize(self, spark: SparkSession, **_):
        spark.sql(f"OPTIMIZE delta.`{self.path}`")
