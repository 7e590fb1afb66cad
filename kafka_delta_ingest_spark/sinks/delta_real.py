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

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    def optimize(self, spark: SparkSession, zorder_by: list[str] | None = None, **_):
        if zorder_by:
            cols = ", ".join(zorder_by)
            spark.sql(f"OPTIMIZE delta.`{self.path}` ZORDER BY ({cols})")
        else:
            spark.sql(f"OPTIMIZE delta.`{self.path}`")

    # -- DML / admin passthroughs ------------------------------------------
    # Same call surface as DeltaLikeTable, delegated to delta-spark; the
    # sink contract suite (tests/test_sink_contract.py) runs both sinks
    # through one comparator wherever the jars exist.

    def delete_where(self, spark: SparkSession, predicates: list[tuple], **_):
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, self.path).delete(_pred_sql(predicates))

    def update_where(
        self, spark: SparkSession, set_exprs: dict[str, str], predicates: list[tuple], **_
    ):
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, self.path).update(
            condition=_pred_sql(predicates), set=set_exprs
        )

    def merge(self, spark: SparkSession, source: DataFrame, key_cols: list[str], **_):
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in key_cols)
        (
            DeltaTable.forPath(spark, self.path)
            .alias("t")
            .merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def restore(self, spark: SparkSession, version: int):
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, self.path).restoreToVersion(version)

    def vacuum(self, spark: SparkSession, retention_ms: int = 7 * 24 * 3600 * 1000, **_):
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, self.path).vacuum(retention_ms / 3_600_000)

    def enable_cdf(self, spark: SparkSession | None = None):
        # Accept spark like every other passthrough (DeltaLikeTable's
        # enable_cdf needs none, so callers may omit it); only fall
        # back to the active session, with a clear error when absent.
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "enable_cdf: no SparkSession passed and no active "
                "session; pass spark explicitly"
            )
        spark.sql(
            f"ALTER TABLE delta.`{self.path}` SET TBLPROPERTIES "
            f"(delta.enableChangeDataFeed = true)"
        )

    def table_changes(
        self, spark: SparkSession, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        reader = (
            spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", from_version + 1)
        )
        if to_version is not None:
            reader = reader.option("endingVersion", to_version)
        return reader.load(self.path)

    def describe_history(self, spark: SparkSession) -> DataFrame:
        from delta.tables import DeltaTable

        return DeltaTable.forPath(spark, self.path).history()


def _pred_sql(predicates: list[tuple]) -> str:
    """(col, op, value) conjunction → a Delta condition string (same
    grammar DeltaLikeTable prunes with)."""
    parts = []
    for col, op, *rest in predicates:
        if op == "is_not_null":
            parts.append(f"`{col}` IS NOT NULL")
            continue
        v = rest[0]
        if isinstance(v, str):
            lit = "'" + v.replace("'", "''") + "'"  # SQL-escape quotes
        elif isinstance(v, bool):
            lit = "true" if v else "false"
        else:
            lit = repr(v)
        parts.append(f"`{col}` {op} {lit}")
    return " AND ".join(parts)
