"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a small/under-partitioned input to cluster width
    before expression-heavy per-row work (shingling, hashing, scoring).

    A 100 TB table arrives with thousands of file-splits and this is a
    no-op by count; a small dimension-sized input often arrives as ONE
    split (one parquet file < maxPartitionBytes), which would serialize
    the whole operator on a single core. The row shuffle here is cheap
    (ids + text), the parallelism unlock downstream is not.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
