"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference keeps a per-Kafka-partition ``ValueBuffer`` whose only
stateful rule is monotone offsets: a message with ``offset <=
last_offset`` is rejected as already processed (reference
src/value_buffers.rs:14-35, surfaced as
``AlreadyProcessedPartitionOffset``; SURVEY §2.4 B1). Spark's
checkpointing makes that guard unnecessary on the happy path, but the
same semantics are exactly what an *explicit* stateful operator looks
like in Structured Streaming — so this module implements it with
``applyInPandasWithState``, the API the engine exposes for stateful
logic that watermarked aggregations can't express.

Scale notes: state is one long per Kafka partition (thousands of keys,
not millions) — RocksDB/HDFS state stores hold it trivially; each
micro-batch groups by partition, so the shuffle is keyed on the same
column the source is already partitioned by (AQE coalesces the tiny
exchange). The per-group pandas function is O(batch) with a single
sort, Arrow-batched both ways.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def stateful_offset_dedup(
    df: DataFrame,
    partition_col: str = "kafka_partition",
    offset_col: str = "kafka_offset",
) -> DataFrame:
    """Drop rows whose offset is ≤ the highest offset already seen for
    their partition — across micro-batches (state) and within a batch
    (sort + strictly-increasing scan, mirroring the reference's buffer
    add loop).

    Works on streaming DataFrames (state persists in the checkpoint) and
    on batch DataFrames (``applyInPandasWithState`` is streaming-only, so
    batch frames route through plain ``applyInPandas`` with empty initial
    state; pure within-batch dedup). Output schema == input schema.
    """
    out_schema = df.schema
    state_schema = StructType([StructField("last_offset", LongType())])
    cols = [f.name for f in out_schema.fields]

    def _dedup_pdf(batch: pd.DataFrame, last: int) -> pd.DataFrame:
        # Reference semantics (src/value_buffers.rs:26-31): accept iff
        # offset > last_offset, then advance. Sorting first makes the
        # within-batch scan equal "keep one row per distinct offset >
        # state", independent of arrival interleaving.
        batch = batch.sort_values(offset_col, kind="mergesort")
        offs = batch[offset_col]
        keep = (offs > last) & (offs != offs.shift(1))
        return batch[keep]

    if not df.isStreaming:
        return df.groupBy(partition_col).applyInPandas(
            lambda pdf: _dedup_pdf(pdf, -(1 << 62))[cols], schema=out_schema
        )

    def dedup(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (None,)
        last = -(1 << 62) if last is None else last
        batch = pd.concat(list(pdfs), ignore_index=True)
        accepted = _dedup_pdf(batch, last)
        if len(accepted):
            last = int(accepted[offset_col].iloc[-1])
            state.update((last,))
        yield accepted[cols]

    return (
        df.groupBy(partition_col)
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key lifetime running totals, emitted once per micro-batch the
    key appears in: ``(key, n_events, total_value)`` with counts
    accumulated across the whole stream history.

    The canonical ``applyInPandasWithState`` shape: unbounded keyed
    state (two numbers per key), update-per-batch output. A watermarked
    groupBy cannot express "lifetime" totals without retaining all
    state forever *and* re-emitting — this operator owns exactly that
    trade explicitly.
    """
    out_schema = StructType(
        [
            df.schema[key_col],
            StructField("n_events", LongType()),
            StructField("total_value_micros", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total_micros", LongType())]
    )

    def totals(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # Integer micro-units: exact accumulation, associative across
            # batches (float summation order would drift vs the oracle).
            total += int(round(pdf[value_col].sum() * 1_000_000))
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value_micros": [total]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        totals,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
