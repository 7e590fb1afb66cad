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
from pyspark.sql.types import LongType, StringType, StructField, StructType


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
            # Integer micro-units PER VALUE: rounding each value before
            # summing makes the total associative across batches AND
            # Arrow chunks — rounding a per-chunk float sum would make
            # the lifetime total depend on chunk boundaries.
            total += int(
                (pdf[value_col] * 1_000_000).round().astype("int64").sum()
            )
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


def stateful_funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of ``windows.funnel``: per-user ordered-step
    progression maintained across micro-batches.

    State per user = (stage_reached, anchor_micros). Each micro-batch
    replays the user's events in timestamp order and advances the
    machine greedily: an event advances stage k→k+1 iff its type is
    ``steps[k]`` and (for k > 0) its timestamp is STRICTLY after the
    stage-k anchor — the same strict first-touch rule as the batch
    funnel. Emits ``(user, stage, step)`` per batch the user appears
    in (update mode); stage 0 = not yet entered.

    Semantics note: with in-order arrival this matches the batch
    funnel exactly (the earliest qualifying event is seen first and
    anchors the stage). Late events older than an already-set anchor
    cannot retroactively re-anchor — the standard streaming
    first-observation trade; replaying from history reconciles.

    Scale: two longs of state per user; the shuffle is keyed on the
    user column only.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out_schema = StructType(
        [
            df.schema[user_col],
            StructField("stage", LongType()),
            StructField("step", StringType()),
        ]
    )
    state_schema = StructType(
        [StructField("stage", LongType()), StructField("anchor_micros", LongType())]
    )
    step_index = {s: i for i, s in enumerate(steps)}

    def advance(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, anchor = state.get if state.exists else (0, -(1 << 62))
        batch = pd.concat(list(pdfs), ignore_index=True)
        # Null timestamps cannot order a funnel: NaT.astype(int64) is
        # INT64_MIN on this pandas (and raises on others), which would
        # anchor a stage in the distant past and let ANY later event
        # advance — drop them before replay.
        batch = batch.dropna(subset=[ts_col])
        batch = batch.sort_values(ts_col, kind="mergesort")
        ts_micros = batch[ts_col].astype("int64") // 1000
        types = batch[type_col]
        for t_us, typ in zip(ts_micros, types):
            if stage >= len(steps):
                break
            if step_index.get(typ) != stage:
                continue
            if stage > 0 and t_us <= anchor:
                continue
            stage += 1
            anchor = int(t_us)
        state.update((int(stage), int(anchor)))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "stage": [int(stage)],
                "step": [steps[stage - 1] if stage > 0 else None],
            }
        )

    return df.groupBy(user_col).applyInPandasWithState(
        advance,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
