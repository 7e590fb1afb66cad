"""Stream-stream joins with watermark-bounded state.

Not in the reference (doc/DESIGN.md:52 "no joins or aggregates" — by
design); this is the Structured-Streaming-native operator a training
pipeline needs to correlate two live feeds (impressions↔clicks,
requests↔responses) without unbounded state.

Scale design: both sides shuffle once on the equi key; watermarks plus
the time-bound condition let the state store evict rows once they can
no longer match, so state size is (input rate × join window), not the
stream history. Without the time bound Spark would keep both sides
forever — at 100 TB/day that is the difference between a working job
and an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``on`` keys whose right-side timestamp lies
    in ``[left_ts + lower, left_ts + upper]``.

    Works on two streaming frames (the supported outer-join shapes
    follow Spark's stream-stream join matrix) and identically on batch
    frames (watermarks are then no-ops), so a DuckDB oracle can verify
    the semantics.
    """
    lw = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, right_watermark) if right.isStreaming else right
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    # Drop the right-side copy of the equi-key where the left copy is
    # always populated: with a Column-expression condition both copies
    # survive the join and any downstream reference to `on` throws
    # AMBIGUOUS_REFERENCE. Right/full outer keeps both (the left copy
    # is NULL for unmatched right rows).
    joined = lw.join(rw, cond, how)
    if how in ("inner", "left", "leftouter", "left_outer", "left_semi"):
        joined = joined.drop(rw[on])
    return joined


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    hint_broadcast: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment join.

    The classic ingest-time enrichment (events ↔ user/device/geo
    dimension). Spark re-evaluates the static side every micro-batch,
    so a Delta-backed ``dim`` picks up dimension updates between
    batches with no restart. ``hint_broadcast`` (default) ships the
    dimension to every executor once per batch — the stream side never
    shuffles, which is the only shape that survives a 100 TB/day topic;
    disable it only when the dimension is genuinely too large to
    broadcast, accepting a per-batch shuffle of the stream.
    """
    d = broadcast(dim) if hint_broadcast else dim
    return stream.join(d, on=on, how=how)


def dedup_within_watermark(df: DataFrame, keys: list[str], ts_col: str, watermark: str) -> DataFrame:
    """Streaming exact dedup with bounded state: a duplicate arriving
    within ``watermark`` of the first occurrence is dropped; state for
    keys older than the watermark is evicted (Spark's
    ``dropDuplicatesWithinWatermark``). The batch path degrades to plain
    ``dropDuplicates`` on the keys."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
