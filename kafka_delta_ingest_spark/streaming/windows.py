"""Event-time operators: tumbling windows and sessionization.

The reference has no event-time processing (its latency timer is a
flush trigger, not a watermark — SURVEY §2.9); these are the
Structured-Streaming-native extensions the driver's north star asks
for. Both work identically on batch DataFrames (used by the DuckDB
oracle) and on streams (add ``withWatermark`` upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts per key.

    Streaming: pass ``watermark`` (e.g. "2 hours") to bound state; the
    same plan then runs incrementally with late-data handling.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization (batch formulation).

    A session breaks when the gap to the previous event exceeds
    ``gap_minutes``; session_id is the running count of breaks per user
    — two window functions, no Python. The streaming twin is
    ``F.session_window(ts, gap)`` on a watermarked stream; this batch
    form exists so the oracle can verify the semantics exactly.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_break = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_session = df.withColumn(
        "session_seq",
        F.sum(is_break).over(
            Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return with_session.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def streaming_session_window(df: DataFrame, ts_col: str, user_col: str, gap: str):
    """Streaming-native sessionization (for real streams)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
    )
