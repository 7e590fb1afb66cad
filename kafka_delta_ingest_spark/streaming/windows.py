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


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-step conversion funnel over an event stream.

    A user reaches stage k when, for every step i ≤ k, there is an
    event of type ``steps[i]`` strictly later than their stage-(i−1)
    entry time (first-touch semantics: each stage anchors at the
    EARLIEST qualifying event, the standard product-analytics funnel).

    Plan shape: one filtered min-aggregation per step, chained by
    equi-joins on ``user_col``. Every shuffle in the chain hashes the
    same key, so Spark plans one Exchange and reuses the partitioning
    across all stages; per-stage frames shrink monotonically (stage k
    is a subset of stage k−1). No windows over whole-user event lists,
    so a bot user with 10⁸ events costs its filter scan, not a sort.

    Returns one row per stage: (stage, step, users), stage 1-based.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(user_col, ts_col, type_col)
    stage = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    counts = [stage.select(F.count("*").alias("users"))]
    for step in steps[1:]:
        stage = (
            ev.where(F.col(type_col) == step)
            .join(stage, user_col)
            .where(F.col(ts_col) > F.col("t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        counts.append(stage.select(F.count("*").alias("users")))
    rows = [
        c.select(
            F.lit(i + 1).alias("stage"),
            F.lit(step).alias("step"),
            F.col("users").cast("long").alias("users"),
        )
        for i, (step, c) in enumerate(zip(steps, counts))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
