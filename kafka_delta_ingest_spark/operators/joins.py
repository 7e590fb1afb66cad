"""Temporal join operators: as-of join (and its windowed plumbing).

The reference has no joins at all (reference doc/DESIGN.md:52 "no joins
or aggregates"); an as-of join is the canonical temporal operator a
training-data / feature pipeline needs over the ingested event tables
("latest right-side state at or before each left timestamp").

Scale design: the implementation is the union+window formulation — tag
both sides, union, one shuffle on (keys, ts), then a running
``last(right_payload, ignorenulls)`` window. Compared to a range join
(`l.ts >= r.ts` theta-join) this is O(n log n) per key instead of a
quadratic range explosion, never broadcasts the big side, and AQE can
split skewed keys. DuckDB's native ASOF JOIN verifies the semantics in
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS = "_kdi_asof_ts"
_SIDE = "_kdi_asof_is_left"
_PAYLOAD = "_kdi_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` keys; NULLs when none.

    Right-side rows should be unique per (on, right_ts) for
    deterministic results (pre-aggregate otherwise). Right columns are
    returned with ``right_prefix`` (keys and timestamp included, so the
    match is self-describing).
    """
    rcols = [c for c in right.columns if c not in on]
    l2 = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None)
        .cast(right.select(F.struct(*[F.col(c) for c in rcols])).schema[0].dataType)
        .alias(_PAYLOAD),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None)
        .cast(left.select(F.struct(*[F.col(c) for c in left.columns])).schema[0].dataType)
        .alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias(_PAYLOAD),
    )
    u = l2.unionByName(r2)
    # Right rows sort before left rows at equal ts (<= semantics).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_match", F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == 1).select(
        *[F.col(f"_l.`{c}`").alias(c) for c in left.columns],
        *[F.col(f"_match.`{c}`").alias(f"{right_prefix}{c}") for c in rcols],
    )
    return out
