"""Temporal join operators: as-of join and bucketed range join.

The reference has no joins at all (reference doc/DESIGN.md:52 "no joins
or aggregates"); an as-of join is the canonical temporal operator a
training-data / feature pipeline needs over the ingested event tables
("latest right-side state at or before each left timestamp"), and a
point-in-interval range join is its sibling ("which window/campaign/
maintenance interval does this event fall into").

Scale design: the implementation is the union+window formulation — tag
both sides, union, one shuffle on (keys, ts), then a running
``last(right_payload, ignorenulls)`` window. Compared to a range join
(`l.ts >= r.ts` theta-join) this is O(n log n) per key instead of a
quadratic range explosion, never broadcasts the big side, and AQE can
split skewed keys. DuckDB's native ASOF JOIN verifies the semantics in
the oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: each point row matched to every interval
    with ``start <= point < end`` (half-open) and equal ``on`` keys.

    Scale design: a naive theta-join (`p >= s AND p < e`) plans as
    broadcast-nested-loop — O(|points|·|intervals|) and a 100 TB
    non-starter. Instead each interval is exploded to the fixed-width
    buckets it covers and each point to its single bucket; the join is
    then an *equi*-join on (keys, bucket) that hash-partitions, AQE
    skew-splits, and never compares a point with an interval more than
    one bucket away. A point has exactly one bucket, so no dedup is
    needed. Choose ``bucket_width`` near the typical interval length:
    cost is |intervals| × (len/width) exploded rows vs join selectivity.

    Numeric or timestamp columns both work (timestamps bucket on epoch
    seconds). Point/start/end columns must be mutually comparable.
    """
    on = on or []
    ts_types = ("timestamp", "timestamp_ntz")
    any_ts = any(
        df.schema[name].dataType.simpleString() in ts_types
        for df, name in ((points, point_col), (intervals, start_col), (intervals, end_col))
    )
    # Timestamps bucket on epoch MICROseconds — Spark's native timestamp
    # precision — so `end - 1` below is exact for sub-second data (epoch
    # seconds would truncate a fractional end into an uncovered bucket
    # and silently miss matches). bucket_width stays in seconds/units.
    width = bucket_width * 1_000_000 if any_ts else bucket_width

    def _num(df: DataFrame, name: str) -> Column:
        # TIMESTAMP_NTZ cannot cast to LONG directly — go through
        # TIMESTAMP; points and intervals shift identically under any
        # session TZ, so bucket assignment stays consistent.
        if df.schema[name].dataType.simpleString() in ts_types:
            return F.unix_micros(F.col(name).cast("timestamp"))
        return F.col(name).cast("long")

    # Malformed intervals (end <= start) contain no points under
    # [start, end) — but F.sequence with a descending range would emit
    # one row per bucket BETWEEN the endpoints, an unbounded explode for
    # a single corrupt row (e.g. swapped columns spanning years). Drop
    # them before bucketing; the join result is unchanged.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "_kdi_bucket",
        F.explode(
            F.sequence(
                F.floor(_num(intervals, start_col) / F.lit(width)),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into that bucket.
                F.floor((_num(intervals, end_col) - 1) / F.lit(width)),
            )
        ),
    )
    pt = points.withColumn(
        "_kdi_bucket", F.floor(_num(points, point_col) / F.lit(width))
    )
    cond = [pt["_kdi_bucket"] == iv["_kdi_bucket"]]
    cond += [pt[k] == iv[k] for k in on]
    cond.append(pt[point_col] >= iv[start_col])
    cond.append(pt[point_col] < iv[end_col])
    joined = pt.join(iv, reduce(lambda a, b: a & b, cond), how)
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)


def bucketed_colocated_join(
    spark,
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_buckets: int = 16,
    how: str = "inner",
    database: str = "kdi_bucketed",
    location: str | None = None,
):
    """Co-located join via BUCKETED tables: both sides are written
    ``bucketBy(n_buckets, key)`` + ``sortBy(key)`` into catalog tables,
    and the join of the bucketed tables runs WITHOUT a shuffle on the
    join key — each task reads bucket i of both sides, already hash-
    partitioned and sorted identically at write time.

    This is the pre-paid exchange pattern for 100 TB fact-to-fact
    joins: the shuffle happens ONCE at ingest (where the write was
    going to rewrite the data anyway), and every subsequent join,
    group-by, or dedup on the bucket key is exchange-free — the only
    plan shape that amortizes when the same key joins daily. Verified
    by plan assertion in tests (no Exchange on the key anywhere in the
    joined plan).

    Returns (joined DataFrame, cleanup callable). The callable drops
    the backing database; callers that keep the bucketed tables as a
    materialized asset simply never call it."""
    import uuid

    db = f"{database}_{uuid.uuid4().hex[:8]}"
    loc = location or f"/tmp/{db}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    lt, rt = f"{db}.bkt_left", f"{db}.bkt_right"
    (
        left.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(lt)
    )
    (
        right.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(rt)
    )
    joined = spark.table(lt).join(spark.table(rt), key, how)

    def cleanup():
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        import shutil

        shutil.rmtree(loc, ignore_errors=True)

    return joined, cleanup
