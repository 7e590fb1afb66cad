"""Shared operator utilities: parallelism spreading and skew salting."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def let_once(value: Column, body) -> Column:
    """Per-row LET binding at the expression level: evaluate ``value``
    once and hand it to ``body`` as a lambda variable, so every
    reference inside ``body`` is a bound-variable read instead of a
    re-evaluation of the producing expression.

    ``transform`` (like every higher-order function) evaluates its
    array argument once per row before applying the lambda — that is
    the materialization point. Catalyst has no common-subexpression
    elimination inside CodegenFallback trees (all HOFs), so without
    the binding every lambda reference to an outer expression inlines
    and re-runs it (measured 2(w-1)x re-evaluation of the full shingle
    pipeline in winnowing, 64x re-evaluation of the l2-norm aggregate
    in vector unit-scaling). NULL propagates identically: a null
    ``value`` rides through as the lambda argument and the body yields
    what the inlined form yields."""
    return F.transform(F.array(value), lambda v: body(v))[0]


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a small/under-partitioned input to cluster width
    before expression-heavy per-row work (shingling, hashing, scoring).

    A 100 TB table arrives with thousands of file-splits and this is a
    no-op by count; a small dimension-sized input often arrives as ONE
    split (one parquet file < maxPartitionBytes), which would serialize
    the whole operator on a single core. The row shuffle here is cheap
    (ids + text), the parallelism unlock downstream is not.

    Width detection must never RUN anything: ``df.rdd`` is off the
    table even where it exists, because under AQE (default-on) it
    materializes every shuffle stage in the plan just to read a
    partition count, and that work is not reused by the later action.
    So: estimate from ``inputFiles()`` (zero jobs; a lower bound on
    scan splits — a file larger than maxPartitionBytes splits further,
    so the estimate only errs toward repartitioning, never toward
    under-parallelism). A plan with no input files that is CACHED
    passes through untouched (the cache was materialized at some
    cluster width; re-shuffling it to "fix" an unknown width is a
    guaranteed extra exchange for a speculative win); a non-file,
    non-cached plan is assumed narrow and widened. The target falls
    back to ``spark.sql.shuffle.partitions`` when no SparkContext is
    reachable (Spark Connect).
    """
    sess = df.sparkSession
    try:
        default = sess.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no client-side SparkContext
        default = int(sess.conf.get("spark.sql.shuffle.partitions"))
    target = partitions or default
    try:
        n_splits = len(df.inputFiles())
    except Exception:  # non-file-backed plan
        n_splits = 0
    if n_splits == 0:
        try:
            lvl = df.storageLevel
            if lvl.useMemory or lvl.useDisk:
                return df  # cached: already partitioned, don't re-shuffle
        except Exception:
            pass
    if n_splits >= target:
        return df
    # r12 (optimization): the repartition alone does not deliver
    # spread's contract — Catalyst pushes deterministic filters
    # THROUGH RepartitionOperation, so a downstream filter over an
    # expression-heavy computed column (a quality score, a shingle
    # array's size) gets fully inlined below this exchange and runs in
    # the narrow pre-shuffle scan stage, exactly the serialization
    # spread exists to prevent (measured: a single-task 2.9 s
    # quality-filter stage in pipeline_pretrain_curation at sf0.1).
    # An always-true non-deterministic guard right above the exchange
    # is a pushdown barrier: predicate pushdown may not reorder a
    # deterministic filter below a non-deterministic one, so heavy
    # filters stay on the wide side and their expressions evaluate
    # ONCE, after the already-computed columns. Rows are unaffected
    # (spark_partition_id() is never negative; it is chosen over
    # rand() because Spark 4's optimizer knows rand's value bounds and
    # folds rand-based tautologies away). When spread no-ops (input
    # already wide — the 100 TB case), no barrier is added and
    # scan-level pushdown behaves exactly as before.
    return df.repartition(target).where(
        F.spark_partition_id() >= F.lit(0)
    )


def co_locate(df: DataFrame, key: Column, partitions: int | None = None) -> DataFrame:
    """Hash-partition rows on a small-cardinality ``key`` so identical
    downstream work (e.g. a memoized codec fixture derived from the
    key) lands in the same task — the group-identical-work-by-key
    pattern. Width detection mirrors :func:`spread`'s job-free rule
    (``defaultParallelism``, falling back to shuffle.partitions under
    Spark Connect); the shuffled rows are expected to be narrow (bare
    ids), so the exchange is ~free next to the work it deduplicates."""
    sess = df.sparkSession
    try:
        default = sess.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no client-side SparkContext
        default = int(sess.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(partitions or default, key)


def _carriers(
    rows: DataFrame, key: str | list[str], item: Column, cap: int | None
) -> DataFrame:
    """Group ``item`` carriers per ``key`` into a sorted array ``ids``,
    with BOUNDED aggregation buffers: with a ``cap``, a counter-only
    pre-aggregation (map-side combined, no lists) drops over-cap keys
    via a semi-join BEFORE any list is collected, so no collect_list
    buffer ever exceeds ``cap`` items — a boilerplate gram carried by
    1e8 documents costs a counter, never an 800 MB array. ``cap=None``
    collects directly (one pass over ``rows``'s lineage instead of
    two); callers choose it when the key's carrier counts are known
    bounded or when every carrier is required (coverage guarantees).

    This is the shared candidate-pair core of the dedup/LSH families:
    downstream stages posexplode ``ids`` and pair each element with
    its strict suffix — one pass over the (often expensive) upstream
    lineage, where an a/b aliased self-join would execute it once per
    leg (Spark does not reuse the exchange across aliased legs)."""
    keys = [key] if isinstance(key, str) else list(key)
    if cap is not None:
        keep = (
            rows.groupBy(*keys)
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= cap)
            .select(*keys)
        )
        rows = rows.join(keep, keys, "left_semi")
    return rows.groupBy(*keys).agg(
        F.array_sort(F.collect_list(item)).alias("ids")
    )


def _suffix_pairs(
    carriers: DataFrame,
    out_a: str = "a",
    out_b: str = "b",
    id_of=None,
) -> DataFrame:
    """Stream ordered carrier pairs from a :func:`_carriers` frame:
    each posexploded element of the sorted ``ids`` array pairs with
    its strict suffix, so every unordered pair appears exactly once
    with the lower id first and per-row memory stays O(carriers),
    never O(carriers^2). ``id_of`` extracts the ordering id from an
    element (identity for plain id arrays; a field accessor for
    struct items) — the strict ``<`` on it also drops self-pairs when
    the input carried duplicate ids, which the old a/b equi-join
    shapes tolerated silently."""
    id_of = id_of or (lambda c: c)
    return (
        carriers.filter(F.size("ids") >= 2)
        .select(F.col("ids"), F.posexplode("ids").alias("_i", out_a))
        .select(
            out_a,
            F.explode(
                F.slice("ids", F.col("_i") + 2, F.size("ids"))
            ).alias(out_b),
        )
        .filter(id_of(F.col(out_a)) < id_of(F.col(out_b)))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation with key salting for skewed distributions.

    ``aggs`` maps output column → ("sum"|"count"|"min"|"max", input col).
    Stage 1 aggregates on (keys + salt) — a hot key's rows split across
    ``salt_buckets`` reducers instead of melting one; stage 2 merges the
    per-salt partials (count merges via sum). AQE's skew-join splitting
    covers joins; this covers aggregations whose partial/merge functions
    are algebraic, which Spark cannot re-salt automatically.
    """
    stage1_aggs, stage2_aggs = [], []
    for out, (kind, col) in aggs.items():
        if kind == "count":
            stage1_aggs.append(F.count(col).alias(out))
            stage2_aggs.append(F.sum(out).alias(out))
        elif kind == "sum":
            stage1_aggs.append(F.sum(col).alias(out))
            stage2_aggs.append(F.sum(out).alias(out))
        elif kind == "min":
            stage1_aggs.append(F.min(col).alias(out))
            stage2_aggs.append(F.min(out).alias(out))
        elif kind == "max":
            stage1_aggs.append(F.max(col).alias(out))
            stage2_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported salted agg kind: {kind!r}")
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)
