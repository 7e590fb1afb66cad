"""Dataset splitting and sampling for training pipelines.

Two primitives every corpus pipeline needs ahead of training:

* **deterministic_split** — hash-based train/holdout assignment. The
  bucket is a pure function of the row's key (md5, first 32 bits,
  mod 100), so the split is stable across runs, engines, cluster
  sizes, and INCREMENTAL arrivals: a document keeps its split forever,
  new data lands ~train_pct/100 in train without coordination — the
  property RNG-based splits lack. Fully SQL-expressible, so the DuckDB
  oracle verifies assignments row by row.
* **stratified_sample** — per-stratum Bernoulli sampling
  (``df.sampleBy`` with a fixed seed): rebalance skewed strata (e.g.
  languages) without a shuffle; each row is kept or dropped where it
  sits.
* **pack_sequences** — concat-and-chunk sequence packing: assign each
  document to the fixed-size context-window "pack" its first token
  lands in, given a deterministic (group, order) concatenation of the
  corpus. Packing runs per group (language, shard, …) so the window is
  partitioned — arbitrarily parallel, no global sort; at 100 TB the
  group key is a hash shard and each shard packs independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kafka_delta_ingest_spark.operators.text import token_count


def split_bucket(key_col: str) -> F.Column:
    """0..99 bucket from the md5 of the key's string form."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % 100
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 90,
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` ∈ {'train','holdout'} keyed on ``key_col``."""
    return df.withColumn(
        split_col,
        F.when(split_bucket(key_col) < train_pct, F.lit("train")).otherwise(
            F.lit("holdout")
        ),
    )


def pack_sequences(
    df: DataFrame,
    ctx_tokens: int,
    group_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 0,
) -> DataFrame:
    """Add (n_tokens, pack_id): which ctx_tokens-sized training pack the
    document STARTS in, under per-group (order_col)-ordered
    concatenation.

    pack_id = floor((running_total − n_tokens) / ctx_tokens) — i.e. the
    chunk containing the doc's first token; long docs straddle into the
    following packs, exactly like concat-and-chunk pretraining loaders.
    Every input is integer arithmetic over a running sum, so the DuckDB
    oracle reproduces assignments row for row.

    ``shards > 0`` is the scale path: rows are dealt into ``shards``
    md5(order_col) sub-streams per group, each packed independently,
    with a ``pack_shard`` column identifying the stream (pack identity
    = (group, pack_shard, pack_id)). A language holding 30% of a
    100 TB corpus runs as ``shards`` parallel running-sum tasks instead
    of one straggler sort; the cost is ≤ one partially-filled tail pack
    per shard, statistically nothing at pretraining scale. The md5
    dealing keeps assignments engine-portable and rerun-stable (and the
    DuckDB oracle reproduces them exactly). ``shards=0`` keeps the
    single concatenation stream per group.
    """
    tc = token_count(F.col(text_col))
    if shards <= 0:
        w = Window.partitionBy(group_col).orderBy(order_col)
        cum = F.sum(tc).over(w)
        return df.withColumn("n_tokens", tc).withColumn(
            "pack_id",
            F.floor((cum - F.col("n_tokens")) / F.lit(ctx_tokens)).cast("long"),
        )
    shard = (
        F.conv(
            F.substring(F.md5(F.col(order_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % shards
    ).cast("int")
    w = Window.partitionBy(group_col, "pack_shard").orderBy(order_col)
    out = df.withColumn("pack_shard", shard).withColumn("n_tokens", tc)
    cum = F.sum("n_tokens").over(w)
    return out.withColumn(
        "pack_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(ctx_tokens)).cast("long"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded, no shuffle)."""
    return df.sampleBy(strata_col, fractions, seed)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row when the md5 bucket
    of (stratum, key) falls under the stratum's percentage.

    Unlike seeded ``sampleBy`` (whose RNG stream depends on the engine
    and row order), membership here is a pure function of the row —
    re-runs, cluster resizes, retries, and backfills all keep the same
    rows, which is what a reproducible training-data pipeline needs.
    Salting the hash with the stratum keeps the per-stratum picks
    independent even for rows sharing a key. No shuffle: a per-row
    filter that pushes down past column pruning.
    """
    pct = F.lit(-1)
    for s, frac in fractions.items():
        pct = F.when(
            F.col(strata_col) == s, F.lit(int(round(frac * 1_000_000)))
        ).otherwise(pct)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(strata_col).cast("string"),
                        F.lit(":"),
                        F.col(key_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    return df.where(bucket < pct)


def hash_sample_exact(df: DataFrame, k: int, key_col: str = "doc_id") -> DataFrame:
    """EXACT-size pseudo-random sample: the k smallest md5(key) values.

    Bernoulli sampling can't hit an exact count and reservoir sampling
    needs driver coordination; ordering by a cryptographic hash of the
    key gives a uniform, deterministic, engine-portable pick. The
    orderBy+limit compiles to TakeOrderedAndProject — each partition
    keeps its local top-k and a single merge finishes — no global sort
    shuffle even at 100 TB.
    """
    return df.orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col)).limit(k)


def source_mix(
    df: DataFrame,
    weights: dict,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture weighting: keep each source at its target
    fraction (0..1) by thresholding the md5 bucket of the row key — the
    "3 parts web, 1 part code" knob of a pretraining mix.

    A pure per-row filter (no shuffle, no sampling state); because the
    bucket is keyed on the row, re-running, resharding, or appending
    data never flips a kept row to dropped. Unlisted sources drop.

    The hash is SALTED ("mix:") so the kept-set is independent of
    ``deterministic_split``'s unsalted bucket on the same key —
    without the salt, every row surviving a weight-w source has
    bucket < w*100 and a downstream train/holdout split at pct >= w*100
    would put ALL of them in train, emptying the holdout for every
    down-weighted source. Thresholds quantize at 1e-6 (a 0.005 weight
    keeps 0.5%, not 0%).
    """
    pct = F.lit(0)
    for s, frac in weights.items():
        pct = F.when(
            F.col(source_col) == s, F.lit(int(round(frac * 1_000_000)))
        ).otherwise(pct)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col(key_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    return df.where(bucket < pct)


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual /
    multi-source pretraining knob: sample source s proportional to
    n_s^alpha, so alpha=1 keeps natural proportions and alpha→0
    approaches uniform; Conneau & Lample 2019, T5).

    Maximal-size formulation: the keep-fraction reduces to the closed
    form ``f_s = (n_min / n_s)^(1-alpha)`` — the smallest source keeps
    everything, larger sources keep temperature-proportionally less,
    and resulting counts follow n_s^alpha exactly in expectation. The
    per-source fractions come from ONE tiny counts aggregation
    (|sources| rows to the driver); the filter itself is
    :func:`source_mix`'s salted-md5 per-row threshold — zero extra
    shuffles, rerun/append-stable. Fractions quantize by FLOOR at 1e-6
    (floor, not round: identical in every engine, so the SQL oracle
    reproduces the kept set bit-for-bit).
    """
    import math

    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return source_mix(df, {}, source_col=source_col, key_col=key_col)
    n_min = min(counts.values())
    weights = {
        s: math.floor((n_min / n) ** (1.0 - alpha) * 1_000_000) / 1_000_000
        for s, n in counts.items()
    }
    return source_mix(df, weights, source_col=source_col, key_col=key_col)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_by: list,
    rank_col: str = "rn",
    salt_shards: int = 64,
) -> DataFrame:
    """Keep the top-n rows per group under ``order_by`` (list of
    Columns) — per-domain document caps (Gopher/FineWeb style: bound
    any one domain's share, keeping its best-quality documents).

    Salted two-phase top-n, exact under a total ``order_by``:

    1. shard every row into (group, salt) where salt is a row-content
       hash mod ``salt_shards``, and keep each shard's local top-n —
       the global top-n is a subset of the union of shard-local top-ns
       for ANY row→shard assignment, so this is a pure pre-filter;
    2. rank the surviving ≤ salt_shards·n rows per group and keep the
       final top-n.

    A mega-domain holding 30% of a 100 TB corpus becomes salt_shards
    parallel window tasks in phase 1; phase 2's per-group input is
    bounded by salt_shards·n rows however large the domain was — no
    single-task straggler sort anywhere. ``salt_shards=0`` restores the
    single-window form (useful when every group is known small).
    """
    if salt_shards <= 0:
        w = Window.partitionBy(group_col).orderBy(*order_by)
        return (
            df.withColumn(rank_col, F.row_number().over(w).cast("int"))
            .where(F.col(rank_col) <= n)
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_shards)
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lrn", F.row_number().over(w1))
        .where(F.col("_lrn") <= n)
        .drop("_salt", "_lrn")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("int"))
        .where(F.col(rank_col) <= n)
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int,
    id_col: str = "doc_id",
    descending: bool = False,
    exact: bool = True,
    accuracy: int = 10000,
    bin_col: str = "bin",
) -> DataFrame:
    """Per-group quantile binning (curriculum quartiles, CCNet-style
    terciles, …): every row gets a 1..n_bins bucket by its value's
    rank within its group.

    * ``exact=True`` (the oracle twin): ``ntile(n_bins)`` over a
      group-partitioned window ordered by (value, id) — deterministic
      and engine-portable, exact bin SIZES, but a full per-group sort:
      one mega-group at 100 TB serializes into a single partition
      chain.
    * ``exact=False`` (the production scale path): per-group
      ``percentile_approx`` cut points — a one-pass mergeable-sketch
      hash aggregation — broadcast back, then a pure filter assigns
      bins. NO per-group global sort in the plan (pinned by
      tests/test_plans.py); bin boundaries carry sketch rank error
      ≤ n/accuracy, and ties AT a boundary all land in the lower bin
      (value-based cut) where ntile would split them by id.

    ``descending=True`` ranks high values into bin 1 (curriculum
    "best first"); implemented by negating the value so both paths
    share one ordering convention.
    """
    v = F.col(value_col) if not descending else -F.col(value_col)
    work = df.withColumn("_qv", v)
    if exact:
        w = Window.partitionBy(group_col).orderBy(
            F.col("_qv").asc(), F.col(id_col).asc()
        )
        return work.withColumn(
            bin_col, F.ntile(n_bins).over(w).cast("int")
        ).drop("_qv")
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = work.groupBy(group_col).agg(
        F.approx_percentile(
            "_qv", F.array(*[F.lit(q) for q in qs]), F.lit(accuracy)
        ).alias("_cuts")
    )
    # bin = 1 + number of cut points strictly below the value.
    bin_expr = (
        F.lit(1)
        + F.aggregate(
            F.col("_cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("_qv") > c, 1).otherwise(0),
        )
    ).cast("int")
    return (
        work.join(F.broadcast(cuts), group_col)
        .withColumn(bin_col, bin_expr)
        .drop("_qv", "_cuts")
    )


def shuffle_order(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shuffle_key`` = md5(seed || id). Sorting by the key is a seeded
    permutation that is stable under reruns, appends, and resharding —
    the dataloader property epoch ordering needs (a new seed is a new
    permutation).

    Scale shape: the key is a pure projection. Consumers either take
    the first batches via ``orderBy(key).limit(n)`` (distributed top-k,
    no global sort) or materialize the full order with
    ``repartitionByRange(key).sortWithinPartitions(key)`` — a range
    shuffle, never a single-task sort."""
    key = F.md5(F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string")))
    return df.withColumn("shuffle_key", key)


def sample_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str,
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Take documents in deterministic (seeded md5) order until the
    cumulative token count reaches ``budget`` — "give me 50B tokens of
    this corpus" as an exact, rerun-stable prefix selection. The last
    admitted document may cross the budget (documents are atomic); the
    selection is the unique shortest hash-order prefix with
    total >= budget.

    Scale shape — a sequential prefix scan without a global sort:

    1. every row gets key = md5(seed || id) and bucket = its first two
       hex chars (256 buckets; hex-string order == (bucket, key) order,
       so bucket boundaries respect the global order);
    2. one aggregation yields 256 (bucket, token_sum) rows; the
       running total over them is window work on 256 rows, nothing;
    3. buckets wholly under the budget are admitted with NO row-level
       work; the single straddling bucket resolves exactly with a
       window over ~1/256 of the corpus; buckets past it are filtered
       out before any shuffle.
    """
    tc = token_count(F.col(text_col)).cast("long")
    key = F.md5(F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string")))
    rows = df.withColumn("_bkey", key).withColumn(
        "_bucket", F.substring("_bkey", 1, 2)
    ).withColumn("_tok", tc)

    per_bucket = rows.groupBy("_bucket").agg(F.sum("_tok").alias("_bsum"))
    wb = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 256 rows: the single-partition window is driver-trivial
    bounds = per_bucket.withColumn(
        "_before", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    )
    # Admit whole buckets that end under the budget; resolve the one
    # straddling bucket row-by-row; drop everything after it.
    full = bounds.filter(F.col("_before") + F.col("_bsum") < budget).select(
        "_bucket"
    )
    straddle = bounds.filter(
        (F.col("_before") < budget)
        & (F.col("_before") + F.col("_bsum") >= budget)
    ).select("_bucket", "_before")

    admitted_full = rows.join(F.broadcast(full), "_bucket", "left_semi")
    ws = Window.partitionBy("_bucket").orderBy("_bkey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    in_straddle = (
        rows.join(F.broadcast(straddle), "_bucket")
        .withColumn(
            "_run", F.col("_before") + F.coalesce(F.sum("_tok").over(ws), F.lit(0))
        )
        .filter(F.col("_run") < budget)  # admit while PRIOR total < budget
        .drop("_before", "_run")
    )
    return (
        admitted_full.unionByName(in_straddle)
        .drop("_bucket", "_bkey", "_tok")
    )
