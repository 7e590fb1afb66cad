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
) -> DataFrame:
    """Add (n_tokens, pack_id): which ctx_tokens-sized training pack the
    document STARTS in, under per-group (order_col)-ordered
    concatenation.

    pack_id = floor((running_total − n_tokens) / ctx_tokens) — i.e. the
    chunk containing the doc's first token; long docs straddle into the
    following packs, exactly like concat-and-chunk pretraining loaders.
    Every input is integer arithmetic over a running sum, so the DuckDB
    oracle reproduces assignments row for row.
    """
    tc = token_count(F.col(text_col))
    w = Window.partitionBy(group_col).orderBy(order_col)
    cum = F.sum(tc).over(w)
    return df.withColumn("n_tokens", tc).withColumn(
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
