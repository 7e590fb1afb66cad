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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded, no shuffle)."""
    return df.sampleBy(strata_col, fractions, seed)
