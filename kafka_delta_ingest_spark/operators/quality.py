"""Model-based quality classification — the FineWeb-Edu / fasttext
stage of a pretraining pipeline: score every document with a linear
classifier over hashed bag-of-words features and keep the high-score
mass.

The industry pattern (FineWeb-Edu, DCLM, Llama-3 data work) is a
cheap linear model applied corpus-wide. This module implements that
stage Spark-first:

* ``train_log_odds_weights`` — closed-form Naive-Bayes/log-odds
  weights from labeled seed sets (positive vs negative documents):
  weight(b) = log p(b|pos) − log p(b|neg), Laplace-smoothed, one
  aggregation per side. This is the classic NB-as-linear-model
  trainer (fasttext's supervised objective converges to similar
  weights for unigram features); a deployment can equally load
  externally-trained weights — the scoring contract is just a
  (bucket, weight) table.
* ``classifier_score`` — per-document mean feature weight + bias
  through a sigmoid. The weight table is ``n_buckets`` rows and rides
  a broadcast join; the corpus shuffles only for its own per-(doc,
  bucket) census and the final per-doc aggregation — the same scale
  shape as DSIR (lm.py), which at 100 TB means no corpus-side state
  beyond two aggregations.

Engine-portable hashing (first 32 md5 bits mod n_buckets, as in
lm.py) keeps every step SQL-replicable, so the DuckDB oracle verifies
scores value-for-value.

Reference analogue: none (the reference has no text analysis);
method per Joulin et al. 2016 (fastText) and the FineWeb-Edu report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_delta_ingest_spark.operators.lm import _md5_bucket
from kafka_delta_ingest_spark.operators.text import tokens
from kafka_delta_ingest_spark.operators.util import spread


def _bucket_tokens(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    return (
        spread(df)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .select(_md5_bucket(F.col("word"), n_buckets))
    )


def train_log_odds_weights(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """(bucket, weight) for ALL ``n_buckets`` buckets — log-odds of the
    Laplace-smoothed hashed-unigram multinomials of the two seed sets.

    Buckets unseen in either seed get the smoothed prior ratio, so the
    scorer needs no default-weight special case. Output is bounded by
    ``n_buckets`` regardless of seed size: both censuses are map-side
    combined aggregations; seed corpora can be arbitrarily large."""
    pc = _bucket_tokens(pos, text_col, n_buckets).groupBy("bucket").agg(
        F.count("*").alias("cp")
    )
    nc = _bucket_tokens(neg, text_col, n_buckets).groupBy("bucket").agg(
        F.count("*").alias("cn")
    )
    # coalesce: an EMPTY seed side must degrade to the smoothed prior
    # (count 0 everywhere), not propagate NULL into every weight.
    n_p = pc.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("n_p"))
    n_n = nc.agg(F.coalesce(F.sum("cn"), F.lit(0)).alias("n_n"))
    all_buckets = pos.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    w = F.log(
        ((F.coalesce(F.col("cp"), F.lit(0)) + 1) / (F.col("n_p") + n_buckets))
        / ((F.coalesce(F.col("cn"), F.lit(0)) + 1) / (F.col("n_n") + n_buckets))
    )
    return (
        all_buckets.join(F.broadcast(pc), "bucket", "left")
        .join(F.broadcast(nc), "bucket", "left")
        .crossJoin(F.broadcast(n_p))
        .crossJoin(F.broadcast(n_n))
        .select("bucket", w.alias("weight"))
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, n_tok, score, keep) — sigmoid of the mean hashed-feature
    weight (+ bias) per document; ``keep`` = score ≥ threshold.

    The weight table broadcasts (≤ n_buckets rows); the corpus
    aggregates per-(doc, bucket) then per-doc — two shuffles on the
    doc id, nothing else, at any corpus size. Scores rounded to 6 dp
    for engine portability (sigmoid is monotone, so rounding never
    flips ``keep`` except exactly at the threshold — callers needing
    a knife-edge decision should threshold the unrounded logit)."""
    toks = (
        spread(df)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
    )
    dbc = toks.groupBy(id_col, _md5_bucket(F.col("word"), n_buckets)).agg(
        F.count("*").alias("c")
    )
    # LEFT join + coalesce(0): an externally-trained weight table that
    # covers only its training-time buckets must not silently drop
    # tokens from n_tok (or whole documents) — unknown buckets score 0.
    z = (
        F.sum(F.col("c") * F.coalesce(F.col("weight"), F.lit(0.0)))
        / F.sum("c")
        + F.lit(bias)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        dbc.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tok"),
            F.round(score, 6).alias("score"),
            (score >= threshold).alias("keep"),
        )
    )
