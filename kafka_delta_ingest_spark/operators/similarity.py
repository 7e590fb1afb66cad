"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the (huge) corpus; the dot product is a
  ``zip_with``/``aggregate`` expression (JVM codegen, no Python), and
  per-query top-k uses a window ranked by similarity. At 100 TB the
  corpus side stays partitioned; only queries move.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH signs
  derived deterministically from xxhash64 (no RNG state to ship),
  bucketed equi-join instead of the full cross product, exact re-rank
  inside buckets. Recall < 1.0 by construction; multiple rotations
  (``num_tables``) trade compute for recall.
* ``embedding_neardup_pairs`` — near-duplicate vectors (cosine ≥
  threshold) via the same LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query (brute force, broadcast join).

    Returns (query_id, neighbor_id, cos_sim, rank). Ties break by
    neighbor id for determinism.
    """
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        _as_double(F.col(corpus_vec)).alias("_cv"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(query_vec)).alias("_qv")
    )
    scored = c.crossJoin(broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    num_bits: int = 12,
    num_tables: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on (table, bucket), exact re-rank.

    Expected bucket size ≈ n / 2^num_bits per table; tune num_bits so
    buckets fit comfortably in a task (e.g. 2^12 buckets per table at
    1e9 vectors → ~244k vectors/bucket — raise num_bits at that scale).
    """
    tables = F.sequence(F.lit(0), F.lit(num_tables - 1))

    def with_buckets(df, id_alias, vec_alias, idc, vecc):
        v = _as_double(F.col(vecc))
        return df.select(
            F.col(idc).alias(id_alias), v.alias(vec_alias)
        ).select(
            id_alias,
            vec_alias,
            F.explode(
                F.transform(
                    tables,
                    lambda t: F.struct(
                        t.alias("table"),
                        hyperplane_bits(F.col(vec_alias), dim, num_bits, t).alias("bucket"),
                    ),
                )
            ).alias("tb"),
        ).select(id_alias, vec_alias, "tb.table", "tb.bucket")

    c = with_buckets(corpus, "neighbor_id", "_cv", corpus_id, corpus_vec)
    q = with_buckets(queries, "query_id", "_qv", query_id, query_vec)
    cand = (
        c.join(broadcast(q), on=["table", "bucket"])
        .select("query_id", "neighbor_id", "_cv", "_qv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def hyperplane_bits(vec: Column, dim: int, num_bits: int, table) -> Column:
    """Deterministic random-hyperplane signature (long).

    Plane p component i ∈ {-1,+1} from the low bit of
    xxhash64(table, p, i): reproducible on any cluster with zero
    coordination — the "random" planes are pure functions.
    """

    def side(p):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.when(
                        F.xxhash64(table, p, i).bitwiseAND(F.lit(1)) == 1, 1.0
                    ).otherwise(-1.0),
                ),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(
            proj > 0, F.call_function("shiftleft", F.lit(1).cast("long"), p.cast("int"))
        ).otherwise(F.lit(0).cast("long"))

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(num_bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc + side(p),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    num_bits: int = 10,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-bucketed."""
    tables = F.sequence(F.lit(0), F.lit(num_tables - 1))
    b = df.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    ).select(
        "vid",
        "v",
        F.explode(
            F.transform(
                tables,
                lambda t: F.struct(
                    t.alias("table"), hyperplane_bits(F.col("v"), dim, num_bits, t).alias("bucket")
                ),
            )
        ).alias("tb"),
    ).select("vid", "v", "tb.table", "tb.bucket")
    left = b.select(F.col("vid").alias("id_a"), F.col("v").alias("va"), "table", "bucket")
    right = b.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"), "table", "bucket")
    cand = (
        left.join(right, on=["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
