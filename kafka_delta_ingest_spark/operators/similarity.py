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

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from kafka_delta_ingest_spark.io import metadata_df


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

    The scoring pass is the deliberate brute-force twin (every corpus
    vector scored against every broadcast query — the O(n·q) baseline
    the ANN variants are measured against), but the top-k itself is the
    salted two-phase ``cap_per_group``: per-(query, shard) local top-k
    bounded by |corpus|/shards rows per task, then a final rank over
    ≤ shards·k survivors — no per-query corpus-sized single-task sort.
    """
    from kafka_delta_ingest_spark.operators.sampling import cap_per_group

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
    topk = cap_per_group(
        scored,
        "query_id",
        k,
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        rank_col="rank",
    )
    return topk.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
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
    c = _bucketed(corpus, corpus_id, corpus_vec, "neighbor_id", dim, num_bits, num_tables)
    q = _bucketed(queries, query_id, query_vec, "query_id", dim, num_bits, num_tables)
    # Dedup on bare id pairs; vectors re-join after (small shuffles).
    pair_ids = (
        c.join(broadcast(q), on=["table", "bucket"])
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cvecs = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), _as_double(F.col(corpus_vec)).alias("_cv")
    )
    qvecs = queries.select(
        F.col(query_id).alias("query_id"), _as_double(F.col(query_vec)).alias("_qv")
    )
    scored = (
        pair_ids.join(cvecs, "neighbor_id")
        .join(broadcast(qvecs), "query_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _plane_sign(table: int, p: int, i: int) -> float:
    """Deterministic ±1 hyperplane component from md5(table,p,i) — a pure
    function, so every executor (and every cluster size) derives the
    identical planes with zero coordination or RNG state shipping."""
    import hashlib

    digest = hashlib.md5(f"{table}:{p}:{i}".encode()).digest()
    return 1.0 if digest[0] & 1 else -1.0


def hyperplane_bits(vec: Column, dim: int, num_bits: int, table: int) -> Column:
    """Deterministic random-hyperplane signature (long), pure-expression
    form: each bit is one zip_with/aggregate dot product against a
    constant plane array. Kept as the no-Python-workers fallback; the
    hot path is :func:`hyperplane_buckets` (vectorized matmul)."""
    bits = F.lit(0).cast("long")
    for p in range(num_bits):
        plane = F.array(*[F.lit(_plane_sign(table, p, i)) for i in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits = bits + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bits


def hyperplane_buckets(dim: int, num_bits: int, num_tables: int):
    """Arrow-vectorized LSH bucketing: embedding → array<long> of one
    bucket per table, via a single numpy matmul per Arrow batch.

    The sign matrix is derived from the same md5-based pure function as
    :func:`hyperplane_bits`, so the two paths assign identical buckets.
    One (batch × dim) @ (dim × tables·bits) BLAS call replaces
    tables×bits×dim scalar expression nodes per row — at 100 TB this is
    the difference between scan-speed bucketing and a codegen blowup.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    signs = np.array(
        [
            [[_plane_sign(t, p, i) for i in range(dim)] for p in range(num_bits)]
            for t in range(num_tables)
        ]
    )  # (T, B, dim)
    planes = signs.reshape(num_tables * num_bits, dim).T  # (dim, T*B)
    weights = (1 << np.arange(num_bits)).astype(np.int64)  # (B,)

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        proj = x @ planes  # (n, T*B)
        bits = (proj > 0).reshape(len(x), num_tables, num_bits)
        out = (bits * weights).sum(axis=2)  # (n, T)
        return pd.Series(list(out))

    return _buckets


def _bucketed(
    df: DataFrame, idc: str, vecc: str, id_alias: str, dim: int, num_bits: int, num_tables: int
) -> DataFrame:
    """(id, table, bucket) rows — one per (row, table) — via the
    vectorized bucketer. Narrow op: no shuffle, blobs stay put."""
    from kafka_delta_ingest_spark.operators.util import spread

    buckets = hyperplane_buckets(dim, num_bits, num_tables)
    return (
        spread(df).select(F.col(idc).alias(id_alias), _as_double(F.col(vecc)).alias("_v"))
        .select(id_alias, F.posexplode(buckets("_v")).alias("table", "bucket"))
    )


def _unit(col: Column) -> Column:
    # Zero vectors pass through unchanged: x/0 would NaN-poison every
    # downstream dot product, comparison, and aggregate they touch.
    # The norm is let_once-bound: referenced per element of the
    # division transform, an unbound ``n`` re-runs the full l2
    # aggregate dim times per row (r12).
    from kafka_delta_ingest_spark.operators.util import let_once

    return let_once(
        l2_norm(col),
        lambda n: F.when(n == 0, col).otherwise(
            F.transform(col, lambda x: x / n)
        ),
    )


# Driver-memory ceiling on pivot/centroid counts (r10 verdict item 7):
# every pivot path ultimately materializes k × dim doubles driver-side
# (the packed broadcast row in _assign_cells, the codebook collect in
# _lloyd_means), so k must be BOUNDED regardless of corpus size. 2^16
# pivots × 1024 dims × 8 B = 512 MiB worst case — comfortably inside a
# driver heap, and past the 8*sqrt(N) crossover (N ≈ 67M) FAISS
# practice is the same: hold n_list at a fixed budget and let cells
# grow, or move to a two-level coarse quantizer (out of scope, noted).
_MAX_PIVOTS = 65_536

# Lloyd-iteration training budget (FAISS guideline: ~256 training
# samples per centroid saturates centroid quality; more rows only add
# scan cost). Training runs on a deterministic hash-sample of at most
# this many rows; ASSIGNMENT always runs on the full corpus. At any
# corpus ≤ the budget the sample is the whole corpus (sampling is a
# provable no-op, so small-SF oracle hashes are unchanged).
_KMEANS_TRAIN_BUDGET = 262_144


def _auto_cap(n: int) -> int:
    """Scale-adaptive pivot budget:
    ``min(max(128, ceil(8*sqrt(n))), _MAX_PIVOTS)`` — the FAISS
    ``n_list`` guideline (4-16 x sqrt(N)) under a fixed driver-memory
    ceiling. With k pivots the two pivot-dependent costs are
    assignment O(N*k) and within-cell pair work O(N^2/k); k ~ sqrt(N)
    balances both at O(N^1.5), where a FIXED k leaves the pair stage
    quadratic and a mod-proportional k (k = N/mod) leaves assignment
    quadratic — the r9 21.9x-at-10x cliff. The _MAX_PIVOTS clamp binds
    only past N ≈ 67M rows (8*sqrt(N) > 2^16), where unbounded k would
    grow the driver-side packed centroid row without limit. SQL twin:
    ``LIMIT (SELECT LEAST(GREATEST(128, CEIL(8*SQRT(COUNT(*)))), 65536)
    FROM t)``."""
    import math

    return min(
        max(128, int(math.ceil(8.0 * math.sqrt(max(n, 0))))),
        _MAX_PIVOTS,
    )


def _pivot_rows(df: DataFrame, id_col: str, mod: int,
                max_count) -> DataFrame:
    """Deterministic pivot selection: every ``mod``-th id, CAPPED at
    ``max_count`` (smallest ids win; ``None`` = uncapped). The cap is
    the scale guard the r9 10x capture demanded: without it the pivot
    count grows WITH the corpus and every pivot-dependent stage
    (cell assignment, PQ training/encoding) turns O(N^2/mod) — the
    measured 21.9x-at-10x on the IVFPQ composite.

    ``max_count="auto"`` (r10, the production default for coarse/cell
    pivots) sizes the cap from the corpus itself via :func:`_auto_cap`
    — one cheap metadata-backed ``count()`` job — so small corpora
    keep their natural ``N/mod`` pivots (the r9 FIXED 128 cap shrank
    sf0.1 semdedup cells 200 -> 128 and inflated its sum-|cell|^2 pair
    stage ~1.5x, confirmed by the r10 interleaved A/B) while large
    corpora grow pivots as sqrt(N), keeping both assignment and pair
    work at O(N^1.5). PQ CODEBOOKS stay fixed at 256 (2^8 codes per
    subspace is the PQ byte-code contract, not a tuning knob).
    Real deployments may instead plug :func:`kmeans_centroids` output
    into the same plan. SQL twin:
    ``WHERE id % mod = 0 ORDER BY id LIMIT <cap>``."""
    if max_count == "auto":
        max_count = _auto_cap(df.count())
    p = df.filter(F.col(id_col) % mod == 0)
    if max_count is not None:
        p = p.orderBy(F.col(id_col)).limit(max_count)
    return p


def ivf_build_index(
    corpus: DataFrame,
    centroid_mod: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    max_centroids: int | str | None = "auto",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index as two plain DataFrames — the PERSISTED
    production shape: write both to parquet (assignments bucketed or
    partitioned by ``cell``) once, then serve every future query batch
    from the stored index without touching raw embeddings again.

    Returns ``(centroids(cent_id, cvec), assignments(vec_id, vec,
    cell))``, vectors pre-normalized so queries reduce cosine to a dot
    product. Centroids are deterministic pivots (``id % centroid_mod``)
    for oracle replay; k-means centroids drop into the same schema.
    Build cost is |corpus|×|centroids| against a BROADCAST centroid
    table — no corpus shuffle.
    """
    from kafka_delta_ingest_spark.operators.util import spread

    cvecs = spread(corpus).select(
        F.col(corpus_id).alias("vec_id"),
        _unit(_as_double(F.col(corpus_vec))).alias("vec"),
    )
    # r13: the centroid table is consumed by the assignment pack AND
    # (in the ivf_topk composition) the query-probe scoring — each
    # execution re-ran the corpus-scan pivot lineage. Centroid-sized,
    # materialized once.
    cents = _pivot_rows(
        corpus, corpus_id, centroid_mod, max_centroids
    ).select(
        F.col(corpus_id).alias("cent_id"),
        _unit(_as_double(F.col(corpus_vec))).alias("cvec"),
    ).localCheckpoint(eager=False)
    # Nearest centroid per corpus vector (ties → lowest id) as a PURE
    # MAP: the centroid table packs into ONE broadcast row and each
    # vector folds over it with an aggregate expression — zero corpus
    # shuffle, zero sort; only the centroid-sized row moves.
    assigned = _assign_cells(cvecs, cents)
    return cents, assigned


def _assign_cells(
    vecs: DataFrame, cents: DataFrame, max_packed: int | None = 65536
) -> DataFrame:
    """(vec_id, vec) × (cent_id, cvec) → (vec_id, vec, cell), where
    cell = argmax dot, ties toward the lowest cent_id.

    Fast path: the centroid table collapses to a single collect_list
    row that broadcasts; the argmin is an ``aggregate`` fold over that
    array in the projection — a narrow map, so the corpus neither
    shuffles nor sorts (the row_number-window and groupBy formulations
    both move one row per vector; this moves none). The fold keeps the
    running (-dot, cent_id) minimum with an order-independent
    comparison, so the nondeterministic collect_list order cannot
    change the result.

    The packed row is tighter-bounded than a broadcast TABLE: one row
    must stay under the 2 GB row / Arrow-batch ceiling, which a
    k-means-scale centroid set (|centroids| ≈ sqrt(n)) always does but
    a pivot rule like ``ivf_build_index``'s default ``id % 10`` (10%
    of the corpus!) does not. So when the centroid count exceeds
    ``max_packed`` (default 64k: ~192-dim doubles ≈ 100 MB packed),
    fall back to the broadcast hash-join + min_by hash-agg
    formulation: still no corpus-sized sort and the partial min folds
    map-side, at the cost of one (vec_id, vec) shuffle.
    ``max_packed=None`` skips the count — callers whose centroid frame
    is construction-time known small (e.g. the Lloyd loop's k-row
    local relation) avoid a per-iteration count job."""
    if max_packed is not None and cents.count() > max_packed:
        scored = vecs.crossJoin(broadcast(cents)).select(
            "vec_id",
            "vec",
            F.struct(
                (-dot(F.col("vec"), F.col("cvec"))).alias("nd"),
                F.col("cent_id").cast("long").alias("cell"),
            ).alias("_s"),
        )
        return scored.groupBy("vec_id").agg(
            F.any_value("vec").alias("vec"),
            F.min("_s")["cell"].alias("cell"),
        )
    packed = cents.agg(
        F.collect_list(
            F.struct(F.col("cent_id").cast("long").alias("cent_id"), F.col("cvec"))
        ).alias("_cents")
    )
    # One dot per centroid, then array_min over (nd, cent_id) structs:
    # struct ordering is lexicographic, which IS the argmin-with-
    # lowest-id-tie rule, and evaluates each dot exactly once (a fold
    # with the comparison inline re-evaluates it per branch).
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            (-dot(F.col("vec"), c["cvec"])).alias("nd"),
            c["cent_id"].alias("cell"),
        ),
    )
    return vecs.crossJoin(broadcast(packed)).select(
        "vec_id",
        "vec",
        F.array_min(scored)["cell"].alias("cell"),
    )


def ivf_query_index(
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Serve ANN queries from a (possibly parquet-reloaded) IVF index:
    probe the ``n_probe`` nearest cells per query, exact re-rank
    inside. Only |query|·n_probe cells of the corpus are touched; the
    per-query candidate set is cell-bounded, so the final rank window
    never sees corpus-scale partitions."""
    qvecs = queries.select(
        F.col(query_id).alias("query_id"),
        _unit(_as_double(F.col(query_vec))).alias("_qv"),
    )
    qw = Window.partitionBy("query_id").orderBy(
        dot(F.col("_qv"), F.col("cvec")).desc(), F.col("cent_id").asc()
    )
    probes = (
        qvecs.crossJoin(broadcast(centroids))
        .withColumn("_r", F.row_number().over(qw))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "_qv", F.col("cent_id").alias("cell"))
    )
    scored = assignments.join(broadcast(probes), on="cell").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dot(F.col("vec"), F.col("_qv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _lloyd_means(assigned: DataFrame, keys: list[str], vec_col: str) -> dict:
    """One Lloyd mean update shared by the k-means and PQ trainers:
    per-(keys, dim) means with exact decimal accumulation (so the
    result is partitioning-independent), rebuilt into position-ordered
    vectors, collected to the driver (codebook-sized — n_centroids or
    m × n_centroids rows). Returns {key: vector} with a scalar key for
    a single grouping column, else a tuple key."""
    rows = (
        assigned.select(*keys, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(*keys, "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count("*")
            ).alias("m")
        )
        .groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("mvec")
        )
        .collect()
    )
    if len(keys) == 1:
        return {r[keys[0]]: list(r.mvec) for r in rows}
    return {tuple(r[k] for k in keys): list(r.mvec) for r in rows}


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    train_budget: int | None = _KMEANS_TRAIN_BUDGET,
) -> DataFrame:
    """Train spherical k-means centroids with Lloyd iterations — the
    trainer that replaces the deterministic-pivot centroids every IVF /
    IVFPQ docstring leaves as a seam.

    Returns (cent_id, cvec) in :func:`ivf_build_index`'s centroid
    schema, unit-normalized (spherical k-means: assignment by max dot
    product == max cosine on unit vectors).

    Scale shape per iteration: centroids BROADCAST to the corpus for
    assignment (a pure map — the corpus never shuffles for the lookup);
    the mean update is one hash aggregation on (cent_id, dim) after a
    posexplode — map-side combined, shuffle key space is
    n_centroids × dim tiny cells; the new centroid table collects to
    the driver (n_centroids rows). So n_iters passes over the corpus
    total, each shuffling only centroid-sized aggregates. Determinism:
    init = the ``n_centroids`` lowest-id vectors, ties in assignment
    break toward the lowest cent_id, empty cells keep their previous
    centroid — same inputs give the same centroids on any cluster
    size/partitioning (exact decimal accumulation in the mean).

    ``train_budget`` (r10 verdict item 7, the FAISS sample-train
    practice): Lloyd iterations run on a DETERMINISTIC hash-sample of
    at most this many rows — ``pmod(xxhash64(vec_id), m) = 0`` with
    ``m = ceil(N / budget)`` — so training cost is bounded at any
    corpus size while the CALLER's assignment still covers the full
    corpus against the returned centroids. At N ≤ budget, m = 1 and
    the filter passes every row: the sample IS the corpus, bit-for-bit
    the pre-r11 behavior (checked-SF oracle hashes unchanged). The
    default 262,144 ≈ 256 samples per centroid at the 1024-cell scale;
    ``None`` disables sampling."""
    from kafka_delta_ingest_spark.operators.util import spread

    # Persisted: every Lloyd iteration re-reads this frame (assignment
    # + mean update), so the corpus scan, spread() shuffle, and L2
    # normalization are paid once, not n_iters+1 times.
    vecs = (
        spread(corpus)
        .select(
            F.col(corpus_id).alias("vec_id"),
            _unit(_as_double(F.col(corpus_vec))).alias("vec"),
        )
    )
    if train_budget is not None:
        import math

        # count on the RAW corpus: a plain parquet scan answers it
        # from footer metadata, skipping spread()'s shuffle
        n = corpus.count()
        m = max(1, int(math.ceil(n / float(train_budget))))
        if m > 1:
            vecs = vecs.filter(
                F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)) == 0
            )
    vecs = vecs.persist()
    try:
        # Deterministic init: n lowest-id vectors (orderBy+limit plans
        # as TakeOrderedAndProject — distributed top-k, no global sort).
        init = (
            vecs.orderBy("vec_id")
            .limit(n_centroids)
            .collect()
        )
        cents = [(i, list(r.vec)) for i, r in enumerate(init)]
        spark = corpus.sparkSession
        for _ in range(n_iters):
            cdf = broadcast(
                metadata_df(spark, cents, "cent_id int, cvec array<double>")
            )
            assigned = _assign_cells(vecs, cdf, max_packed=None).select(
                F.col("cell").alias("cent_id"), "vec"
            )
            got = _lloyd_means(assigned, ["cent_id"], "vec")
            new_cents = []
            for cid, old in cents:
                v = got.get(cid, old)  # empty cell: keep previous centroid
                norm = sum(x * x for x in v) ** 0.5
                new_cents.append(
                    (cid, [x / norm for x in v] if norm > 0 else old)
                )
            cents = new_cents
    finally:
        vecs.unpersist()
    return metadata_df(spark, cents, "cent_id int, cvec array<double>")


def ivf_append_to_index(
    centroids: DataFrame,
    new_vectors: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Incremental index maintenance: assign a NEW batch of vectors to
    the existing (persisted) centroids — append the result to the
    assignments table, no rebuild, no old-data scan. This is the
    continuous-ingest path for the ANN index: ingest commits vectors,
    this assigns the delta against the broadcast centroid table (a pure
    map), the assignments parquet grows by the batch."""
    vecs = new_vectors.select(
        F.col(corpus_id).alias("vec_id"),
        _unit(_as_double(F.col(corpus_vec))).alias("vec"),
    )
    return _assign_cells(vecs, centroids)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_mod: int = 10,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    max_centroids: int | str | None = "auto",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into centroid cells, search
    only the ``n_probe`` cells nearest each query, exact re-rank inside.

    Composition of :func:`ivf_build_index` + :func:`ivf_query_index`
    (one Catalyst plan when inline; identical results when the index is
    persisted to parquet and reloaded — pinned by
    ``test_ivf_persisted_index_roundtrip``). With |centroids| ≈ √n this
    is the classic IVF trade: ~n_probe/√n of the corpus scored per
    query, recall < 1 by construction.
    """
    cents, assigned = ivf_build_index(
        corpus, centroid_mod=centroid_mod,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        max_centroids=max_centroids,
    )
    return ivf_query_index(
        cents, assigned, queries, k=k, n_probe=n_probe,
        query_id=query_id, query_vec=query_vec,
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: (codes, scale).

    ``codes[i] = floor(x[i] * 127 / max_abs + 0.5)`` — floor(x+0.5)
    instead of round() because engines disagree on .5 ties (HALF_UP vs
    half-even) while floor is identical everywhere. At 100 TB this is
    the 4× storage / memory-bandwidth lever for embedding columns; the
    scale rides along so dot products dequantize exactly.
    """
    max_abs = F.aggregate(
        F.transform(vec, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    scale = F.when(max_abs > 0, 127.0 / max_abs).otherwise(F.lit(1.0))
    codes = F.transform(vec, lambda x: F.floor(x * scale + 0.5).cast("int"))
    return codes, scale


def dequantize(codes: Column, scale: Column) -> Column:
    return F.transform(codes, lambda q: q.cast("double") / scale)


def quantization_fidelity(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cos_fidelity, max_abs_err): cosine between each vector and
    its int8 round-trip, plus the worst per-component error — the audit
    a pipeline runs before committing to quantized storage."""
    v = _as_double(F.col(vec_col))
    base = df.select(F.col(id_col), v.alias("_v"))
    codes, scale = quantize_int8(F.col("_v"))
    qd = base.select(id_col, "_v", dequantize(codes, scale).alias("_dq"))
    abs_err = F.array_max(
        F.zip_with(F.col("_v"), F.col("_dq"), lambda a, b: F.abs(a - b))
    )
    return qd.select(
        id_col,
        F.round(cosine(F.col("_v"), F.col("_dq")), 6).alias("cos_fidelity"),
        F.round(abs_err, 6).alias("max_abs_err"),
    )


def recall_eval(approx: DataFrame, exact: DataFrame, k: int = 10) -> DataFrame:
    """Recall@k of an ANN result against the exact brute-force result.

    Both inputs are (query_id, neighbor_id, ...) top-k frames. Returns
    one row: (mean_recall, n_queries, n_hits). The join is on the two
    id columns only (the score columns are dropped first), so the probe
    side is |queries|·k rows — trivially broadcastable at any corpus
    size; recall is measured per query then averaged so every query
    weighs equally regardless of result-set ties."""
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id")
    hits = e.join(a, on=["query_id", "neighbor_id"], how="left_semi")
    per_q = (
        e.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
            on="query_id",
            how="left",
        )
        .select(
            "query_id",
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_exact")
            ).alias("recall"),
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        )
    )
    # Decimal-accumulated mean — order-independent under Spark's
    # partial aggregation, so repeated runs agree bit-for-bit.
    return per_q.agg(
        F.round(F.avg(F.col("recall").cast("decimal(18,9)")).cast("double"), 6).alias(
            "mean_recall"
        ),
        F.count("*").alias("n_queries"),
        F.sum("n_hit").alias("n_hits"),
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
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-bucketed.

    Candidates come from grouping carrier ids per (table, bucket) and
    streaming ordered pairs (posexplode + suffix-slice) — ONE pass
    over the hyperplane-hash lineage, where a left/right aliased
    self-join would execute it twice. The vector payloads are joined
    back only onto the deduped candidate pairs."""
    from kafka_delta_ingest_spark.operators.util import _carriers, _suffix_pairs

    b = _bucketed(df, id_col, vec_col, "vid", dim, num_bits, num_tables)
    pair_ids = _suffix_pairs(
        _carriers(b, ["table", "bucket"], F.col("vid"), None),
        "id_a",
        "id_b",
    ).dropDuplicates(["id_a", "id_b"])
    vecs = df.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    cand = pair_ids.join(
        vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("vb")), "id_b")
    # r13 (guide §2.5): the cosine below is interpreted HOF work
    # (~dim*6 expression evals per pair — no codegen, no CSE), so a
    # candidate partition's cost is ~1000x what its BYTES suggest, and
    # AQE's byte-based coalescing packs the whole candidate set into
    # one task (measured: a single-task 1.4 s CPU final stage at
    # sf0.1). spread() re-widens to cluster width and its barrier
    # keeps the threshold filter from being pushed back below the
    # exchange into that same single task.
    from kafka_delta_ingest_spark.operators.util import spread

    cand = spread(cand)
    return (
        cand.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def _pq_subspaces(vcol: Column, m: int, sub_dim: int) -> Column:
    # vcol (typically a full _unit(_as_double(...)) pipeline) is
    # let_once-bound: each of the m slice lambdas would otherwise
    # inline and re-run it, m x per row (r12).
    from kafka_delta_ingest_spark.operators.util import let_once

    js = F.sequence(F.lit(0), F.lit(m - 1))
    return F.explode(
        let_once(
            vcol,
            lambda v: F.transform(
                js,
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    F.slice(v, j * sub_dim + 1, sub_dim).alias("sv"),
                ),
            ),
        )
    )


def _pq_l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_train_codebooks(
    corpus: DataFrame,
    dim: int = 64,
    m: int = 8,
    n_centroids: int = 16,
    n_iters: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Train real PQ codebooks — per-subspace k-means (Jegou et al.'s
    actual trainer), replacing the deterministic pivots ``pq_topk``
    defaults to. Returns (j, cent_id, cv) ready for
    ``pq_topk(codebooks=...)`` / persistence as parquet.

    ALL ``m`` subspaces train in ONE Spark plan per iteration: the
    codebook table (m × n_centroids rows) broadcasts, assignment is a
    min_by hash aggregation (no window sort), and the mean update
    aggregates (j, code, dim-pos) cells with exact decimal accumulation
    — shuffle key space is m × n_centroids × sub_dim tiny cells however
    large the corpus. Deterministic: init = subvectors of the
    n_centroids lowest-id vectors, ties toward the lowest cent_id,
    empty cells keep their previous centroid.
    """
    assert dim % m == 0
    sub_dim = dim // m
    from kafka_delta_ingest_spark.operators.util import spread

    # Persisted: each iteration's assignment + mean update re-reads the
    # subspace frame; the corpus scan, normalization, and m-way
    # subspace explode are paid once, not n_iters times.
    vecs = (
        spread(corpus)
        .select(
            F.col(corpus_id).alias("vec_id"),
            _pq_subspaces(
                _unit(_as_double(F.col(corpus_vec))), m, sub_dim
            ).alias("s"),
        )
        .select("vec_id", "s.j", "s.sv")
        .persist()
    )
    try:
        init = (
            corpus.orderBy(corpus_id)
            .limit(n_centroids)
            .select(_unit(_as_double(F.col(corpus_vec))).alias("v"))
            .collect()
        )
        books = [
            (j, cid, [float(x) for x in r.v[j * sub_dim:(j + 1) * sub_dim]])
            for cid, r in enumerate(init)
            for j in range(m)
        ]
        spark = corpus.sparkSession
        for _ in range(n_iters):
            cb = broadcast(
                metadata_df(spark, books, "j int, cent_id int, cv array<double>")
            )
            assigned = (
                vecs.join(cb, "j")
                .withColumn("_d", _pq_l2sq(F.col("sv"), F.col("cv")))
                .groupBy("vec_id", "j")
                .agg(
                    F.min_by(
                        F.col("cent_id"),
                        F.struct(F.col("_d"), F.col("cent_id")),
                    ).alias("code"),
                    F.first("sv").alias("sv"),
                )
            )
            got = _lloyd_means(assigned, ["j", "code"], "sv")
            books = [
                (j, cid, got.get((j, cid), cv)) for j, cid, cv in books
            ]
    finally:
        vecs.unpersist()
    return metadata_df(spark, books, "j int, cent_id int, cv array<double>")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    centroid_mod: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    codebooks: DataFrame | None = None,
    max_centroids: int | None = 256,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC).

    Vectors split into ``m`` subvectors; each subspace gets a codebook
    (deterministic pivots ``id % centroid_mod == 0``, like ``ivf_topk``
    — plug k-means codebooks into the same plan on a real deployment).
    A corpus vector is stored as ``m`` small codes — dim floats
    collapse to m bytes, the 32x storage compression that lets a
    trillion-vector index live in memory — and query-to-corpus distance
    is approximated by summing the query's precomputed distance to each
    coded centroid (Jegou et al., PQ for nearest neighbor search).

    Scale shape: codebooks and the per-query distance tables are
    BROADCAST (|pivots| x m rows); encoding scores the corpus against
    broadcast pivots with no corpus shuffle; the ADC pass joins the
    compact code table to the distance tables and aggregates m partial
    distances per (query, neighbor) with exact decimal accumulation so
    the result is order-independent (and DuckDB-replicable).
    """
    assert dim % m == 0
    sub_dim = dim // m

    from kafka_delta_ingest_spark.operators.util import spread

    corpus_sub = (
        spread(corpus)
        .select(
            F.col(corpus_id).alias("neighbor_id"),
            _pq_subspaces(_unit(_as_double(F.col(corpus_vec))), m, sub_dim).alias("s"),
        )
        .select("neighbor_id", "s.j", "s.sv")
    )
    if codebooks is not None:
        # Trained codebooks (pq_train_codebooks, or parquet-reloaded):
        # same (cent_id, j, cv) contract, plugged into the same plan.
        piv_sub = codebooks.select("cent_id", "j", "cv")
    else:
        # r13: the interpreted subspace expansion ran in the pivot
        # limit's ONE task (profiled 503 ms single-task CPU); spread()
        # re-widens it. The two broadcasts consuming piv_sub (codes
        # join + query ADC join) already share ONE build via Spark's
        # broadcast-exchange reuse — a localCheckpoint here was
        # A/B-tested and LOST (it broke the reuse); not added.
        piv_sub = (
            spread(_pivot_rows(corpus, corpus_id, centroid_mod, max_centroids))
            .select(
                F.col(corpus_id).alias("cent_id"),
                _pq_subspaces(_unit(_as_double(F.col(corpus_vec))), m, sub_dim).alias("s"),
            )
            .select("cent_id", "s.j", F.col("s.sv").alias("cv"))
        )
    # argmin per (vector, subspace) as min_by over a (distance, id)
    # struct: a hash aggregation with map-side partial combine — no
    # per-group sort, unlike the row_number-window formulation. The
    # struct's lexicographic order makes ties break toward the lowest
    # centroid id, matching the oracle's ORDER BY d, cent_id.
    codes = (
        corpus_sub.join(broadcast(piv_sub), on="j")
        .withColumn("_d", _pq_l2sq(F.col("sv"), F.col("cv")))
        .groupBy("neighbor_id", "j")
        .agg(
            F.min_by(
                F.col("cent_id"), F.struct(F.col("_d"), F.col("cent_id"))
            ).alias("code")
        )
    )
    q_sub = (
        queries.select(
            F.col(query_id).alias("query_id"),
            _pq_subspaces(_unit(_as_double(F.col(query_vec))), m, sub_dim).alias("s"),
        )
        .select("query_id", "s.j", F.col("s.sv").alias("qv"))
    )
    qd = q_sub.join(broadcast(piv_sub), on="j").select(
        "query_id", "j", "cent_id", _pq_l2sq(F.col("qv"), F.col("cv")).alias("d")
    )
    scored = (
        codes.join(
            broadcast(qd),
            on=[codes.j == qd.j, codes.code == qd.cent_id],
        )
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("d").cast("decimal(26,12)"))
            .cast("double")
            .alias("approx_d")
        )
    )
    # Two-phase top-k (salted cap_per_group): flat PQ necessarily scores
    # every (query, corpus-code) pair, but the per-query rank no longer
    # sorts corpus-sized partitions in one task — phase 1 keeps each
    # (query, shard)'s local top-k, phase 2 ranks ≤ shards·k survivors.
    # Production traffic at 100 TB should still prefer ivfpq_topk, which
    # restricts candidates via coarse cells BEFORE ADC scoring.
    from kafka_delta_ingest_spark.operators.sampling import cap_per_group

    topk = cap_per_group(
        scored,
        "query_id",
        k,
        order_by=[F.col("approx_d").asc(), F.col("neighbor_id").asc()],
        rank_col="rank",
    )
    return topk.select(
        "query_id", "neighbor_id", F.round("approx_d", 6).alias("approx_d"), "rank"
    )


def semdedup(
    df: DataFrame,
    threshold: float = 0.9,
    centroid_mod: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int | str | None = "auto",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication of an
    embedding corpus by within-cluster cosine similarity.

    The published recipe: k-means the embeddings, then inside each
    cluster drop all but one member of every group whose pairwise
    cosine exceeds ``threshold``. Here clusters come from the same
    deterministic pivot assignment as ``ivf_topk`` (``id %
    centroid_mod == 0``) so the DuckDB oracle replicates them exactly;
    a real deployment plugs k-means centroids into the identical plan.

    The keep rule is greedy-by-id: a vector is dropped iff some
    LOWER-id cell-mate sits within the threshold. Deterministic, one
    pair pass, no iteration — and because every comparison is confined
    to a cell, the pair join is an equi-join on the cell key
    (Σ|cell|² work, the trade SemDeDup makes by design), never a
    corpus cross product.

    Returns one row per vector: (id, cell, kept). Degenerate edge: an
    EMPTY pivot set (no id hits the centroid_mod grid) assigns every
    vector cell=null and keeps everything — nothing to cluster means
    nothing to dedup (the earlier crossJoin formulation silently
    returned an empty frame, i.e. dropped the whole corpus).
    """

    from kafka_delta_ingest_spark.operators.util import spread

    vecs = spread(df).select(
        F.col(id_col).alias("vec_id"),
        _unit(_as_double(F.col(vec_col))).alias("vec"),
    )
    cents = _pivot_rows(df, id_col, centroid_mod, max_centroids).select(
        F.col(id_col).alias("cent_id"),
        _unit(_as_double(F.col(vec_col))).alias("cvec"),
    )
    # Packed-broadcast pure-map assignment (same argmax-dot /
    # lowest-id tie rule): the crossJoin + per-vid row_number window
    # this replaces expanded the corpus |cents|-fold and then sort-
    # shuffled every expanded row on vid.
    assigned = _assign_cells(vecs, cents).select(
        F.col("vec_id").alias("vid"), F.col("vec").alias("_v"), "cell"
    )
    a = assigned.select(F.col("vid").alias("id_a"), F.col("_v").alias("va"), "cell")
    b = assigned.select(F.col("vid").alias("id_b"), F.col("_v").alias("vb"), "cell")
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dot(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias("vid"))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return (
        assigned.join(dropped, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.col("_drop").isNull().alias("kept"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    centroid_mod: int = 10,
    coarse_mod: int = 25,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    max_coarse: int | str | None = "auto",
    max_centroids: int | None = 256,
) -> DataFrame:
    """IVF-PQ composite index (the FAISS IVFPQ layout, Jegou et al.):
    coarse cells restrict WHICH vectors each query scores (``n_probe``
    nearest cells), PQ codes give the compressed ADC scoring INSIDE the
    probed cells. The two halves are exactly ``ivf_topk``'s cell
    machinery and ``pq_topk``'s code machinery composed; codes encode
    the raw unit vector (residual encoding plugs into the same plan).

    Scale shape: coarse centroids, probe lists, per-query ADC tables
    all broadcast; the corpus never shuffles for assignment or
    encoding; the candidate restriction happens BEFORE the m-fold code
    expansion, so ADC work is |query|·n_probe·cell-size·m, not
    corpus-sized.
    """
    assert dim % m == 0
    sub_dim = dim // m

    from kafka_delta_ingest_spark.operators.util import spread

    # r13 negative results, documented: a cvecs checkpoint (the corpus
    # unit-transform, consumed by assignment AND code expansion) LOST
    # its A/B (+0.4-0.5 s min over 3 alternating rounds) — at equal
    # parallelism the duplicated narrow transform is cheaper than
    # materializing and re-reading |corpus| x dim doubles. Checkpoints
    # on coarse/piv_sub also lost: their twin broadcasts already share
    # one build via broadcast-exchange reuse. Both left as-is.
    cvecs = spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        _unit(_as_double(F.col(corpus_vec))).alias("_v"),
    )
    qvecs = queries.select(
        F.col(query_id).alias("query_id"),
        _unit(_as_double(F.col(query_vec))).alias("_qv"),
    )
    coarse = _pivot_rows(corpus, corpus_id, coarse_mod, max_coarse).select(
        F.col(corpus_id).alias("cell_id"),
        _unit(_as_double(F.col(corpus_vec))).alias("_cell"),
    )
    aw = Window.partitionBy("neighbor_id").orderBy(
        dot(F.col("_v"), F.col("_cell")).desc(), F.col("cell_id").asc()
    )
    assigned = (
        cvecs.crossJoin(broadcast(coarse))
        .withColumn("_r", F.row_number().over(aw))
        .filter(F.col("_r") == 1)
        .select("neighbor_id", F.col("cell_id").alias("cell"))
    )
    qw = Window.partitionBy("query_id").orderBy(
        dot(F.col("_qv"), F.col("_cell")).desc(), F.col("cell_id").asc()
    )
    probes = (
        qvecs.crossJoin(broadcast(coarse))
        .withColumn("_r", F.row_number().over(qw))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", F.col("cell_id").alias("cell"))
    )

    piv_sub = (
        spread(_pivot_rows(corpus, corpus_id, centroid_mod, max_centroids))
        .select(
            F.col(corpus_id).alias("cent_id"),
            _pq_subspaces(_unit(_as_double(F.col(corpus_vec))), m, sub_dim).alias("s"),
        )
        .select("cent_id", "s.j", F.col("s.sv").alias("cv"))
    )
    corpus_sub = cvecs.select(
        "neighbor_id", _pq_subspaces(F.col("_v"), m, sub_dim).alias("s")
    ).select("neighbor_id", "s.j", "s.sv")
    codes = (
        corpus_sub.join(broadcast(piv_sub), on="j")
        .withColumn("_d", _pq_l2sq(F.col("sv"), F.col("cv")))
        .groupBy("neighbor_id", "j")
        .agg(
            F.min_by(
                F.col("cent_id"), F.struct(F.col("_d"), F.col("cent_id"))
            ).alias("code")
        )
    )
    q_sub = qvecs.select(
        "query_id", _pq_subspaces(F.col("_qv"), m, sub_dim).alias("s")
    ).select("query_id", "s.j", F.col("s.sv").alias("qv"))
    qd = q_sub.join(broadcast(piv_sub), on="j").select(
        "query_id", "j", "cent_id", _pq_l2sq(F.col("qv"), F.col("cv")).alias("d")
    )

    candidates = assigned.join(broadcast(probes), on="cell").select(
        "query_id", "neighbor_id"
    )
    scored = (
        candidates.join(codes, on="neighbor_id")
        .join(
            broadcast(qd.withColumnRenamed("cent_id", "code")),
            on=["query_id", "j", "code"],
        )
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("d").cast("decimal(26,12)"))
            .cast("double")
            .alias("approx_d")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("approx_d", 6).alias("approx_d"),
            "rank",
        )
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Elementwise mean-pool chunk embeddings into one vector per
    group — the chunk→document aggregation every RAG/embedding
    pipeline runs after splitting documents for the encoder.

    Returns (group_col, embedding: array<double>, n_chunks).

    Scale shape: ``posexplode`` turns |rows|×dim cells into a
    (group, position) aggregation — dimension-major, so the shuffle
    key space is |groups|×dim tiny cells and partial aggregation
    combines map-side. Accumulation is exact decimal (engine-portable:
    float sum order varies across partitions, decimal does not), cast
    back to double only at the end. Reassembly sorts each group's dim
    positions inside ``collect_list``-free ``array_agg`` via a struct
    sort — no per-group window."""
    cells = df.select(
        F.col(group_col),
        F.col(id_col),
        F.posexplode(_as_double(F.col(vec_col))).alias("_pos", "_x"),
    )
    pooled = (
        cells.groupBy(group_col, "_pos")
        .agg(
            # Exact decimal SUM, then one double division — decimal/int
            # division scale rules differ across engines, double IEEE
            # division does not.
            F.round(
                F.sum(F.col("_x").cast("decimal(28,12)")).cast("double")
                / F.count_distinct(id_col),
                6,
            ).alias("_m"),
            F.count_distinct(id_col).alias("_n"),
        )
        .groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("_m")))
            ).alias("_pm"),
            F.max("_n").alias("n_chunks"),
        )
        .select(
            group_col,
            F.transform(F.col("_pm"), lambda s: s["_m"]).alias(vec_col),
            F.col("n_chunks").cast("long").alias("n_chunks"),
        )
    )
    return pooled
