"""Lexical relevance ranking: TF-IDF term extraction and BM25 search.

The retrieval layer of a training-data pipeline: TF-IDF surfaces each
document's most characteristic terms (keyword extraction, topic
labeling, df-capped boilerplate detection); BM25 scores documents
against a query term set (corpus search, nearest-neighbor text
retrieval before embedding models enter the picture).

Both are pure DataFrame compositions — explode → map-side-combined
aggregations → joins — with no Python in the hot path, and both are
ANSI-SQL-expressible so the DuckDB oracle verifies them value-for-value.

Scale shape (100 TB corpus):
* the explode shuffles (doc_id, term) pairs, but `groupBy(doc_id,
  term).count()` combines map-side, so the wire carries per-partition
  distinct pairs, not raw token occurrences;
* the term→df side is |vocab| rows (millions, not billions) — Spark's
  AQE broadcasts it when it fits, shuffles otherwise; nothing in the
  plan forces a sort;
* BM25 filters to the query's terms BEFORE any shuffle, so a k-term
  query moves only rows containing those k terms — the classic
  "search narrows first" plan;
* per-doc top-k is a windowed row_number over doc_id partitions
  (arbitrarily parallel — no global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from kafka_delta_ingest_spark.operators.text import tokens
from kafka_delta_ingest_spark.operators.util import spread


def _term_frequencies(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(tf, dl): per-(doc,term) counts and per-doc token lengths.

    Empty documents drop out (no terms, no length) — matching the SQL
    twin's `len(trim(text)) > 0` guard.

    dl is derived FROM tf (Σ tf per doc), not from a second pass over
    the token stream: the corpus is tokenized and exploded exactly once,
    and because both consumers hang off the same aggregate subtree,
    Spark's ReuseExchange serves the second branch from the first's
    shuffle files instead of re-scanning 100 TB of text.
    """
    toks = spread(df).select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return tf, dl


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tfidf(t, d) = (tf/dl) · ln(N/df) — raw idf, no smoothing: df ≥ 1
    for every term that exists, so the log is always defined, and a
    term present in every document scores exactly 0.

    Ranking happens on the UNROUNDED expression (ties broken by term
    text, so the winner set is deterministic); the emitted value is
    rounded to 6 dp. Returns (id, term, tfidf, rn) with rn ∈ 1..top_k.
    """
    tf, dl = _term_frequencies(df, text_col, id_col)
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    # N as count(dl), not a separate corpus scan: a doc appears in dl
    # iff its trimmed text is nonempty — identical census, one fewer
    # full pass over the text (r13, guide §2.4).
    n_docs = dl.agg(F.count("*").alias("n_docs"))

    score = (F.col("tf").cast("double") / F.col("dl")) * F.log(
        F.col("n_docs").cast("double") / F.col("df")
    )
    w = Window.partitionBy(id_col).orderBy(score.desc(), F.col("term"))
    return (
        tf.join(dl, id_col)
        .join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(
            id_col,
            "term",
            F.round(score, 6).alias("tfidf"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    top_k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25: top-k documents for a bag-of-words query.

    score(d) = Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(q) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    The tf table is filtered to the query's terms BEFORE the df/avgdl
    joins, so only matching rows ever shuffle. avgdl and N are global
    scalars carried as a broadcast single-row cross join — no
    collect-and-reinject, the plan stays lazy end to end.
    """
    tf, dl = _term_frequencies(df, text_col, id_col)
    # The index tokenizes lowercased text; an uppercase query term
    # would silently match nothing.
    query_terms = [t.lower() for t in query_terms]
    qtf = tf.where(F.col("term").isin(*query_terms))
    dft = qtf.groupBy("term").agg(F.count("*").alias("df"))
    # N and avgdl in ONE single-row aggregate over dl: a doc appears
    # in dl iff its trimmed text is nonempty (tokens() yields >=1 for
    # any such doc), so count(dl) == the `len(trim(text)) > 0` census
    # — this drops a separate full corpus scan plus a second broadcast
    # build from the plan (r13, guide §2.4).
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs")
    )

    idf = F.log(
        1.0 + (F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_c = F.col("tf").cast("double")
    denom = tf_c + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * tf_c * (k1 + 1.0) / denom

    scored = (
        qtf.join(dl, id_col)
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("_score"))
    )
    out = scored.orderBy(F.col("_score").desc(), id_col)
    if top_k is not None:
        out = out.limit(top_k)
    return out.select(id_col, F.round("_score", 6).alias("bm25"))


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    n_per_system: int = 50,
    c: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and
    dense (embedding cosine) rankings — the standard two-tower search
    recipe (RRF, Cormack et al. 2009: score = Σ 1/(c + rank), c=60).

    Each system contributes its top ``n_per_system`` candidates; a doc
    found by both systems sums both reciprocal ranks, a doc found by
    one keeps a single term (full outer join on the id). Lexical ranks
    order by the ROUNDED BM25 score (1e-6) with id tiebreak, so
    cross-engine float noise below the rounding grain cannot flip a
    rank.

    Scale shape: the BM25 side shuffles only rows containing a query
    term (query-result-sized, not corpus-sized); the dense side is one
    broadcast query vector against the corpus with a top-n window; the
    fusion join touches ≤ 2·n_per_system rows. Nothing downstream of
    the two rankers is corpus-sized."""
    from .similarity import cosine_topk

    # limit() first (TakeOrderedAndProject: per-partition top-n + one
    # merge), THEN rank the <= n survivors — a bare Window.orderBy over
    # every term-matching document would funnel corpus-scale rows into
    # a single task.
    lex = bm25_search(docs, query_terms, top_k=None, id_col=id_col)
    wl = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    lex_top = (
        lex.orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(n_per_system)
        .withColumn("r_lex", F.row_number().over(wl))
        .select(F.col(id_col).alias("id"), "r_lex")
    )
    qv = embeddings.filter(F.col(vec_id_col) == query_vec_id).select(
        F.lit(query_vec_id).alias("query_id"), F.col(vec_col)
    )
    dense_top = (
        cosine_topk(
            # The query vector is drawn FROM the corpus; without this
            # filter it self-matches at cosine 1.0 and wastes the top
            # dense slot on the query document itself.
            embeddings.filter(F.col(vec_id_col) != query_vec_id),
            qv,
            k=n_per_system,
            corpus_id=vec_id_col,
            corpus_vec=vec_col,
            query_vec=vec_col,
        )
        .select(F.col("neighbor_id").alias("id"), F.col("rank").alias("r_dense"))
    )
    # Full-outer semantics via union + per-id max: Spark cannot
    # broadcast a full-outer join (it would pick a sort-merge join even
    # for these ≤2n rows), while the union aggregates in one tiny
    # hash-agg with no join operator at all.
    fused = (
        lex_top.select(
            "id", "r_lex", F.lit(None).cast("int").alias("r_dense")
        )
        .unionByName(
            dense_top.select(
                "id", F.lit(None).cast("int").alias("r_lex"), "r_dense"
            )
        )
        .groupBy("id")
        .agg(
            F.max("r_lex").alias("r_lex"),
            F.max("r_dense").alias("r_dense"),
        )
        .select(
            "id",
            (
                F.coalesce(1.0 / (F.lit(c) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(c) + F.col("r_dense")), F.lit(0.0))
            ).alias("_rrf"),
            "r_lex",
            "r_dense",
        )
    )
    return (
        fused.orderBy(F.col("_rrf").desc(), F.col("id"))
        .limit(k)
        .select(
            F.col("id").alias(id_col),
            F.round("_rrf", 6).alias("rrf"),
            F.col("r_lex").cast("int").alias("lex_rank"),
            F.col("r_dense").cast("int").alias("dense_rank"),
        )
    )
