"""Benchmark decontamination: word n-gram overlap between a training
corpus and an evaluation/benchmark set.

Standard practice in LLM training-data pipelines (GPT-3 appendix C,
PaLM, Llama): a training document that shares at least one word n-gram
(n is typically 8-13) with a benchmark example is flagged and usually
dropped, so that eval scores measure generalization rather than
memorization of leaked test data.

Scale design (100 TB corpus vs an MB-scale benchmark):

* The benchmark side is tiny relative to the corpus, so its exploded
  (bench_id, gram) set is **broadcast**; flagging the corpus is then a
  broadcast-hash join — the corpus side never shuffles for the match
  step, which keeps the scan narrow end-to-end.
* Per-document overlap stats aggregate on doc_id *after* the join has
  already shrunk the stream to hit rows only — the shuffle moves only
  contaminated grams, a vanishing fraction of the corpus.
* Gram sets are ``array_distinct``-ed per document before the join, so
  a gram repeated inside one document cannot multiply join output.

All gram generation is pure ``pyspark.sql.functions`` expression work
(whole-stage codegen); semantics are mirrored 1:1 by the DuckDB oracle
in ``__spark_entry__`` (list-comprehension n-grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_delta_ingest_spark.operators.dedup import word_shingles
from kafka_delta_ingest_spark.operators.util import spread


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, n_grams, gram) — one row per DISTINCT word n-gram, with the
    document's total distinct-gram count carried alongside.

    Empty/whitespace-only texts are dropped up front: their shingle set
    is [""], and a single blank benchmark row would otherwise flag
    every blank corpus document as 100% "contaminated" on zero shared
    content."""
    df = df.where(F.length(F.trim(F.col(text_col))) > 0)
    with_grams = df.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("_grams")
    )
    return with_grams.select(
        id_col,
        F.size("_grams").alias("n_grams"),
        F.explode("_grams").alias("gram"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per contaminated document: how much of it overlaps the benchmark.

    Returns (id_col, n_grams, n_hit_grams, n_bench_docs,
    contamination_rate) for every corpus document sharing >= 1 word
    n-gram with any benchmark document. Clean documents are absent —
    at 100 TB the report must stay proportional to the contamination,
    not the corpus.
    """
    corpus_grams = _grams(spread(corpus), id_col, text_col, n)
    bench_grams = (
        _grams(benchmark, bench_id_col, bench_text_col, n)
        .select(bench_id_col, "gram")
        .dropDuplicates([bench_id_col, "gram"])
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), on="gram")
    return (
        hits.groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count_distinct("gram").alias("n_hit_grams"),
            F.count_distinct(bench_id_col).alias("n_bench_docs"),
        )
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_hit_grams").cast("double") / F.col("n_grams"), 6),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    max_hit_grams: int = 0,
    flag_corpus: DataFrame | None = None,
) -> DataFrame:
    """Drop corpus documents whose benchmark n-gram overlap exceeds
    ``max_hit_grams`` (default 0: any shared n-gram disqualifies).

    ``flag_corpus`` optionally supplies a DIFFERENT frame to compute
    the flags from (matched back to ``corpus`` by ``id_col``) — e.g.
    the pre-redaction text in a curation pipeline, so the flag side
    doesn't re-execute the redaction/scoring lineage and contamination
    is judged on the source document as published.

    Implemented as a broadcast left-anti join against the flagged id
    set, so the surviving corpus never shuffles. The flag side skips
    ``contamination_report``'s per-doc stats (gram totals, bench-doc
    counts): a drop decision only needs "shares more than
    ``max_hit_grams`` grams", so the flag pipeline is one explode, one
    broadcast join, and one count-style aggregation over hit rows only.
    """
    flag_src = corpus if flag_corpus is None else flag_corpus
    corpus_grams = _grams(spread(flag_src), id_col, text_col, n).select(id_col, "gram")
    bench_grams = (
        _grams(benchmark, bench_id_col, bench_text_col, n)
        .select("gram")
        .dropDuplicates(["gram"])
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), on="gram")
    if max_hit_grams > 0:
        flagged = (
            hits.groupBy(id_col)
            .agg(F.count("*").alias("_n_hits"))
            .filter(F.col("_n_hits") > max_hit_grams)
            .select(id_col)
        )
    else:
        flagged = hits.select(id_col).dropDuplicates([id_col])
    return corpus.join(F.broadcast(flagged), on=id_col, how="left_anti")


def semantic_contamination(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    bench_vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark contamination: flag every corpus
    vector whose best cosine against ANY benchmark vector reaches
    ``threshold`` — the semantic complement of the word-n-gram overlap
    check (paraphrased or reformatted benchmark leakage that shares no
    8-gram still lands at cosine ≈ 1).

    Returns (id_col, bench_id_col, cos_sim) for flagged vectors only —
    like ``contamination_report``, output stays proportional to the
    contamination, never the corpus.

    Scale shape: the benchmark embedding set (thousands of rows, not
    corpus-scale) is collapsed into ONE broadcast row holding an array
    of (id, vector) structs; the corpus then computes its per-row best
    match with a higher-order ``aggregate`` over that array — a pure
    map over the corpus, zero shuffles, no corpus-sized join or
    groupBy anywhere. Ties break toward the smaller benchmark id for
    engine-portable determinism."""
    from kafka_delta_ingest_spark.operators.similarity import (
        _as_double,
        l2_norm,
    )

    bid_type = bench_emb.schema[bench_id_col].dataType

    def _unit(df, idc, vecc, out):
        # Hoist the norm into its own column first: inlining l2_norm
        # inside the transform lambda would re-evaluate the O(dim) sum
        # once per ELEMENT (O(dim^2) per vector).
        return (
            df.select(F.col(idc), _as_double(F.col(vecc)).alias("_v"))
            .withColumn(
                "_n",
                F.coalesce(
                    F.nullif(l2_norm(F.col("_v")), F.lit(0.0)), F.lit(1.0)
                ),
            )
            .select(
                idc, F.transform("_v", lambda x: x / F.col("_n")).alias(out)
            )
        )

    b = _unit(
        bench_emb.select(
            F.col(bench_id_col).alias("_bid"), F.col(bench_vec_col)
        ),
        "_bid",
        bench_vec_col,
        "_bv",
    )
    # array_sort on (id, vec) structs orders by id — collect_list alone
    # has no deterministic order across partitions.
    bench_arr = b.agg(
        F.array_sort(F.collect_list(F.struct("_bid", "_bv"))).alias("_bench")
    )
    c = _unit(corpus_emb, id_col, vec_col, "_cv")
    # ONE dot product per (row, benchmark vector): score the broadcast
    # array into (cs, bid) structs, then argmax with a cheap
    # struct-compare fold — strictly-greater keeps the first (smallest)
    # benchmark id on exact ties. The id keeps its source type.
    scored = F.transform(
        F.col("_bench"),
        lambda x: F.struct(
            F.aggregate(
                F.zip_with(F.col("_cv"), x["_bv"], lambda p, q: p * q),
                F.lit(0.0),
                lambda a2, v: a2 + v,
            ).alias("cs"),
            x["_bid"].alias("bid"),
        ),
    )
    best = F.aggregate(
        scored,
        F.struct(
            F.lit(float("-inf")).alias("cs"),
            F.lit(None).cast(bid_type).alias("bid"),
        ),
        lambda acc, x: F.when(x["cs"] > acc["cs"], x).otherwise(acc),
    )
    return (
        c.crossJoin(F.broadcast(bench_arr))
        .select(id_col, best.alias("_best"))
        .where(F.col("_best.cs") >= threshold)
        .select(
            id_col,
            F.col("_best.bid").alias(bench_id_col),
            F.round(F.col("_best.cs"), 6).alias("cos_sim"),
        )
    )


def fuzzy_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Lexical-fuzzy benchmark contamination via MinHash+LSH: flag
    (corpus doc, benchmark doc) pairs whose estimated shingle-set
    Jaccard reaches ``threshold`` — the paraphrase-tolerant complement
    of the exact word-8-gram check (a lightly edited benchmark leak
    shares no 8-gram but keeps most of its shingles) and the lexical
    twin of :func:`semantic_contamination`.

    Scale shape: the benchmark's band/bucket rows AND signatures are
    benchmark-sized and broadcast; the corpus computes signatures in
    one explode + map-side min-agg (|docs| x num_hashes shuffle) and
    probes the broadcast buckets with an equi-join — the corpus never
    self-joins and never moves for the match. A doc may appear once
    per matching benchmark doc; droppers take DISTINCT ids."""
    from kafka_delta_ingest_spark.operators.dedup import (
        _banded,
        minhash_signatures,
        sig_agreement,
    )

    c_sig = minhash_signatures(corpus, id_col, text_col, num_hashes, shingle_k)
    b_sig = minhash_signatures(
        benchmark, bench_id_col, bench_text_col, num_hashes, shingle_k
    )
    # Corpus band rows CARRY their signature: the broadcast probe join
    # is a narrow map, and the candidate dedup (first(sig) — sig is
    # functionally dependent on id) shuffles candidate-scale rows
    # only. Fetching the signature back by re-joining c_sig would
    # instead recompute the corpus-wide signature lineage a second
    # time (Spark does not reuse that exchange).
    c_bb = _banded(c_sig, id_col, num_hashes, bands, carry_sig=True)
    b_bb = _banded(b_sig, bench_id_col, num_hashes, bands)
    cand = (
        c_bb.join(F.broadcast(b_bb), on=["band", "bucket"])
        .groupBy(id_col, bench_id_col)
        .agg(F.first("sig").alias("sig"))
    )
    est = sig_agreement(F.col("sig"), F.col("bsig"), num_hashes)
    return (
        cand.join(
            F.broadcast(b_sig.select(bench_id_col, F.col("sig").alias("bsig"))),
            bench_id_col,
        )
        .select(
            id_col,
            bench_id_col,
            F.round(est, 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
