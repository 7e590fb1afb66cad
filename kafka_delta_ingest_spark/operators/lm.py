"""Statistical language-model operators for corpus quality scoring.

Two published curation methods, re-expressed as pure DataFrame plans:

* **Bigram-LM perplexity** (the CCNet recipe, Wenzek et al. 2020:
  score web documents by the perplexity of a language model and keep
  the low-perplexity tail). CCNet uses a pre-trained KenLM; here the
  model is *trained on the corpus itself* in the same plan — a
  self-contained quality signal that needs no external artifact, which
  also makes it exactly reproducible by the SQL oracle.
* **Hashed-n-gram importance weights** (the DSIR recipe, Xie et al.
  2023: select pretraining data by the likelihood ratio between a
  target-domain bag-of-hashed-ngrams model and the raw-corpus model).

Scale shape (100 TB corpus, 1000 executors):

* The corpus is tokenized and exploded **once per operator**; all
  counts come off that single stream via map-side-combined
  ``groupBy``s.
* Model tables are vocabulary-sized, not corpus-sized: the bigram
  model is df-capped by ``min_count`` (rare bigrams collapse into the
  smoothing mass), the DSIR feature space is a fixed ``n_buckets``
  array. Both sit well under broadcast thresholds at any corpus size,
  so scoring is a broadcast join against the token stream — the
  100 TB side never shuffles for the model lookup.
* Everything is built-in expressions (whole-stage codegen); no Python
  UDFs anywhere.

All log-scores are rounded to 6 dp at the emit boundary so the DuckDB
oracle matches bit-for-bit despite last-ulp libm differences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from kafka_delta_ingest_spark.operators.text import tokens
from kafka_delta_ingest_spark.operators.util import spread

UNK = "<unk>"


def _lower_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w[]) for nonempty documents, lowercase whitespace tokens."""
    return (
        spread(df)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("w"))
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Per-document perplexity under a corpus-trained bigram LM.

    Pipeline (one logical plan, no driver round-trips):

    1. unigram census → vocabulary = words with count ≥ ``min_count``;
       everything else maps to ``<unk>`` (V = |vocab| + 1).
    2. bigram stream built array-side (``zip_with`` of the token array
       with its own shift — no positional self-join), then both slots
       mapped through the vocabulary with left broadcast joins.
    3. model: bigram counts c(w1,w2) and context counts c(w1) off the
       mapped stream; Laplace smoothing
       ``P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V)``.
    4. score: each document's bigrams join the model (model side is
       vocabulary-bounded → AQE broadcasts it), then one per-doc
       aggregation emits ``avg_logp`` and ``ppl = exp(-avg_logp)``.

    Documents with fewer than two tokens have no bigrams and are
    absent from the result (mirrors the SQL twin's join semantics).

    Returns (id, n_bigrams, avg_logp, ppl), rounded to 6 dp.
    """
    toks = _lower_tokens(df, text_col, id_col)

    uni = toks.select(F.explode("w").alias("word"))
    # NOT checkpointed (unlike the trigram path): a checkpointed side
    # loses catalog size stats, demoting the model joins below from
    # broadcast to sort-merge in the static plan — the pinned
    # broadcast-model shape matters more than the re-derived census
    # legs here (bigram lineage is one narrow pass, measured neutral).
    vocab = (
        uni.groupBy("word")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("word")
    )
    # V as a broadcast single-row frame — the plan stays lazy.
    v_size = vocab.agg((F.count("*") + 1).alias("v_size"))

    # Array-side bigrams: zip each token with its successor.
    n = F.size(F.col("w"))
    pairs = F.slice(
        F.zip_with(
            F.col("w"),
            F.slice(F.col("w"), 2, F.greatest(n - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        1,
        F.greatest(n - 1, F.lit(0)),
    )
    big = (
        toks.where(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # Map both slots through the vocabulary (broadcast left joins).
    v1 = F.broadcast(vocab.withColumnRenamed("word", "w1").withColumn("k1", F.lit(1)))
    v2 = F.broadcast(vocab.withColumnRenamed("word", "w2").withColumn("k2", F.lit(1)))
    mapped = (
        big.join(v1, "w1", "left")
        .join(v2, "w2", "left")
        .select(
            F.col(id_col),
            F.when(F.col("k1").isNotNull(), F.col("w1")).otherwise(UNK).alias("m1"),
            F.when(F.col("k2").isNotNull(), F.col("w2")).otherwise(UNK).alias("m2"),
        )
    )

    # Per-(doc, bigram) counts are the shared base: the model's global
    # counts AND the scoring join both hang off this one aggregate.
    dmc = mapped.groupBy(id_col, "m1", "m2").agg(F.count("*").alias("k"))
    bigram_counts = dmc.groupBy("m1", "m2").agg(F.sum("k").alias("cb"))
    context_counts = bigram_counts.groupBy("m1").agg(F.sum("cb").alias("c1"))
    model = bigram_counts.join(context_counts, "m1").crossJoin(F.broadcast(v_size))

    logp = F.log(
        (F.col("cb") + 1).cast("double") / (F.col("c1") + F.col("v_size"))
    )
    avg = F.sum(F.col("k") * logp) / F.sum("k")
    return (
        dmc.join(model, ["m1", "m2"])
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            avg.alias("_avg"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("_avg"), 6).alias("avg_logp"),
            F.round(F.exp(-F.col("_avg")), 6).alias("ppl"),
        )
    )


def trigram_sb_scores(
    df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    alpha: float = 0.4,
    train_filter: Column | None = None,
) -> DataFrame:
    """Per-document scores under a STUPID-BACKOFF trigram LM (Brants
    et al. 2007, "Large Language Models in Machine Translation" — the
    canonical distributed LM: relative frequencies with a fixed
    backoff factor instead of Kneser-Ney discounting, designed
    precisely because KN's normalization does not MapReduce at corpus
    scale).

    ``train_df`` is the training corpus (defaults to ``df``); score a
    HELD-OUT ``df`` to exercise the backoff chain — on the training
    corpus itself every observed trigram is order-3 by construction.

        S(w3|w1,w2) = c3/C2           if the trigram was seen
                    = a * cb/C1       else if the bigram (w2,w3) was
                    = a^2 * cu/N      else (unigram relative freq,
                                      1/N floor for an unseen <unk>)

    All lower-order counts derive from ONE trigram census (suffix
    marginals: cb = sum_w1 c3, cu = sum_w1,w2 cb) — a single shuffled
    aggregation tree, each level map-side combined from the previous,
    and one plan end-to-end. Words below ``min_count`` in the training
    census map to ``<unk>`` (the vocabulary joins broadcast). Scoring
    joins the per-(doc, trigram) counts against the three model levels
    — model sides are vocabulary-bounded, AQE broadcasts them when
    small and shuffles on the gram keys when not; nothing is ever
    driver-collected.

    Returns (id, n_trigrams, avg_logp, ppl, backoff_rate) rounded to
    6 dp; documents with fewer than three tokens have no trigrams and
    are absent. ``backoff_rate`` is the trigram-mass fraction scored
    below order 3 — a data-quality signal in its own right (high
    backoff = text unlike the training corpus).

    When the training corpus is a SUBSET of the scored corpus selected
    by a predicate over ``id_col`` (the held-out-split shape), pass
    ``train_filter`` instead of ``train_df``: the training census then
    derives from the score stream's own per-(doc, trigram) aggregation
    — the corpus is tokenized, mapped, and shuffled ONCE, and
    ReuseExchange serves the model branch from the scoring branch's
    shuffle files (vs. two full tokenize+map passes with a separate
    ``train_df``).
    """
    if train_filter is not None and train_df is not None:
        raise ValueError("pass train_df or train_filter, not both")
    train_toks = _lower_tokens(train_df if train_df is not None else df,
                               text_col, id_col)
    if train_filter is not None:
        train_toks = train_toks.where(train_filter)
    score_toks = _lower_tokens(df, text_col, id_col)

    # Materialize the census tables: every model marginal below is a
    # CONSUMER of the previous level, and Spark's ReuseExchange cannot
    # serve them (each marginal shuffles on different keys, and the
    # three per-slot vocab broadcasts are differently-projected legs)
    # — without a cut, the corpus lineage re-executes once per
    # consumer (measured: 56 source scans in one plan). One corpus
    # pass materializes each level; everything downstream reads the
    # stored census, which is the shape a 100 TB run needs anyway.
    vocab = (
        train_toks.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("word")
        .localCheckpoint(eager=False)
    )

    def _trigrams(toks: DataFrame) -> DataFrame:
        n = F.size(F.col("w"))
        tri = F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.struct(
                F.element_at("w", i).alias("w1"),
                F.element_at("w", i + 1).alias("w2"),
                F.element_at("w", i + 2).alias("w3"),
            ),
        )
        base = (
            toks.where(n >= 3)
            .select(F.col(id_col), F.explode(tri).alias("t"))
            .select(
                id_col,
                F.col("t.w1").alias("w1"),
                F.col("t.w2").alias("w2"),
                F.col("t.w3").alias("w3"),
            )
        )
        mapped = base
        for slot in ("w1", "w2", "w3"):
            v = F.broadcast(
                vocab.withColumnRenamed("word", slot)
                .withColumn(f"_k{slot}", F.lit(1))
            )
            mapped = mapped.join(v, slot, "left")
        return mapped.select(
            F.col(id_col),
            *[
                F.when(F.col(f"_k{s}").isNotNull(), F.col(s))
                .otherwise(UNK)
                .alias(f"m{j}")
                for j, s in enumerate(("w1", "w2", "w3"), start=1)
            ],
        )

    # one trigram census; every lower order is a marginal of it
    dtc = (
        _trigrams(score_toks)
        .groupBy(id_col, "m1", "m2", "m3")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=False)
    )
    if train_filter is not None:
        # train ⊆ score: the training census is a marginal of the
        # scoring aggregation — one tokenize/map/shuffle pass total.
        ttc = (
            dtc.where(train_filter)
            .groupBy("m1", "m2", "m3")
            .agg(F.sum("k").alias("c3"))
            .localCheckpoint(eager=False)
        )
    else:
        ttc = (
            _trigrams(train_toks)
            .groupBy("m1", "m2", "m3")
            .agg(F.count("*").alias("c3"))
            .localCheckpoint(eager=False)
        )
    ctx2 = ttc.groupBy("m1", "m2").agg(F.sum("c3").alias("C2"))
    bi = (
        ttc.groupBy("m2", "m3")
        .agg(F.sum("c3").alias("cb"))
        .localCheckpoint(eager=False)
    )
    ctx1 = bi.groupBy("m2").agg(F.sum("cb").alias("C1"))
    uni = bi.groupBy("m3").agg(F.sum("cb").alias("cu"))
    total = ttc.agg(F.sum("c3").cast("double").alias("N"))
    joined = (
        dtc.join(ttc, ["m1", "m2", "m3"], "left")
        .join(ctx2, ["m1", "m2"], "left")
        .join(bi, ["m2", "m3"], "left")
        .join(ctx1, ["m2"], "left")
        .join(uni, ["m3"], "left")
        .crossJoin(F.broadcast(total))
    )
    p = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("C2"),
        )
        .when(
            F.col("cb").isNotNull(),
            F.lit(alpha) * F.col("cb") / F.col("C1"),
        )
        .otherwise(
            F.lit(alpha * alpha)
            * F.coalesce(F.col("cu").cast("double"), F.lit(1.0))
            / F.col("N")
        )
    )
    level3 = F.col("c3").isNotNull()
    avg = F.sum(F.col("k") * F.log(p)) / F.sum("k")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            avg.alias("_avg"),
            (
                F.sum(F.when(level3, F.lit(0)).otherwise(F.col("k")))
                / F.sum("k")
            ).alias("_bo"),
        )
        .select(
            id_col,
            "n_trigrams",
            F.round(F.col("_avg"), 6).alias("avg_logp"),
            F.round(F.exp(-F.col("_avg")), 6).alias("ppl"),
            F.round(F.col("_bo"), 6).alias("backoff_rate"),
        )
    )


def _md5_bucket(col: Column, n_buckets: int) -> Column:
    """Engine-portable word→bucket hash: first 32 md5 bits mod buckets."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets
    ).alias("bucket")


def dsir_importance(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-document DSIR importance weight against a target domain.

    Data Selection via Importance Resampling (Xie et al. 2023): hash
    every token into ``n_buckets`` features, fit two smoothed
    multinomials — target p(b) and raw-corpus q(b) — and weight each
    document by the average per-token log-likelihood ratio
    ``Σ log(p(b)/q(b)) / n_tok``. High scores = most target-like;
    resampling then keeps the top mass.

    Both models are ``n_buckets`` rows (Laplace: (c(b)+1)/(n+B)) and
    ride a broadcast join; the corpus token stream shuffles only for
    its own per-bucket census and the final per-doc aggregation.

    Returns (id, n_tok, dsir_score) for nonempty documents, 6 dp.
    """
    tcol = target_text_col or text_col
    corpus_toks = _lower_tokens(df, text_col, id_col).select(
        F.col(id_col), F.explode("w").alias("word")
    )
    target_toks = (
        spread(target)
        .where(F.length(F.trim(F.col(tcol))) > 0)
        .select(F.explode(tokens(F.lower(F.col(tcol)))).alias("word"))
    )

    # Per-(doc, bucket) counts are the shared base: the corpus census
    # derives from them (ReuseExchange — the corpus tokenizes once) and
    # the scoring aggregation is token-count-weighted over them.
    dbc = corpus_toks.groupBy(
        id_col, _md5_bucket(F.col("word"), n_buckets)
    ).agg(F.count("*").alias("c"))

    qc = dbc.groupBy("bucket").agg(F.sum("c").alias("cq"))
    n_q = qc.agg(F.sum("cq").alias("n_corpus"))
    tc = target_toks.groupBy(_md5_bucket(F.col("word"), n_buckets)).agg(
        F.count("*").alias("ct")
    )
    n_t = tc.agg(F.sum("ct").alias("n_target"))

    # A bucket can be absent from the target's census; its smoothed
    # count is then 0+1 — the left join + coalesce supplies it.
    ratio = F.log(
        ((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("n_target") + n_buckets))
        / ((F.col("cq") + 1) / (F.col("n_corpus") + n_buckets))
    )
    return (
        dbc.join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(qc), "bucket")
        .crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_q))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tok"),
            F.round(F.sum(F.col("c") * ratio) / F.sum("c"), 6).alias("dsir_score"),
        )
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): within each
    language, rank documents by LM perplexity and cut into terciles —
    "head" (lowest perplexity, most fluent) is what pretraining keeps
    first.

    Perplexity comes from :func:`bigram_lm_scores` (corpus-trained
    bigram LM; CCNet uses a pretrained KenLM — a scores table from any
    external LM drops into the same bucketing step). Two formulations:

    * ``exact=True`` (the oracle twin): ntile(3) over a
      lang-partitioned window ordered by (ppl, id) — deterministic,
      engine-portable, exact tercile SIZES. The cost is a full
      per-language sort in one partition chain, which a mega-language
      turns into the job bottleneck at 100 TB.
    * ``exact=False`` (the production scale path): per-lang
      ``percentile_approx(ppl, [1/3, 2/3])`` cut points — a one-pass
      mergeable sketch hash-aggregation — broadcast back, then a pure
      filter assigns buckets. NO per-language global sort anywhere in
      the plan (pinned by tests/test_plans.py); boundary placement is
      sketch-approximate (rank error ≤ n/accuracy) but every document
      still lands in a deterministic bucket for a given dataset.

    CCNet itself computes cutoffs on a SAMPLE for the same reason —
    the approx path is the faithful production semantics, the exact
    path the certifiable twin.
    """
    scores = bigram_lm_scores(df, text_col=text_col, id_col=id_col)
    langs = df.select(F.col(id_col), F.col(lang_col))
    scored = scores.join(langs, id_col)
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    if exact:
        w = Window.partitionBy(lang_col).orderBy(
            F.col("ppl").asc(), F.col(id_col).asc()
        )
        bucket = F.ntile(3).over(w)
        return scored.select(
            id_col,
            lang_col,
            "ppl",
            F.element_at(names, bucket).alias("bucket"),
        )
    cuts = scored.groupBy(lang_col).agg(
        F.approx_percentile(
            "ppl", F.array(F.lit(1 / 3), F.lit(2 / 3)), F.lit(accuracy)
        ).alias("_cuts")
    )
    bucket = (
        F.when(F.col("ppl") <= F.col("_cuts")[0], F.lit(1))
        .when(F.col("ppl") <= F.col("_cuts")[1], F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        scored.join(F.broadcast(cuts), lang_col)
        .select(
            id_col,
            lang_col,
            "ppl",
            F.element_at(names, bucket).alias("bucket"),
        )
    )
