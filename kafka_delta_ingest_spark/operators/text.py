"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All pure ``pyspark.sql.functions`` expressions (whole-stage codegen, no
Python UDFs) so they run at scan speed over 100 TB of documents — with
ONE documented exception: :func:`unicode_normalize` is an
Arrow-batched pandas UDF, because Spark has no built-in UAX #15
normalizer (its oracle uses DuckDB's independent implementation
instead of an ANSI restatement). Every other operator is deliberately
expressible in ANSI SQL so the DuckDB oracle can verify it
bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

# Normalization: lowercase + collapse whitespace. Shared by fingerprint
# and dedup so their notions of "same text" agree.
_WS = r"\s+"


def normalize_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), _WS, " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty text → empty array."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# A compact english-ish stopword list; both Spark and the SQL oracle
# filter against the same literal set.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "this", "that",
)

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-replicable.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def _let(value: Column, body) -> Column:
    # expression-level LET (see operators.util.let_once): HOFs and
    # their arguments are interpreted with no CSE, so an unbound
    # ``tokens(col)`` re-runs its regexp split at EVERY reference —
    # each combinator below referenced it 3-10x per row (r13).
    from kafka_delta_ingest_spark.operators.util import let_once

    return let_once(value, body)


def stopword_ratio(col: Column) -> Column:
    return _let(
        tokens(F.lower(col)),
        lambda toks: F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast(
                "double"
            )
            / F.size(toks)
        ),
    )


def punct_ratio(col: Column) -> Column:
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[.!?,;:]", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / F.length(col)
    )


def mean_token_len(col: Column) -> Column:
    def body(toks: Column) -> Column:
        total = F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
            total.cast("double") / F.size(toks)
        )

    return _let(tokens(col), body)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation
    presence + stopword presence + sane mean word length.

    The exact formula matters less than determinism: each component is a
    simple bounded ratio so the score is stable across engines.
    The token arrays and the mean-token-length value are LET-bound
    (r13): inlined, the wordlen band alone evaluated mean_token_len
    twice and each component re-split the text — ~10 interpreted
    regexp splits per row for one score. The arithmetic per value is
    unchanged.
    """
    n = F.length(col)
    len_component = F.least(n.cast("double") / 500.0, F.lit(1.0))
    punct_component = F.least(punct_ratio(col) * 20.0, F.lit(1.0))
    stop_component = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))

    def with_mtl(mtl: Column) -> Column:
        wordlen_component = F.when(
            (mtl >= 3.0) & (mtl <= 10.0), 1.0
        ).otherwise(0.0)
        return F.round(
            0.4 * len_component
            + 0.2 * punct_component
            + 0.2 * stop_component
            + 0.2 * wordlen_component,
            6,
        )

    return _let(mean_token_len(col), with_mtl)


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(F.lower(col))

    def marker_hits(markers):
        # one-parameter closure: PySpark HOFs treat 2-arg lambdas as
        # (element, index), so defaults can't be used to capture here
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    return {lang: marker_hits(m) for lang, m in LANG_MARKERS.items()}


def lang_id(col: Column) -> Column:
    """Stopword-marker language ID; ties break in LANG_MARKERS order,
    zero hits → 'unknown'.

    LET-bound (r13): the token array, the per-language hit counts, and
    their max are each bound once — the inlined argmax/when chain
    referenced the hit counts ~16x, re-running the regexp split every
    time. Comparison structure and tie-breaks are unchanged."""
    langs = list(LANG_MARKERS)

    def with_scores(sc: Column) -> Column:
        def with_mx(mx: Column) -> Column:
            out = F.lit("unknown")
            for i, lang in reversed(list(enumerate(langs))):
                out = F.when(
                    (mx > 0) & (sc[i] == mx), F.lit(lang)
                ).otherwise(out)
            return out

        mx = sc[0]
        for i in range(1, len(langs)):
            mx = F.greatest(mx, sc[i])
        return _let(mx, with_mx)

    def with_toks(toks: Column) -> Column:
        hits = [
            F.size(F.filter(toks, lambda t: t.isin(*m)))
            for m in LANG_MARKERS.values()
        ]
        return _let(F.array(*hits), with_scores)

    return _let(tokens(F.lower(col)), with_toks)


# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space
# symbols — the GPT-2-style split that approximates subword token counts
# far better than whitespace on punctuation-heavy text.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (codegen regexp_count, no UDF)."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def fingerprint_md5(col: Column) -> Column:
    """Deterministic document fingerprint: md5 over normalized text."""
    return F.md5(normalize_text(col))


ROLLING_HASH_MOD = 1_000_000_007


def fingerprint_rolling(col: Column) -> Column:
    """Polynomial rolling hash over normalized text (codegen arithmetic).

    h = (h*31 + char_code) mod 1e9+7 — the modulus keeps every
    intermediate below 2^35 so the expression is safe under ANSI
    overflow checking and bit-for-bit portable to the SQL oracle.
    """
    norm = normalize_text(col)
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (
            acc * F.lit(31).cast("long")
            + F.coalesce(F.ascii(ch).cast("long"), F.lit(0))
        )
        % F.lit(ROLLING_HASH_MOD),
    )


def word_bigrams(col: Column) -> Column:
    """All word bigrams of normalized text, WITH multiplicity (unlike
    ``word_shingles`` this does not dedup — repetition metrics need the
    raw occurrence counts). <2 words → empty array."""
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
    bg = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, 2)))
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(bg)


def dup_word_fraction(col: Column) -> Column:
    """Fraction of word occurrences that repeat an earlier word
    (1 − distinct/total) — the word-level analog of the duplicate-line
    fraction used by C4/Gopher-style quality filters."""
    words = F.split(normalize_text(col), " ")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(words)).cast("double") / F.size(words), 6
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics for quality filtering:
    (id, n_words, dup_word_frac, top_bigram_frac).

    ``top_bigram_frac`` (share of bigram occurrences taken by the single
    most frequent bigram — Gopher's top-2-gram filter) is a per-doc
    MODE, computed entirely in expression space: count each DISTINCT
    bigram with a nested filter HOF, then array_max. That is
    O(n·distinct) comparisons per doc — the right trade through
    ~10k-word documents, with zero shuffle and zero explode. (An
    explode→count→max formulation is asymptotically better for huge
    docs but Spark pushes the Generate's ``size(arr)>0`` guard below
    the repartition, evaluating the whole bigram expression twice —
    once on the unspread input — which made it 8× slower here.)"""
    from kafka_delta_ingest_spark.operators.util import spread

    c = F.col(text_col)
    base = spread(df).select(
        F.col(id_col),
        F.split(normalize_text(c), " ").alias("_w"),
        word_bigrams(c).alias("_bg"),
    )
    counts = F.transform(
        F.array_distinct("_bg"),
        lambda g: F.size(F.filter(F.col("_bg"), lambda x: x == g)),
    )
    return base.select(
        F.col(id_col),
        F.size("_w").alias("n_words"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("_w")).cast("double") / F.size("_w"), 6
        ).alias("dup_word_frac"),
        F.round(
            F.coalesce(F.array_max(counts), F.lit(0)).cast("double")
            / F.greatest(F.size("_bg"), F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
    )


def corpus_top_ngrams(
    df: DataFrame,
    n: int = 3,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide top-k n-grams by DOCUMENT frequency (g, doc_freq).

    Document frequency (via per-doc distinct shingles) rather than raw
    occurrence count: it is the quantity dedup df-caps and boilerplate
    detectors need, and the per-doc dedup bounds each doc's contribution
    to any gram at 1. The groupBy combines map-side, so the shuffle is
    |distinct grams| rows; the ordered top-k is a TakeOrdered, not a
    full sort."""
    from kafka_delta_ingest_spark.operators.dedup import word_shingles
    from kafka_delta_ingest_spark.operators.util import spread

    grams = spread(df).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    return (
        grams.groupBy("g")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("g"))
        .limit(top_k)
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass profile: token count, ratios, quality, language, fingerprint.

    LAYERED projections (r13, guide §1.2/§4.1): the naive single-select
    form hand-inlines ``tokens()`` (an interpreted regexp split — HOFs
    and their arguments get no codegen and no CSE) into every metric;
    the lang-ID argmax chain alone references the token array ~16x, so
    the split ran ~30x per row (measured: 7.4 s at sf0.1). Computing
    the two token arrays ONCE as real columns and deriving every
    metric from attribute references removes all re-evaluation;
    CollapseProject keeps the layers separate because the producers
    are non-cheap and multiply-referenced (SPARK-36718). The arithmetic
    per output value is expression-identical to the single-select form
    (components bound to columns, rounding only at emit — the same
    s → m → final layering as the SQL oracle twin)."""
    from kafka_delta_ingest_spark.operators.util import spread

    c = F.col(text_col)
    base = spread(df).select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        (F.length(c) - F.length(F.regexp_replace(c, r"[.!?,;:]", "")))
        .alias("_np"),
        tokens(c).alias("_tk"),
        tokens(F.lower(c)).alias("_tkl"),
        fingerprint_md5(c).alias("fingerprint"),
    )
    tk, tkl = F.col("_tk"), F.col("_tkl")
    nc = F.col("n_chars")
    mid = base.select(
        F.col(id_col),
        "n_chars",
        "fingerprint",
        F.size(tk).alias("n_tokens"),
        F.when(nc == 0, F.lit(0.0))
        .otherwise(F.col("_np").cast("double") / nc)
        .alias("_praw"),
        F.when(F.size(tkl) == 0, F.lit(0.0))
        .otherwise(
            F.size(F.filter(tkl, lambda t: t.isin(*STOPWORDS))).cast(
                "double"
            )
            / F.size(tkl)
        )
        .alias("_sraw"),
        F.when(F.size(tk) == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(
                tk, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.size(tk)
        )
        .alias("_mraw"),
        *[
            F.size(F.filter(tkl, lambda t: t.isin(*m))).alias(f"_h_{lang}")
            for lang, m in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    mx = F.col(f"_h_{langs[0]}")
    for lang in langs[1:]:
        mx = F.greatest(mx, F.col(f"_h_{lang}"))
    lang_pred = F.lit("unknown")
    for lang in reversed(langs):
        lang_pred = F.when(
            (mx > 0) & (F.col(f"_h_{lang}") == mx), F.lit(lang)
        ).otherwise(lang_pred)
    praw, sraw, mraw = F.col("_praw"), F.col("_sraw"), F.col("_mraw")
    quality = F.round(
        0.4 * F.least(nc.cast("double") / 500.0, F.lit(1.0))
        + 0.2 * F.least(praw * 20.0, F.lit(1.0))
        + 0.2 * F.least(sraw * 5.0, F.lit(1.0))
        + 0.2 * F.when((mraw >= 3.0) & (mraw <= 10.0), 1.0).otherwise(0.0),
        6,
    )
    return mid.select(
        F.col(id_col),
        F.col("n_tokens"),
        "n_chars",
        F.round(praw, 6).alias("punct_ratio"),
        F.round(sraw, 6).alias("stopword_ratio"),
        F.round(mraw, 6).alias("mean_token_len"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        "fingerprint",
    )


def shared_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """Repeated ``window``-word passages across documents — the
    exact-substring signal behind boilerplate/license/quote detection
    in training-data curation (Lee et al. 2022 deduplicate long
    repeated substrings; a ~50-token window is their operating point).

    Per passage found in >= ``min_docs`` documents: its md5, the doc
    count, and the min/max carrier ids. Scale shape: windows are
    md5-keyed BEFORE the aggregation, so the shuffle moves 32-char
    digests rather than ~350-char passages, and the per-doc distinct
    window sets (``word_shingles``) mean a plain count(*) equals the
    document frequency — no count_distinct expand pass.
    """
    from kafka_delta_ingest_spark.operators.dedup import word_shingles
    from kafka_delta_ingest_spark.operators.util import spread

    grams = spread(df).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), window)).alias("_w"),
    )
    keyed = grams.select(id_col, F.md5("_w").alias("passage"))
    return (
        keyed.groupBy("passage")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_shared_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """The removal half of Lee et al. 2022: strip every token covered
    by a ``window``-word passage that repeats across >= ``min_docs``
    documents, keeping the copy in the passage's lowest-id carrier —
    boilerplate/license/navigation text disappears corpus-wide while
    one canonical occurrence survives.

    Returns (id, n_tok, n_removed, clean_text). Passage keys are
    CASE-INSENSITIVE (md5 over the lowercased window), matching
    :func:`shared_passages`'s census semantics — what the census
    reports repeated, this removes — while ``clean_text`` rebuilds
    from the ORIGINAL tokens, preserving the surviving text's case.

    Scale shape: windows are md5-keyed before any shuffle (digests
    move, not ~350-char passages); the repeated-passage table is
    proportional to the amount of boilerplate, not the corpus, and AQE
    broadcasts it when small; coverage positions and the per-doc
    rebuild are bounded by document length (the collect_list is
    per-doc, never corpus-wide). Overlapping repeated windows union
    naturally into maximal covered spans, matching the paper's
    remove-covered-spans semantics.
    """
    from kafka_delta_ingest_spark.operators.util import spread

    base = (
        spread(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
        .withColumn("_n", F.size("_w"))
    )
    # Position-aware windows: (id, start, md5(passage)). Docs shorter
    # than the window produce none and pass through untouched.
    wins = base.where(F.col("_n") >= window).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("_n") - window),
                lambda s: F.struct(
                    s.cast("int").alias("start"),
                    F.md5(
                        F.lower(
                            F.concat_ws(
                                " ", F.slice(F.col("_w"), s + 1, window)
                            )
                        )
                    ).alias("passage"),
                ),
            )
        ).alias("p"),
    ).select(id_col, "p.start", "p.passage")
    rep = (
        wins.select("passage", id_col)
        .distinct()
        .groupBy("passage")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("_keeper"))
        .filter(F.col("n_docs") >= min_docs)
        .select("passage", "_keeper")
    )
    covered = (
        wins.join(rep, "passage")
        .filter(F.col(id_col) != F.col("_keeper"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + window - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    toks = base.select(
        id_col, F.posexplode("_w").alias("pos", "word")
    )
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("word")))
                ),
                lambda s: s["word"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select(id_col, F.col("_n").cast("long").alias("n_tok"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_tok",
            (F.col("n_tok") - F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def chunk_sliding(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG / embedding-prep
    splitter: token windows of ``chunk_tokens``, a new window every
    ``stride`` tokens, the tail window shorter. Every nonempty
    document emits at least one chunk.

    Narrow operation: tokenize + per-row explode, no shuffle anywhere
    — at 100 TB this runs at scan speed and the output is written
    partition-local. Integer window arithmetic only, so the DuckDB
    oracle reproduces chunk boundaries exactly.

    Returns (id, chunk_ix, n_tok, chunk_text).
    """
    from kafka_delta_ingest_spark.operators.util import spread

    toks = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.size("w") - 1, F.lit(stride))
    chunk = F.slice(F.col("w"), F.col("s") + 1, chunk_tokens)
    return (
        spread(df)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), toks.alias("w"))
        .select(F.col(id_col), "w", F.explode(starts).alias("s"))
        .select(
            F.col(id_col),
            (F.col("s") / stride).cast("int").alias("chunk_ix"),
            F.size(chunk).alias("n_tok"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


# Gopher quality rules (Rae et al. 2021, appendix A1.1) — the canonical
# heuristic filter battery for web-scale pretraining corpora. Every rule
# is a pure expression over one tokenize/line-split pass, and each is
# deliberately SQL-expressible so the DuckDB oracle verifies the exact
# per-document rule decisions.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict[str, Column]:
    """Per-rule boolean columns; True = the document PASSES the rule."""
    toks = tokens(col)
    n_words = F.size(toks)
    mtl = mean_token_len(col)
    lines = F.split(col, "\n")
    n_lines = F.size(lines)
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))
    )
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.ltrim(ln).rlike("^[-*•]"))
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    hash_chars = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
    low = F.lower(col)
    stop_hits = sum(
        (
            F.when(
                F.array_contains(tokens(low), w), F.lit(1)
            ).otherwise(F.lit(0))
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    nz = F.greatest(n_words, F.lit(1))
    nzl = F.greatest(n_lines, F.lit(1))
    return {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mtl >= 3.0) & (mtl <= 10.0),
        "hash_ratio_ok": hash_chars.cast("double") / nz <= 0.1,
        "ellipsis_line_ratio_ok": ellipsis_lines.cast("double") / nzl <= 0.3,
        "bullet_line_ratio_ok": bullet_lines.cast("double") / nzl <= 0.9,
        "alpha_word_ratio_ok": alpha_words.cast("double") / nz >= 0.8,
        "stopword_ok": stop_hits >= 2,
    }


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, <rule flags...>, gopher_keep) — keep iff every rule passes."""
    from kafka_delta_ingest_spark.operators.util import spread

    rules = gopher_rules(F.col(text_col))
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return spread(df).select(
        F.col(id_col),
        *[c.alias(n) for n, c in rules.items()],
        keep.alias("gopher_keep"),
    )


def extract_domains(col: Column) -> Column:
    """Domains of every http(s) URL in the text — the unit of
    web-corpus provenance tracking and blocklist curation. Pattern
    restricted to the Java∩RE2 regex dialect (same discipline as the
    PII patterns) so SQL oracles replicate it bit-for-bit."""
    return F.regexp_extract_all(
        col, F.lit(r"https?://([A-Za-z0-9.-]+)"), 1
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep
    only lines that end in a terminal punctuation mark, have at least
    ``min_line_words`` words, and do not mention javascript; drop the
    whole document when it contains the "lorem ipsum" placeholder
    phrase or a ``{`` (code), or retains fewer than ``min_kept_lines``
    lines (the paper's sentence-count floor, with line ≈ sentence).

    Pure array expressions over one ``split`` — no shuffle, no UDF;
    scales linearly like the rest of the text battery. Returns
    ``(id, n_lines, n_kept, c4_drop, kept_md5, kept_chars)`` where
    ``kept_md5`` certifies the exact retained text without carrying
    the full string through downstream plans (callers that need the
    cleaned text use :func:`c4_kept_text`).
    """
    from kafka_delta_ingest_spark.operators.util import spread

    # Layered projections (r13, same shape as text_profile): the kept
    # array (a line split + per-line regex predicate, interpreted with
    # no CSE) was referenced by FOUR output columns, re-running the
    # whole line scan each time. Compute it once as a column; every
    # output below is an attribute reference.
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _c4_line_keep(min_line_words))
    base = spread(df).select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        kept.alias("_kept"),
        (
            F.lower(F.col(text_col)).contains("lorem ipsum")
            | F.col(text_col).contains("{")
        ).alias("_txt_drop"),
    )
    mid = base.select(
        F.col(id_col),
        "n_lines",
        F.size("_kept").alias("n_kept"),
        "_txt_drop",
        F.array_join("_kept", "\n").alias("_ktext"),
    )
    return mid.select(
        F.col(id_col),
        "n_lines",
        "n_kept",
        (F.col("_txt_drop") | (F.col("n_kept") < min_kept_lines)).alias(
            "c4_drop"
        ),
        F.md5("_ktext").alias("kept_md5"),
        F.length("_ktext").cast("long").alias("kept_chars"),
    )


def _c4_line_keep(min_line_words: int):
    """The per-line C4 predicate as a higher-order-function lambda."""
    def keep(line):
        words = F.split(F.trim(line), _WS)
        return (
            line.rlike('[.!?"”]$')
            & (F.size(words) >= min_line_words)
            & ~F.lower(line).contains("javascript")
        )

    return keep


def c4_kept_text(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """The rewrite half of :func:`c4_line_filter`: documents that
    survive, with their retained lines re-joined — the curate-stage
    form."""
    min_line_words = kw.get("min_line_words", 3)
    min_kept_lines = kw.get("min_kept_lines", 3)
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _c4_line_keep(min_line_words))
    doc_drop = (
        F.lower(F.col(text_col)).contains("lorem ipsum")
        | F.col(text_col).contains("{")
        | (F.size(kept) < min_kept_lines)
    )
    return df.withColumn(text_col, F.array_join(kept, "\n")).filter(~doc_drop)


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: least-
    squares slope/intercept of ln(freq) against ln(rank) for the
    ``top_n`` most frequent normalized tokens — the standard one-look
    corpus health check (natural text ≈ slope -1; templated or
    machine-generated corpora bend away from it).

    One token-explode + one hash aggregation; the rank sort touches
    only ``top_n`` survivors of a TakeOrderedAndProject (distributed
    top-k, no global sort), and the closed-form regression is a
    second 5-column aggregate over those rows. Returns ONE row:
    ``(n_terms, n_instances, top_terms, zipf_slope, zipf_intercept)``.
    """
    from kafka_delta_ingest_spark.operators.util import spread

    toks = spread(df).select(
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term")
    )
    freqs = toks.groupBy("term").agg(F.count("*").alias("freq"))
    totals = freqs.agg(
        F.count("*").alias("n_terms"), F.sum("freq").alias("n_instances")
    )
    top = freqs.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(top_n)
    ranked = top.select(
        F.log(F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("term").asc())
        ).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    fit = ranked.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
        (
            (F.col("sy") - (
                (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
            ) * F.col("sx"))
            / F.col("k")
        ).alias("intercept"),
    )
    return totals.crossJoin(fit).select(
        "n_terms",
        "n_instances",
        F.round("slope", 6).alias("zipf_slope"),
        F.round("intercept", 6).alias("zipf_intercept"),
    )


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode normalization (UAX #15) of a string column — the
    standard tokenizer-preprocessing step (SentencePiece defaults to
    an NFKC variant; search/dedup pipelines canonicalize to NFC so
    'e'+COMBINING ACUTE and precomposed 'é' hash identically).

    Spark has no built-in normalizer, so this is a deliberate
    Arrow-batched pandas-UDF hot path (the documented criterion); the
    kernel is pandas' own vectorized ``Series.str.normalize`` (which
    wraps the stdlib's unicodedata and passes nulls through)."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(col)


def split_sentences(col: Column) -> Column:
    """Rule-based sentence segmentation: maximal runs ending in
    terminal punctuation (``.!?``, with a trailing unterminated run
    kept as its own sentence) — the preprocessing step under C4's
    sentence-level dedup and RAG sentence-window chunkers.

    The pattern deliberately avoids lookarounds so Java regex (Spark)
    and RE2 (the DuckDB oracle's ``regexp_extract_all``) segment
    identically. Pure array expressions — no shuffle, no UDF."""
    raw = F.regexp_extract_all(
        F.trim(col), F.lit(r"[^.!?]+[.!?]+|[^.!?]+$"), F.lit(0)
    )
    return F.filter(
        F.transform(raw, lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
