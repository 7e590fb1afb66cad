"""BPE tokenizer training over a Spark corpus.

Byte-pair encoding (Sennrich et al. 2016; the GPT-2/RoBERTa tokenizer
recipe): start from characters, repeatedly merge the most frequent
adjacent symbol pair. The classic trainer optimization — and the whole
scale story here — is that after ONE corpus-scale word census, every
merge iteration runs on the *vocabulary* table (distinct words +
counts), which is millions of rows regardless of corpus size. 100 TB
of text costs one tokenize+groupBy pass; the merge loop never touches
the corpus again.

* ``pair_census`` — adjacent-pair frequencies (the first thing BPE
  ranks), pure expressions, SQL-oracle-able.
* ``train_bpe`` — the iterative trainer: per merge, one
  vocabulary-scale pair census + one driver-side argmax (a scalar
  action, same pattern as ``dedup.connected_components``), then an
  ``aggregate``-HOF rewrite of the symbol arrays. Greedy left-to-right
  non-overlapping merging, verified against a pure-Python reference in
  tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from kafka_delta_ingest_spark.operators.text import tokens
from kafka_delta_ingest_spark.operators.util import spread


def word_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) over lowercased whitespace tokens — the one
    corpus-scale pass (map-side-combined groupBy on the token)."""
    return (
        spread(df)
        .where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def pair_census(df: DataFrame, text_col: str = "text", top_k: int = 40) -> DataFrame:
    """Top-k adjacent CHARACTER pairs weighted by word frequency — the
    ranking that picks BPE's first merge. Fully deterministic order
    (count desc, then pair text) so top-k is engine-portable."""
    wc = word_census(df, text_col)
    pairs = wc.where(F.length("word") >= 2).select(
        "wc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.struct(
                    F.col("word").substr(i, F.lit(1)).alias("a"),
                    F.col("word").substr(i + 1, F.lit(1)).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "a", "b")
        .limit(top_k)
    )


def _merge_pair(arr: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (a, b) → a+b.

    One ``aggregate`` scan: append each symbol unless the accumulator's
    LAST element is ``a`` and the incoming one is ``b`` — then replace
    the last element with the merged symbol. Because a merge changes
    the last element away from ``a``, overlapping occurrences (aaa with
    pair (a,a)) resolve exactly like the sequential reference trainer.
    """
    merged = a + b
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair census over the vocabulary table, ordered
    (count desc, a, b) — the deterministic BPE merge ranking."""
    return (
        vocab.where(F.size("syms") >= 2)
        .select(
            "wc",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "a", "b")
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_k: int = 8,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(a, b, pair_count), ...]
    in merge order — EXACTLY the sequential greedy schedule (ties rank
    (count desc, a, b), deterministic across engines and cluster
    sizes), verified against a pure-Python reference in tests.

    Batched driver loop: instead of one census + one scalar collect
    per merge (2 jobs x 32k merges for a GPT-2-sized vocabulary), each
    round censuses once, collects the top ``4*batch_k`` pairs, and
    applies the longest PROVABLY-greedy-equivalent prefix of that
    ranking in a single rewrite — ~3 jobs per accepted batch. The
    prefix c1..ck is safe (i.e. the sequential trainer would pick
    exactly c1, then c2, ...) when three conditions hold:

    1. *Disjoint prefix, no skips.* Accepted pairs are pairwise
       symbol-disjoint and form a PREFIX of the rank order (stop at the
       first conflicting pair). Merging (a,b) never increases the count
       of a pair not involving the merged output, and every pair ranked
       above c_i is already in the batch — so at step i every old pair
       still counts <= count(c_i), with census tie-order deciding ties.
    2. *Fresh outputs.* Each merged string a+b must not collide with an
       existing symbol (tracked exactly driver-side: initial distinct
       characters + prior merge outputs) or an earlier batch output —
       a collision would boost pre-existing pairs involving that
       symbol, voiding (1) for later batch members; the batch is cut at
       the colliding pair (it stays in, later candidates wait).
    3. *New-pair guard.* A merge c_j creates new pairs involving its
       output; each such pair's count is bounded by m_j, the exact
       number of merge events for c_j (every event shortens a word's
       symbol array by one, so m_j = sum(wc * (len_{j-1} - len_j)),
       computed in ONE aggregation over the chained merge expressions).
       c_i is kept only while count(c_i) > max_{j<i} m_j — strictly, so
       lexicographic ties with a new pair can never flip the pick.

    Violations never produce a wrong schedule — they truncate the batch
    and the next round's census re-ranks from scratch. ``batch_k=1``
    reproduces the unbatched loop exactly (and is still 1 job cheaper).
    """
    vocab = (
        word_census(df, text_col)
        .withColumn("syms", F.split("word", ""))
        .select("syms", "wc")
        .localCheckpoint()
    )
    # Vocabulary tables are distinct-word-sized, but the census shuffle
    # leaves them at full shuffle width — 32 near-empty tasks for every
    # census/size-aggregation/rewrite job of every round on a
    # probe-scale corpus (measured: ~0.3-0.5s of pure task overhead per
    # job at local[32]). Coalesce to ~1k words per task (the count is
    # one cheap scan of the materialized checkpoint); later rounds
    # inherit the narrow width through the rewrite selects (r12).
    n_words = vocab.count()
    try:
        par = vocab.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no client-side SparkContext
        par = int(vocab.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    vocab = vocab.coalesce(max(1, min(par, (n_words + 1023) // 1024)))
    # Exact driver-side symbol ledger: initial distinct characters
    # (vocabulary-scale, tiny) + one new symbol per applied merge.
    known_symbols = {
        r.s
        for r in vocab.select(
            F.explode("syms").alias("s")
        ).distinct().collect()
    }
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        top = _pair_counts(vocab).limit(max(4 * want, 8)).collect()
        if not top:
            break
        # Longest disjoint prefix with fresh outputs (conditions 1+2).
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            a, b, cnt = r.a, r.b, int(r.pair_count)
            merged = a + b
            # `merged in used` also rejects a candidate whose OUTPUT
            # collides with an earlier batch member's output or symbol
            # (e.g. ("a","bc") then ("ab","c"), both producing "abc"):
            # two producers of one symbol would pool their merge events
            # and void the per-merge m_j bound below.
            if len(batch) >= want or a in used or b in used or merged in used:
                break
            batch.append((a, b, cnt))
            used.update((a, b, merged))
            if merged in known_symbols:
                break  # non-fresh output: keep this merge, cut after
        if len(batch) > 1:
            # Condition 3: exact merge-event counts m_j from the
            # chained rewrite expressions, one aggregation.
            exprs = [F.col("syms")]
            for a, b, _ in batch:
                exprs.append(_merge_pair(exprs[-1], a, b))
            sizes = vocab.select(
                "wc", *[F.size(e).alias(f"_s{i}") for i, e in enumerate(exprs)]
            )
            m = (
                sizes.agg(
                    *[
                        F.sum(
                            F.col("wc")
                            * (F.col(f"_s{j - 1}") - F.col(f"_s{j}"))
                        ).alias(f"m{j}")
                        for j in range(1, len(exprs))
                    ]
                )
                .collect()[0]
            )
            safe = 1
            worst = int(m[0])
            while safe < len(batch) and batch[safe][2] > worst:
                worst = max(worst, int(m[safe]))
                safe += 1
            batch = batch[:safe]
        for a, b, _ in batch:
            known_symbols.add(a + b)
        merges.extend(batch)
        expr = F.col("syms")
        for a, b, _ in batch:
            expr = _merge_pair(expr, a, b)
        vocab = vocab.select(expr.alias("syms"), "wc").localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Apply trained BPE merges: (id, bpe_tokens array<string>, n_bpe).

    The encode side of the tokenizer. Merge ranks broadcast to every
    executor inside an Arrow-batched pandas UDF (the HF-tokenizers
    encode algorithm: repeatedly merge the best-ranked adjacent pair
    per word); per-word results are memoized per batch, so cost scales
    with DISTINCT words in a batch, not tokens. This is the one
    deliberate Python-UDF hot path in the text family — the
    data-dependent merge loop is not expressible as Catalyst
    expressions; Arrow batching keeps it vectorized at the transfer
    layer.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {(a, b): i for i, (a, b, *_) in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        memo[word] = syms
        return syms

    @pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                toks.extend(encode_word(w, memo))
            out.append(toks)
        return pd.Series(out)

    return (
        # partitions: callers encoding a known-tiny batch (a probe
        # string) pass an explicit width so one row does not fan out
        # into defaultParallelism Arrow-UDF tasks (r12).
        spread(df, partitions)
        .select(F.col(id_col), _encode(F.col(text_col)).alias("bpe_tokens"))
        .withColumn("n_bpe", F.size("bpe_tokens"))
    )
