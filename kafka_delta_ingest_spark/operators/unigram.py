"""Unigram-LM (SentencePiece) tokenizer training over a Spark corpus.

The unigram tokenizer (Kudo 2018, "Subword Regularization"; the
SentencePiece default) models a word as the best segmentation into
vocabulary pieces under an independence assumption, and TRAINS the
vocabulary by EM + pruning:

1. SEED: every substring (length <= ``max_piece_len``) of every word,
   ranked by frequency * length; keep the top ``seed_size`` plus every
   single character (coverage guarantee).
2. EM rounds: E-step computes per-piece EXPECTED counts over all
   segmentations of each word (forward-backward on the word lattice);
   M-step renormalizes expected counts into piece probabilities.
3. PRUNE: drop the multi-character pieces whose removal costs the
   least corpus log-likelihood (each word re-segmented without the
   piece; singles never pruned), shrinking toward ``vocab_size``.

Scale story (identical to the BPE trainer next door): ONE corpus-scale
word census, after which every E-step / prune pass runs over the
DISTINCT-WORD table — millions of rows regardless of corpus size —
inside Arrow-batched ``mapInPandas`` kernels that aggregate locally
and emit piece-scale partials; the only driver-side state is the
piece table itself (the k-means-centroid pattern). The lattice
dynamic programs are data-dependent loops no Catalyst expression can
express, which is the documented criterion for the pandas-kernel
path.

Cross-engine determinism: seed selection and all tie-breaks are
(score desc, piece asc) over INTEGER frequencies; EM totals are float
but the trainer is pinned against a pure-Python sequential reference
in tests (sets + tolerances), and the certification query plants a
corpus whose invariants are integers.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from kafka_delta_ingest_spark.operators.bpe import word_census
from kafka_delta_ingest_spark.operators.util import spread

_LL_KEY = "\x00loglik"  # reserved: no real piece starts with NUL


def seed_census(words: DataFrame, max_len: int = 4) -> DataFrame:
    """(piece, freq, score) over every substring of length 1 ..
    ``max_len`` of every distinct word, occurrences weighted by word
    count; ``score = freq * len(piece)`` is the SentencePiece seed
    ranking.  Pure array expressions over the vocabulary table —
    |word| * max_len candidate pieces per distinct word, one shuffle
    on the piece."""
    n = F.length("word")
    pieces = words.select(
        "wc",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1), F.least(F.lit(max_len), n - i + 1)
                        ),
                        lambda ln: F.col("word").substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    return (
        pieces.groupBy("piece")
        .agg(F.sum("wc").alias("freq"))
        .withColumn("score", F.col("freq") * F.length("piece"))
    )


def seed_pieces(
    words: DataFrame, max_len: int = 4, seed_size: int = 1000
) -> DataFrame:
    """Top ``seed_size`` census pieces by (score desc, piece asc) —
    deterministic, engine-portable — ALWAYS unioned with every single
    character: unigram needs character coverage to segment any word,
    so singles are exempt from both seeding and pruning cuts."""
    cen = seed_census(words, max_len)
    top = cen.orderBy(F.desc("score"), F.asc("piece")).limit(seed_size)
    singles = cen.filter(F.length("piece") == 1)
    return top.unionByName(singles).dropDuplicates(["piece"])


def _forward_backward(
    word: str, logp: dict, max_len: int
) -> tuple[float, dict]:
    """Log-likelihood of ``word`` summed over ALL segmentations, and
    each piece's expected count (posterior occupancy) — the E-step
    for one word.  O(len * max_len) lattice edges."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = neg
        for ln in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is None or alpha[i - ln] == neg:
                continue
            v = alpha[i - ln] + lp
            acc = v if acc == neg else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        alpha[i] = acc
    ll = alpha[n]
    if ll == neg:
        return neg, {}
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = neg
        for ln in range(1, min(max_len, n - i) + 1):
            lp = logp.get(word[i : i + ln])
            if lp is None or beta[i + ln] == neg:
                continue
            v = beta[i + ln] + lp
            acc = v if acc == neg else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        beta[i] = acc
    counts: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == neg:
            continue
        for ln in range(1, min(max_len, n - i) + 1):
            piece = word[i : i + ln]
            lp = logp.get(piece)
            if lp is None or beta[i + ln] == neg:
                continue
            post = math.exp(alpha[i] + lp + beta[i + ln] - ll)
            counts[piece] = counts.get(piece, 0.0) + post
    return ll, counts


def _viterbi(
    word: str,
    logp: dict,
    max_len: int,
    skip: str | None = None,
    unk_lp: float | None = None,
) -> tuple[float, list[str]] | None:
    """Best segmentation of ``word`` (optionally excluding one piece);
    None when no segmentation exists.  Ties resolve toward the
    SHORTER final piece (the ascending-length DP keeps the first
    maximum under strict improvement), deterministically.

    ``unk_lp`` (the encode path) adds a per-CHARACTER fallback edge at
    that log-prob, making segmentation total: a character covered by
    no piece becomes its own token.  With it set, None is never
    returned."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln : i]
            if piece == skip:
                continue
            lp = logp.get(piece)
            if lp is None or best[i - ln] == neg:
                continue
            v = best[i - ln] + lp
            if v > best[i]:
                best[i] = v
                back[i] = ln
        if unk_lp is not None and best[i - 1] != neg:
            v = best[i - 1] + unk_lp
            if v > best[i]:
                best[i] = v
                back[i] = 1
    if best[n] == neg:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return best[n], out


def _collect_piece_map(
    words: DataFrame, logp: dict, max_len: int, kernel,
    width: int | None = None,
) -> dict:
    """Run a per-word ``kernel(word, wc, logp, acc)`` over the
    distinct-word table and return the globally-summed (piece -> val)
    map.  The kernel aggregates LOCALLY per Arrow batch stream, so a
    task emits one row per touched piece, never one per word — the
    shuffle is piece-scale; the driver collect is piece-scale."""
    sess = words.sparkSession
    bc = sess.sparkContext.broadcast(logp)

    def run(batches):
        lp = bc.value
        acc: dict[str, float] = {}
        for pdf in batches:
            for word, wc in zip(pdf["word"], pdf["wc"]):
                kernel(word, int(wc), lp, acc)
        yield pd.DataFrame(
            {"piece": list(acc.keys()), "val": list(acc.values())}
        )

    rows = (
        # width, when given, is derived ONCE from the checkpointed
        # word count (train_unigram) — spread's blind
        # defaultParallelism target put a 3-distinct-word probe corpus
        # through 32 near-empty Python tasks per EM pass (r12).
        spread(words, partitions=width)
        .mapInPandas(run, "piece string, val double")
        .groupBy("piece")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    # One broadcast per E-step/prune pass: release it now or a long
    # EM schedule accumulates a full logp copy per pass per executor.
    bc.unpersist()
    return {r.piece: float(r.val) for r in rows}


def _estep(words: DataFrame, logp: dict, max_len: int,
           width: int | None = None) -> tuple[dict, float]:
    """One distributed E-step: (expected counts per piece, corpus
    log-likelihood)."""

    def kernel(word, wc, lp, acc):
        ll, counts = _forward_backward(word, lp, max_len)
        if ll == float("-inf"):
            return
        acc[_LL_KEY] = acc.get(_LL_KEY, 0.0) + wc * ll
        for p, c in counts.items():
            acc[p] = acc.get(p, 0.0) + wc * c

    out = _collect_piece_map(words, logp, max_len, kernel, width)
    ll = out.pop(_LL_KEY, 0.0)
    return out, ll


def _prune_losses(words: DataFrame, logp: dict, max_len: int,
                  width: int | None = None) -> dict:
    """Per-piece likelihood loss of removal: for each word's Viterbi
    path, re-segment without each distinct path piece and charge the
    word count times the score drop (the SentencePiece prune
    criterion; an irreplaceable single would be infinite, but singles
    are exempt by construction)."""

    def kernel(word, wc, lp, acc):
        got = _viterbi(word, lp, max_len)
        if got is None:
            return
        base, path = got
        for p in set(path):
            if len(p) == 1:
                continue
            alt = _viterbi(word, lp, max_len, skip=p)
            drop = (base - alt[0]) if alt else float("inf")
            acc[p] = acc.get(p, 0.0) + wc * drop

    return _collect_piece_map(words, logp, max_len, kernel, width)


def train_unigram(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_size: int = 1000,
    shrink: float = 0.75,
    em_iters: int = 2,
    words: DataFrame | None = None,
) -> list[tuple[str, float]]:
    """Train a unigram-LM vocabulary of (at most) ``vocab_size``
    pieces; returns [(piece, prob), ...] sorted by (prob desc, piece
    asc).  Singles always survive, so the effective floor is the
    corpus alphabet size.  Each round: ``em_iters`` E/M passes then a
    prune to max(vocab_size, shrink * current) pieces, repeating until
    the vocabulary fits — the SentencePiece shrink schedule."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    if words is None:
        words = word_census(df, text_col).localCheckpoint()
    # EM-kernel width from the materialized word count (free after the
    # checkpoint): ~1k DP-kernel words per task, capped at cluster
    # width, floor 1 — replaces spread()'s blind defaultParallelism
    # repartition inside every E/prune pass.
    n_words = words.count()
    try:
        par = words.sparkSession.sparkContext.defaultParallelism
    except Exception:
        par = int(words.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    width = max(1, min(par, (n_words + 1023) // 1024))
    seeds = seed_pieces(words, max_piece_len, seed_size).collect()
    freq = {r.piece: float(r.freq) for r in seeds}
    total = sum(freq.values())
    logp = {p: math.log(v / total) for p, v in freq.items()}
    while True:
        for _ in range(em_iters):
            counts, _ll = _estep(words, logp, max_piece_len, width)
            tot = sum(counts.values())
            logp = {p: math.log(c / tot) for p, c in counts.items() if c > 0}
        singles = [p for p in logp if len(p) == 1]
        multis = [p for p in logp if len(p) > 1]
        budget = max(vocab_size - len(singles), 0)
        if len(multis) <= budget:
            break
        losses = _prune_losses(words, logp, max_piece_len, width)
        # keep_n < len(multis) always holds here: this branch requires
        # budget < len(multis), and int(len*shrink) < len for shrink<1.
        keep_n = max(budget, int(len(multis) * shrink))
        ranked = sorted(
            multis, key=lambda p: (-losses.get(p, 0.0), p)
        )
        kept = set(ranked[:keep_n]) | set(singles)
        probs = {p: math.exp(lp) for p, lp in logp.items() if p in kept}
        z = sum(probs.values())
        logp = {p: math.log(v / z) for p, v in probs.items()}
    return sorted(
        ((p, math.exp(lp)) for p, lp in logp.items()),
        key=lambda t: (-t[1], t[0]),
    )


def unigram_encode(
    df: DataFrame,
    pieces: list[tuple[str, float]] | dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi-segment each document's words with a trained vocabulary:
    (id, uni_tokens array<string>, n_unigram).  Mirrors ``bpe_encode``:
    the probability table broadcasts into an Arrow-batched pandas UDF
    with per-batch word memoization (cost scales with DISTINCT words).
    Segmentation is TOTAL and lossless w.r.t. the character stream:
    the lattice carries a per-character UNK edge priced 50 nats below
    the worst real piece, so replacing any single real piece with
    UNK characters is strictly worse and UNK pieces appear only for
    characters no real piece covers (up to that 50-nat margin in
    pathological vocabularies) — this also makes single-character
    coverage in the vocabulary optional (a {"ab"} vocabulary encodes
    "ab" as ["ab"], not two UNKs)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    table = dict(pieces)
    if any(v <= 0 for v in table.values()):
        raise ValueError("piece probabilities must be positive")
    logp = {p: math.log(v) for p, v in table.items()}
    max_len = max((len(p) for p in logp), default=1)
    # Strictly worse than covering the same span with ONE real piece:
    # k UNK edges cost k*(min-50) <= min-50 < any real lp >= min.
    unk_lp = (min(logp.values()) if logp else 0.0) - 50.0

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        out = _viterbi(word, logp, max_len, unk_lp=unk_lp)[1]
        memo[word] = out
        return out

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
        spread(df)
        .select(F.col(id_col), _encode(F.col(text_col)).alias("uni_tokens"))
        .withColumn("n_unigram", F.size("uni_tokens"))
    )
