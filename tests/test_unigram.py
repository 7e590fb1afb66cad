"""Unigram-LM (SentencePiece) tokenizer: lattice DP correctness against
brute-force enumeration, E-step occupancy invariants, distributed-vs-
sequential trainer parity, and total/lossless encoding."""

import itertools
import math
import random
from collections import Counter

import pytest

from kafka_delta_ingest_spark.operators.unigram import (
    _forward_backward,
    _viterbi,
    seed_census,
    train_unigram,
    unigram_encode,
)
from kafka_delta_ingest_spark.operators.bpe import word_census


def _all_segmentations(word, pieces, max_len):
    n = len(word)
    if n == 0:
        yield []
        return
    for ln in range(1, min(max_len, n) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in _all_segmentations(word[ln:], pieces, max_len):
                yield [head] + rest


def _logp(probs):
    return {p: math.log(v) for p, v in probs.items()}


PROBS = {"a": 0.3, "b": 0.2, "c": 0.1, "ab": 0.25, "bc": 0.1, "abc": 0.05}


@pytest.mark.parametrize("word", ["a", "ab", "abc", "abab", "abcabc", "cba"])
def test_forward_backward_matches_enumeration(word):
    lp = _logp(PROBS)
    ll, counts = _forward_backward(word, lp, 3)
    segs = list(_all_segmentations(word, PROBS, 3))
    total = sum(
        math.exp(sum(lp[p] for p in seg)) for seg in segs
    )
    assert math.isclose(math.exp(ll), total, rel_tol=1e-12)
    # expected counts = posterior-weighted piece occurrences
    want = Counter()
    for seg in segs:
        w = math.exp(sum(lp[p] for p in seg)) / total
        for p in seg:
            want[p] += w
    assert set(counts) == set(want)
    for p in want:
        assert math.isclose(counts[p], want[p], rel_tol=1e-12), p
    # occupancy: each character covered exactly once in expectation
    assert math.isclose(
        sum(c * len(p) for p, c in counts.items()), len(word),
        rel_tol=1e-12,
    )


@pytest.mark.parametrize("word", ["a", "abc", "ababab", "bcbc"])
def test_viterbi_matches_enumeration(word):
    lp = _logp(PROBS)
    best, path = _viterbi(word, lp, 3)
    segs = list(_all_segmentations(word, PROBS, 3))
    want = max(sum(lp[p] for p in seg) for seg in segs)
    assert math.isclose(best, want, rel_tol=1e-12)
    assert "".join(path) == word
    assert math.isclose(sum(lp[p] for p in path), best, rel_tol=1e-12)


def test_viterbi_skip_excludes_piece():
    lp = _logp(PROBS)
    _, path = _viterbi("abc", lp, 3, skip="abc")
    assert "abc" not in path and "".join(path) == "abc"
    assert _viterbi("a", {"a": 0.0}, 1, skip="a") is None


def _ref_train(word_counts, vocab_size, max_len, seed_size, shrink,
               em_iters):
    """Sequential mirror of train_unigram over a word->count dict,
    reusing the module's lattice kernels (so parity isolates the
    DISTRIBUTION of the sums, not the math)."""
    cen = Counter()
    for w, c in word_counts.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                cen[w[i:i + ln]] += c
    ranked = sorted(cen.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    pieces = {p for p, _ in ranked[:seed_size]}
    pieces |= {p for p in cen if len(p) == 1}
    total = sum(cen[p] for p in pieces)
    logp = {p: math.log(cen[p] / total) for p in pieces}
    while True:
        for _ in range(em_iters):
            acc = {}
            for w, c in sorted(word_counts.items()):
                ll, counts = _forward_backward(w, logp, max_len)
                if ll == float("-inf"):
                    continue
                for p, e in counts.items():
                    acc[p] = acc.get(p, 0.0) + c * e
            tot = sum(acc.values())
            logp = {p: math.log(e / tot) for p, e in acc.items() if e > 0}
        singles = [p for p in logp if len(p) == 1]
        multis = [p for p in logp if len(p) > 1]
        budget = max(vocab_size - len(singles), 0)
        if len(multis) <= budget:
            break
        losses = {}
        for w, c in sorted(word_counts.items()):
            got = _viterbi(w, logp, max_len)
            if got is None:
                continue
            base, path = got
            for p in set(path):
                if len(p) == 1:
                    continue
                alt = _viterbi(w, logp, max_len, skip=p)
                drop = (base - alt[0]) if alt else float("inf")
                losses[p] = losses.get(p, 0.0) + c * drop
        keep_n = max(budget, int(len(multis) * shrink))
        ranked_m = sorted(multis, key=lambda p: (-losses.get(p, 0.0), p))
        kept = set(ranked_m[:keep_n]) | set(singles)
        probs = {p: math.exp(lp) for p, lp in logp.items() if p in kept}
        z = sum(probs.values())
        logp = {p: math.log(v / z) for p, v in probs.items()}
    return sorted(
        ((p, math.exp(lp)) for p, lp in logp.items()),
        key=lambda t: (-t[1], t[0]),
    )


def _corpus_df(spark, word_counts):
    rows = []
    i = 0
    for w, c in sorted(word_counts.items()):
        for _ in range(c):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_seed_census_exact(spark):
    wc = {"abab": 7, "cab": 3}
    cen = {
        r.piece: (r.freq, r.score)
        for r in seed_census(
            word_census(_corpus_df(spark, wc)), max_len=3
        ).collect()
    }
    want = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(3, len(w) - i) + 1):
                want[w[i:i + ln]] += c
    assert cen == {p: (c, c * len(p)) for p, c in want.items()}


def test_train_matches_sequential_reference(spark):
    rng = random.Random(42)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(2, 6)))
             for _ in range(30)]
    wc = Counter()
    for w in words:
        wc[w] += rng.randint(1, 40)
    kw = dict(vocab_size=10, max_len=3, seed_size=12, shrink=0.75,
              em_iters=2)
    ref = _ref_train(wc, **kw)
    got = train_unigram(
        _corpus_df(spark, wc), vocab_size=10, max_piece_len=3,
        seed_size=12, shrink=0.75, em_iters=2,
    )
    assert [p for p, _ in got] == [p for p, _ in ref]
    for (p, v), (_, rv) in zip(got, ref):
        assert math.isclose(v, rv, rel_tol=1e-6), p
    assert math.isclose(sum(v for _, v in got), 1.0, rel_tol=1e-9)


@pytest.mark.parametrize("em_iters", [1, 2])
def test_train_planted_corpus_analytic_vocab(spark, em_iters):
    """The certification query's planted analytics: 'ab' dominates,
    'bc' gets zero prune loss (never on a Viterbi path once the first
    M-step separates p(c) from p(bc)), singles always survive."""
    wc = {"ab": 513, "abc": 500, "dd": 167}
    got = train_unigram(
        _corpus_df(spark, wc), vocab_size=5, max_piece_len=2,
        seed_size=4, em_iters=em_iters,
    )
    assert {p for p, _ in got} == {"a", "b", "c", "d", "ab"}


def test_encode_total_and_lossless(spark):
    pieces = [("a", 0.3), ("b", 0.2), ("ab", 0.4), ("c", 0.1)]
    df = spark.createDataFrame(
        [(0, "ab abc xab"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.uni_tokens, r.n_unigram)
           for r in unigram_encode(df, pieces).collect()}
    toks0, n0 = out[0]
    assert "".join(toks0) == "ababcxab"
    assert n0 == len(toks0)
    # unknown char is its own piece
    assert "x" in toks0
    assert out[1] == ([], 0) and out[2] == ([], 0)


def test_encode_multichar_only_vocab_and_bad_probs(spark):
    """A vocabulary without single-character coverage still uses its
    multi-char pieces (the UNK edge lives in the same lattice, priced
    below every real piece), and non-positive probabilities are
    rejected up front (review fixes)."""
    df = spark.createDataFrame(
        [(0, "ab aab zz")], "doc_id long, text string"
    )
    [row] = unigram_encode(df, [("ab", 1.0)]).collect()
    # 'ab' -> [ab]; 'aab' -> [a(UNK), ab]; 'zz' -> [z, z] all UNK
    assert row.uni_tokens == ["ab", "a", "ab", "z", "z"]
    with pytest.raises(ValueError, match="positive"):
        unigram_encode(df, [("ab", 0.0)])
