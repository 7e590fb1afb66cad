"""Hand-computed checks for the LM scoring operators and the funnel."""

import hashlib
import math
from collections import Counter
from datetime import datetime

import pytest
from pyspark.sql import Row

from kafka_delta_ingest_spark.operators.lm import (
    UNK,
    bigram_lm_scores,
    dsir_importance,
)
from kafka_delta_ingest_spark.streaming.windows import funnel


def _py_bigram_scores(texts: dict[int, str], min_count: int = 2):
    """Pure-Python replica of the bigram-LM arithmetic."""
    toks = {i: t.lower().split() for i, t in texts.items() if t.strip()}
    uni = Counter(w for ws in toks.values() for w in ws)
    vocab = {w for w, c in uni.items() if c >= min_count}
    v_size = len(vocab) + 1

    def m(w):
        return w if w in vocab else UNK

    bigrams = {
        i: [(m(a), m(b)) for a, b in zip(ws, ws[1:])]
        for i, ws in toks.items()
        if len(ws) >= 2
    }
    cb = Counter(p for ps in bigrams.values() for p in ps)
    c1 = Counter()
    for (w1, _), c in cb.items():
        c1[w1] += c
    out = {}
    for i, ps in bigrams.items():
        lps = [math.log((cb[p] + 1) / (c1[p[0]] + v_size)) for p in ps]
        avg = sum(lps) / len(lps)
        out[i] = (len(ps), round(avg, 6), round(math.exp(-avg), 6))
    return out


def test_bigram_lm_matches_python_replica(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the hat",
        3: "a dog ran",
        4: "the cat",
        5: "solo",  # one token -> no bigrams -> absent
        6: "   ",  # empty -> absent
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp, r.ppl)
        for r in bigram_lm_scores(df).collect()
    }
    assert got == _py_bigram_scores(texts)


def test_bigram_lm_repeated_text_scores_lower_ppl(spark):
    """A document whose bigrams dominate the corpus has lower
    perplexity than a one-off document — the CCNet signal."""
    rows = [Row(doc_id=i, text="the cat sat on the mat") for i in range(10)]
    rows.append(Row(doc_id=99, text="zygote quasar bumbling ferrous"))
    df = spark.createDataFrame(rows)
    ppl = {r.doc_id: r.ppl for r in bigram_lm_scores(df).collect()}
    assert ppl[0] < ppl[99]


def _bucket(word: str, n_buckets: int) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % n_buckets


def _py_trigram_sb(train: dict[int, str], score: dict[int, str],
                   min_count: int = 2, alpha: float = 0.4):
    """Pure-Python replica of the stupid-backoff trigram arithmetic
    (all lower orders as suffix marginals of the trigram census)."""
    ttoks = {i: t.lower().split() for i, t in train.items() if t.strip()}
    stoks = {i: t.lower().split() for i, t in score.items() if t.strip()}
    uni_census = Counter(w for ws in ttoks.values() for w in ws)
    vocab = {w for w, c in uni_census.items() if c >= min_count}

    def m(w):
        return w if w in vocab else UNK

    def tris(ws):
        ws = [m(w) for w in ws]
        return list(zip(ws, ws[1:], ws[2:]))

    c3 = Counter(t for ws in ttoks.values() for t in tris(ws))
    C2, cb, C1, cu = Counter(), Counter(), Counter(), Counter()
    for (w1, w2, w3), c in c3.items():
        C2[(w1, w2)] += c
        cb[(w2, w3)] += c
    for (w2, w3), c in cb.items():
        C1[w2] += c
        cu[w3] += c
    N = sum(c3.values())
    out = {}
    for i, ws in stoks.items():
        ts = tris(ws)
        if not ts:
            continue
        lps, bo = [], 0
        for t in ts:
            if t in c3:
                p = c3[t] / C2[(t[0], t[1])]
            elif (t[1], t[2]) in cb:
                p = alpha * cb[(t[1], t[2])] / C1[t[1]]
                bo += 1
            else:
                p = alpha * alpha * (cu.get(t[2], 1.0)) / N
                bo += 1
            lps.append(math.log(p))
        avg = sum(lps) / len(lps)
        out[i] = (len(ts), round(avg, 6), round(math.exp(-avg), 6),
                  round(bo / len(ts), 6))
    return out


def test_trigram_sb_matches_python_replica(spark):
    from kafka_delta_ingest_spark.operators.lm import trigram_sb_scores

    train = {
        0: "the cat sat on the mat the cat sat on the rug",
        2: "the dog sat on the mat and the dog ran",
        4: "a cat and a dog sat here on the mat",
    }
    score = {
        **train,
        1: "the cat sat on the mat",          # mostly seen trigrams
        3: "the zebra jumped over the moon",  # heavy backoff + OOV
        5: "cat sat",                         # too short: absent
    }
    expected = _py_trigram_sb(train, score)
    tdf = spark.createDataFrame(list(train.items()), "doc_id long, text string")
    sdf = spark.createDataFrame(list(score.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logp, r.ppl, r.backoff_rate)
        for r in trigram_sb_scores(sdf, train_df=tdf).collect()
    }
    assert got == expected
    assert 5 not in got
    # training docs never back off; the zebra doc always does
    assert got[0][3] == 0.0 and got[3][3] > 0.5


def test_trigram_sb_self_scoring_is_order3_everywhere(spark):
    from kafka_delta_ingest_spark.operators.lm import trigram_sb_scores

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta alpha beta gamma")],
        "doc_id long, text string",
    )
    rows = trigram_sb_scores(df).collect()
    assert rows[0].backoff_rate == 0.0


def test_dsir_matches_python_replica(spark):
    corpus = {
        1: "apples and oranges and pears",
        2: "stock market index futures",
        3: "apples pears plums",
    }
    target_texts = ["apples pears", "pears and plums"]
    B = 16
    cdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in corpus.items()])
    tdf = spark.createDataFrame([Row(text=t) for t in target_texts])

    got = {
        r.doc_id: (r.n_tok, r.dsir_score)
        for r in dsir_importance(cdf, tdf, n_buckets=B).collect()
    }

    ct = Counter(
        _bucket(w, B) for t in target_texts for w in t.lower().split()
    )
    cq = Counter(
        _bucket(w, B) for t in corpus.values() for w in t.lower().split()
    )
    nt, nq = sum(ct.values()), sum(cq.values())
    want = {}
    for i, t in corpus.items():
        ws = t.lower().split()
        lr = [
            math.log(
                ((ct[_bucket(w, B)] + 1) / (nt + B))
                / ((cq[_bucket(w, B)] + 1) / (nq + B))
            )
            for w in ws
        ]
        want[i] = (len(ws), round(sum(lr) / len(lr), 6))
    assert got == want


def test_dsir_target_like_docs_score_higher(spark):
    corpus = [Row(doc_id=i, text="finance stocks bonds yield") for i in range(5)]
    corpus += [Row(doc_id=100 + i, text="recipe flour sugar butter") for i in range(5)]
    target = [Row(text="recipe sugar flour baking")]
    scores = {
        r.doc_id: r.dsir_score
        for r in dsir_importance(
            spark.createDataFrame(corpus), spark.createDataFrame(target)
        ).collect()
    }
    assert scores[100] > scores[0]


def _ev(uid, ts, typ):
    return Row(user_id=uid, ts=datetime(2024, 1, 1, 0, 0, ts), event_type=typ)


def test_funnel_ordered_first_touch(spark):
    events = [
        # u1 completes all three in order
        _ev(1, 1, "view"), _ev(1, 2, "click"), _ev(1, 3, "purchase"),
        # u2 clicks BEFORE viewing -> stalls at stage 1
        _ev(2, 5, "click"), _ev(2, 6, "view"),
        # u3 views and clicks, purchase precedes the click -> stage 2
        _ev(3, 1, "purchase"), _ev(3, 2, "view"), _ev(3, 3, "click"),
        # u4 never views -> absent everywhere
        _ev(4, 1, "click"), _ev(4, 2, "purchase"),
        # u5: click at the SAME second as the first view -> strict >
        _ev(5, 1, "view"), _ev(5, 1, "click"), _ev(5, 2, "purchase"),
    ]
    df = spark.createDataFrame(events)
    got = {
        r.stage: (r.step, r.users)
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    # stage1: u1,u2,u3,u5; stage2: u1,u3; stage3: u1 (+u5? no: u5's
    # click is NOT strictly after the view, so u5 stalls at stage 1).
    assert got == {
        1: ("view", 4),
        2: ("click", 2),
        3: ("purchase", 1),
    }


def test_funnel_first_touch_anchors_earliest(spark):
    # The first view anchors the funnel: a later view cannot "restart"
    # it, but a click after the FIRST view counts even if an earlier
    # click exists.
    events = [
        _ev(1, 1, "click"),  # before any view: ignored
        _ev(1, 2, "view"),
        _ev(1, 3, "click"),
        _ev(1, 10, "view"),
    ]
    df = spark.createDataFrame(events)
    got = {r.stage: r.users for r in funnel(df, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_rejects_empty_steps(spark):
    df = spark.createDataFrame([_ev(1, 1, "view")])
    with pytest.raises(ValueError):
        funnel(df, [])


def test_funnel_matches_python_reference_on_random_events(spark):
    """Randomized cross-check: the chained-join funnel equals a brute
    sequential scan for any event soup (hypothesis-lite: fixed seeds,
    many shapes)."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        steps = ["view", "click", "purchase"]
        events = [
            (
                rng.randrange(6),
                datetime(2024, 1, 1, 0, 0, rng.randrange(50)),
                rng.choice(steps + ["noise"]),
            )
            for _ in range(120)
        ]
        # Python reference: first-touch stage machine per user over the
        # time-sorted stream (ties: same rule as the operator — strict
        # > per stage anchor; within-second ordering irrelevant since
        # anchors compare with >).
        per_user: dict[int, list] = {}
        for u, ts, typ in sorted(events, key=lambda e: e[1]):
            per_user.setdefault(u, []).append((ts, typ))
        want = {i + 1: 0 for i in range(len(steps))}
        for u, evs in per_user.items():
            stage, anchor = 0, None
            for ts, typ in evs:
                if stage < len(steps) and typ == steps[stage] and (
                    stage == 0 or ts > anchor
                ):
                    stage += 1
                    anchor = ts
            for s in range(1, stage + 1):
                want[s] += 1

        df = spark.createDataFrame(
            [Row(user_id=u, ts=ts, event_type=t) for u, ts, t in events]
        )
        got = {r.stage: r.users for r in funnel(df, steps).collect()}
        assert got == want, seed


def test_ccnet_buckets_approx_matches_exact_partition(spark):
    """The exact=False scale path (percentile_approx thresholds + pure
    filter) must produce the same head/middle/tail PARTITION the exact
    ntile twin does, up to boundary placement: per lang the buckets
    are value-monotone and sizes stay within one row of a tercile
    (the sketch is exact at this cardinality)."""
    from kafka_delta_ingest_spark.operators.lm import ccnet_perplexity_buckets

    rows = []
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    for i in range(24):
        lang = "en" if i % 2 == 0 else "de"
        # distinct word mixes -> distinct perplexities
        text = " ".join(words[(i + j) % 6] for j in range(4 + i % 5)) + f" w{i}"
        rows.append(Row(doc_id=i, lang=lang, text=text))
    df = spark.createDataFrame(rows)

    exact = ccnet_perplexity_buckets(df, exact=True).collect()
    approx = ccnet_perplexity_buckets(df, exact=False).collect()

    assert {r.doc_id for r in approx} == {r.doc_id for r in exact}
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang in ("en", "de"):
        rs = [r for r in approx if r.lang == lang]
        n = len(rs)
        # value-monotone partition: every head ppl <= every middle ppl
        # <= every tail ppl
        by_bucket = {}
        for r in rs:
            by_bucket.setdefault(r.bucket, []).append(r.ppl)
        buckets = sorted(by_bucket, key=order.get)
        for a, b in zip(buckets, buckets[1:]):
            assert max(by_bucket[a]) <= min(by_bucket[b]), (lang, a, b)
        # tercile sizes within one row of exact
        for name, vals in by_bucket.items():
            assert abs(len(vals) - n / 3) <= 1, (lang, name, len(vals))


def test_quantile_bins_exact_matches_ntile_and_approx_is_monotone(spark):
    from kafka_delta_ingest_spark.operators.sampling import quantile_bins
    from pyspark.sql import Window, functions as F

    rows = [
        Row(doc_id=i, lang="en" if i % 3 else "fr", score=float((i * 37) % 101))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)

    got = {
        (r.doc_id, r.bin)
        for r in quantile_bins(
            df, "score", "lang", 4, descending=True, exact=True
        ).collect()
    }
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "doc_id")
    want = {
        (r.doc_id, r.bin)
        for r in df.withColumn("bin", F.ntile(4).over(w).cast("int")).collect()
    }
    assert got == want

    approx = quantile_bins(
        df, "score", "lang", 4, descending=True, exact=False
    ).collect()
    assert {r.doc_id for r in approx} == {r.doc_id for r in rows}
    for lang in ("en", "fr"):
        by_bin = {}
        for r in approx:
            if r.lang == lang:
                by_bin.setdefault(r.bin, []).append(r.score)
        # descending: bin 1 holds the highest scores
        bins = sorted(by_bin)
        for a, b in zip(bins, bins[1:]):
            assert min(by_bin[a]) >= max(by_bin[b]), (lang, a, b)
