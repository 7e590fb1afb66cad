"""BPE trainer vs a pure-Python sequential reference."""

from collections import Counter

from pyspark.sql import Row

from kafka_delta_ingest_spark.operators.bpe import pair_census, train_bpe


def _py_train(texts, n):
    wc = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n):
        pc = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_train_bpe_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the thin thing thought",
        "banana bandana",
        "aaaa aaa baab",  # overlapping (a,a) occurrences: greedy rule
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    assert train_bpe(df, 6) == _py_train(texts, 6)


def test_train_bpe_batched_schedules_match_sequential(spark):
    # Greedy-equivalence of the batched trainer: every batch_k must
    # produce the exact sequential schedule (the batch safety rules —
    # disjoint prefix, fresh outputs, new-pair guard — only ever
    # truncate a round, never reorder it).
    texts = [
        "the cat sat on the mat",
        "the thin thing thought about the weather",
        "banana bandana cabana",
        "aaaa aaa baab",  # overlapping (a,a): greedy + guard stress
        "ababab abab ab",  # merged output immediately forms a top pair
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    want = _py_train(texts, 12)
    for k in (1, 2, 4, 8):
        assert train_bpe(df, 12, batch_k=k) == want, k


def test_train_bpe_batched_random_corpora(spark):
    # Seeded random corpora over a tiny alphabet maximize pair
    # collisions, non-fresh merged outputs ("ab" the string reappears),
    # and count ties — the cases where unsafe batching would diverge.
    import random

    rng = random.Random(42)
    for trial in range(4):
        texts = [
            " ".join(
                "".join(
                    rng.choice("abc") for _ in range(rng.randint(1, 7))
                )
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        want = _py_train(texts, 12)
        assert train_bpe(df, 12, batch_k=8) == want, (trial, texts)


def test_pair_census_weighted_by_word_frequency(spark):
    # "ab" occurs 3x as a word, "ba" once -> (a,b) outranks (b,a).
    df = spark.createDataFrame(
        [Row(doc_id=0, text="ab ab ab ba")]
    )
    rows = pair_census(df, top_k=2).collect()
    assert [(r.a, r.b, r.pair_count) for r in rows] == [
        ("a", "b", 3),
        ("b", "a", 1),
    ]


def test_train_bpe_exhausts_gracefully(spark):
    # Single 2-char word: one merge possible, then the census is empty.
    df = spark.createDataFrame([Row(doc_id=0, text="ab")])
    assert train_bpe(df, 5) == [("a", "b", 1)]


def _py_encode(text, merges):
    ranks = {(a, b): i for i, (a, b, *_) in enumerate(merges)}
    out = []
    for w in text.lower().split():
        syms = list(w)
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out.extend(syms)
    return out


def test_bpe_encode_matches_reference_and_reconstructs(spark):
    from kafka_delta_ingest_spark.operators.bpe import bpe_encode

    texts = [
        "the cat sat on the mat",
        "the thin thing thought about the weather",
        "banana bandana cabana",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    merges = train_bpe(df, 8)
    got = {r.doc_id: (list(r.bpe_tokens), r.n_bpe) for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        want = _py_encode(t, merges)
        assert got[i] == (want, len(want)), i
        # Lossless: concatenated tokens reconstruct the word stream.
        assert "".join(want) == t.lower().replace(" ", "")
