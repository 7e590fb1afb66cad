"""Property-based tests (hypothesis): the custom scalar functions match
independent Python reference implementations over randomized inputs.

Each case batches ~dozens of generated examples into ONE DataFrame so a
hypothesis run costs a handful of Spark jobs, not hundreds.
"""

import datetime
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.coercions import RFC3339_PATTERN
from kafka_delta_ingest_spark.operators.text import ROLLING_HASH_MOD
from kafka_delta_ingest_spark.transforms import (
    epoch_millis_to_iso8601,
    substr_chars,
)

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA0),
    max_size=40,
)


def _py_iso_variable(micros: int) -> str:
    """chrono {:?} on DateTime<Utc>: shortest of 0/3/6 frac digits."""
    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=micros)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    sub = micros % 1_000_000
    if sub == 0:
        return base + "Z"
    if sub % 1000 == 0:
        return f"{base}.{sub // 1000:03d}Z"
    return f"{base}.{sub:06d}Z"


@settings(max_examples=4, deadline=None)
@given(st.lists(st.tuples(TEXT, st.integers(0, 50), st.integers(0, 50)), min_size=1, max_size=60))
def test_substr_chars_matches_python_slicing(spark, cases):
    """Rust chars().skip(n).take(m) ≡ Python s[n:n+m] (char-based)."""
    df = spark.createDataFrame(
        [(i, s, a, b) for i, (s, a, b) in enumerate(cases)], "i int, s string, a int, b int"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", substr_chars(F.col("s"), F.col("a"), F.col("b")).alias("out")
        ).collect()
    }
    for i, (s, a, b) in enumerate(cases):
        assert got[i] == s[a : a + b], (s, a, b)


@settings(max_examples=4, deadline=None)
@given(st.lists(st.integers(0, 4_000_000_000_000), min_size=1, max_size=60))
def test_epoch_millis_iso8601_matches_chrono_semantics(spark, millis):
    df = spark.createDataFrame([(i, m) for i, m in enumerate(millis)], "i int, ms long")
    got = {
        r["i"]: r["out"]
        for r in df.select("i", epoch_millis_to_iso8601(F.col("ms")).alias("out")).collect()
    }
    for i, m in enumerate(millis):
        assert got[i] == _py_iso_variable(m * 1000), m


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.datetimes(
                min_value=datetime.datetime(1971, 1, 1),
                max_value=datetime.datetime(2200, 1, 1),
            ).map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%S") + "Z"),
            st.datetimes(
                min_value=datetime.datetime(1971, 1, 1),
                max_value=datetime.datetime(2200, 1, 1),
            ).map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")),  # no offset → reject
            TEXT,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rfc3339_gate_matches_python_regex(spark, strings):
    """The Spark-side rlike gate agrees with Python's re over the same
    pattern for arbitrary strings (valid, offset-less, garbage)."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i int, s string")
    got = {
        r["i"]: r["ok"]
        for r in df.select("i", F.col("s").rlike(RFC3339_PATTERN).alias("ok")).collect()
    }
    pat = re.compile(RFC3339_PATTERN)
    for i, s in enumerate(strings):
        assert got[i] == bool(pat.match(s)), s


@settings(max_examples=4, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60), min_size=1, max_size=60))
def test_rolling_fingerprint_matches_python(spark, texts):
    from kafka_delta_ingest_spark.operators.text import fingerprint_rolling

    def py_roll(s: str) -> int:
        norm = re.sub(r"\s+", " ", s.lower()).strip()
        h = 0
        for ch in norm:
            h = (h * 31 + ord(ch)) % ROLLING_HASH_MOD
        return h

    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i int, s string")
    got = {
        r["i"]: r["h"]
        for r in df.select("i", fingerprint_rolling(F.col("s")).alias("h")).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == py_roll(s), repr(s)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=50
        ),
        min_size=1,
        max_size=40,
    )
)
def test_repetition_profile_matches_python(spark, texts):
    from collections import Counter

    from kafka_delta_ingest_spark.operators.text import repetition_profile

    def py_profile(s: str):
        words = re.sub(r"\s+", " ", s.lower()).strip().split(" ")
        n = len(words)
        dup = round(1.0 - len(set(words)) / n, 6)
        bigrams = (
            [" ".join(words[i : i + 2]) for i in range(n - 1)] if n >= 2 else []
        )
        top = (
            round(max(Counter(bigrams).values()) / len(bigrams), 6) if bigrams else 0.0
        )
        return n, dup, top

    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "doc_id int, text string")
    got = {
        r.doc_id: (r.n_words, r.dup_word_frac, r.top_bigram_frac)
        for r in repetition_profile(df).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == py_profile(s), repr(s)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80),
        min_size=1,
        max_size=40,
    ),
    st.integers(2, 9),
)
def test_word_shingles_match_python_reference(spark, texts, k):
    """The chained-zip_with shingle construction equals the obvious
    Python sliding-window-over-normalized-words reference, including
    the shorter-than-k single-gram branch and distinctness."""
    from kafka_delta_ingest_spark.operators.dedup import word_shingles

    def py_shingles(s: str, kk: int) -> set[str]:
        words = re.sub(r"\s+", " ", s.lower()).strip().split(" ")
        if len(words) < kk:
            return {" ".join(words)}
        return {" ".join(words[i : i + kk]) for i in range(len(words) - kk + 1)}

    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i int, s string")
    got = {
        r["i"]: set(r["g"])
        for r in df.select("i", word_shingles(F.col("s"), k).alias("g")).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == py_shingles(s, k), (k, repr(s))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200),
        min_size=1,
        max_size=25,
    ),
    st.integers(2, 20),
    st.integers(1, 15),
)
def test_chunk_sliding_matches_python_reference(spark, texts, chunk, stride):
    """Chunk boundaries equal the obvious Python sliding window for any
    (chunk_tokens, stride), including the shorter tail window and the
    one-chunk-per-nonempty-doc guarantee."""
    from kafka_delta_ingest_spark.operators.text import chunk_sliding

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id int, text string"
    )
    got = {}
    for r in chunk_sliding(df, chunk_tokens=chunk, stride=stride).collect():
        got.setdefault(r.doc_id, {})[r.chunk_ix] = (r.n_tok, r.chunk_text)
    for i, s in enumerate(texts):
        toks = s.split()
        if not toks:
            assert i not in got
            continue
        want = {}
        for ix, start in enumerate(range(0, len(toks), stride)):
            w = toks[start : start + chunk]
            want[ix] = (len(w), " ".join(w))
        assert got.get(i) == want, (i, repr(s), chunk, stride)


# ---------------------------------------------------------------------------
# Codec properties (pure-Python, no Spark): WAV round-trips exactly;
# JPEG round-trips within quantization tolerance for arbitrary content.
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 400).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.integers(-32768, 32767), min_size=n, max_size=n
            ),
            st.integers(1, 2),
            st.sampled_from([8000, 16000, 44100]),
        )
    )
)
def test_wav_pcm16_roundtrip_lossless_property(args):
    import numpy as np

    from kafka_delta_ingest_spark.operators.audio import (
        decode_wav,
        encode_wav,
    )

    n, vals, channels, rate = args
    usable = (n // channels) * channels
    if usable == 0:
        return
    a = np.array(vals[:usable], dtype=np.int16).reshape(-1, channels)
    out, got_rate = decode_wav(encode_wav(a, rate))
    assert got_rate == rate
    assert np.array_equal(out, a)


@settings(max_examples=8, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_roundtrip_bounded_error_property(h, w, gray, seed):
    import numpy as np

    from kafka_delta_ingest_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    # Smooth-ish content: random low-frequency base + mild noise, the
    # regime where q95 quantization error is tightly bounded. Pure
    # noise is exercised separately in test_jpeg_decode.py.
    base = rng.integers(30, 220)
    img = np.clip(
        base + rng.normal(0, 12, size=shape), 0, 255
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 16.0
    # decoded image is a legal uint8 array of the declared geometry
    assert out.dtype == np.uint8


@settings(max_examples=3, deadline=None)
@given(st.data())
def test_winnow_coverage_guarantee_property(spark, data):
    """Schleimer et al.'s theorem, fuzzed: ANY pair of docs sharing a
    contiguous run of >= w+k-1 tokens MUST share a winnowing
    fingerprint (cap disabled, min_shared=1) — including docs whose
    filler is internally repetitive (the regime where a set-collapsed
    gram sequence loses windows). Conversely, docs with disjoint
    vocabularies must never pair."""
    from kafka_delta_ingest_spark.operators.dedup import winnow_pairs

    k, w = 5, 4
    n_pairs = data.draw(st.integers(2, 6))
    rows, planted = [], set()
    for i in range(n_pairs):
        run_len = data.draw(st.integers(w + k - 1, w + k + 6))
        run = [f"s{i}t{j}" for j in range(run_len)]
        docs = []
        for side in (0, 1):
            doc_id = 2 * i + side
            n_fill = data.draw(st.integers(0, 25))
            # filler vocabulary is unique per doc; repetitive docs
            # draw from a tiny pool so tokens repeat back-to-back
            pool = data.draw(st.integers(1, 4))
            fill = [
                f"d{doc_id}f{data.draw(st.integers(0, pool - 1))}"
                for _ in range(n_fill)
            ]
            cut = data.draw(st.integers(0, n_fill))
            docs.append(" ".join(fill[:cut] + run + fill[cut:]))
        rows.append((2 * i, docs[0]))
        rows.append((2 * i + 1, docs[1]))
        planted.add((2 * i, 2 * i + 1))
    # plus a loner with no shared run: must never appear in any pair
    rows.append((10_000, " ".join(f"lonew{j}" for j in range(20))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(
            df, k=k, w=w, min_shared=1, max_fp_df=None
        ).collect()
    }
    assert planted <= got, planted - got
    assert not any(10_000 in p for p in got)
    # only planted-run vocab is cross-doc, so no other pairs exist
    assert got == planted
