"""Focused tests for the r13 optimization round's internals changes.

Covers: the decoded-cardinality broadcast gate (roaring header walk),
the overlap() driver-thread helper, the snapshot+end_instant guard in
read_hudi_incremental, and the sizes-from-grams derivation inside the
incremental dedup admission core.
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# -- roaring: header-only cardinality walk ---------------------------------


def test_rbm_cardinality_matches_full_decode():
    import random

    from kafka_delta_ingest_spark.roaring import (
        deserialize_rbm_array,
        rbm_array_cardinality,
        serialize_rbm_array,
    )

    random.seed(7)
    cases = [
        list(range(500_000)),  # dense runs: tiny bytes, huge cardinality
        random.sample(range(10_000_000), 5000),  # array containers
        list(range(0, 200_000, 2)),  # bitmap containers
        [random.randrange(0, 2**40) for _ in range(3000)],  # many highs
        [0],
        [2**40 - 1],
    ]
    for vals in cases:
        vals = sorted(set(vals))
        buf = serialize_rbm_array(vals)
        assert rbm_array_cardinality(buf) == len(deserialize_rbm_array(buf)) == len(vals)


def test_run_encoded_dv_is_not_size_broadcastable():
    """The ADVICE scenario: dense contiguous deletes run-encode far
    below the old 256 KiB byte gate while expanding to 500k positions —
    the cardinality gate must see the expansion."""
    from kafka_delta_ingest_spark.roaring import (
        rbm_array_cardinality,
        serialize_rbm_array,
    )

    buf = serialize_rbm_array(list(range(500_000)))
    assert len(buf) <= 256 * 1024  # old gate would have broadcast it
    assert rbm_array_cardinality(buf) == 500_000  # new gate refuses


# -- io.overlap: ordering and exception propagation ------------------------


def test_overlap_returns_results_in_argument_order():
    from kafka_delta_ingest_spark.io import overlap

    def slow():
        time.sleep(0.05)
        return "slow"

    assert overlap(slow, lambda: "fast") == ["slow", "fast"]
    assert overlap(lambda: 1) == [1]


def test_overlap_waits_for_all_then_raises_first_error():
    from kafka_delta_ingest_spark.io import overlap

    state = {"b_done": False}

    def a():
        raise ValueError("leg a failed")

    def b():
        time.sleep(0.1)
        state["b_done"] = True
        return "b"

    with pytest.raises(ValueError, match="leg a failed"):
        overlap(a, b)
    # the healthy leg ran to completion (no abandoned half-written leg)
    assert state["b_done"]


# -- hudi: snapshot= with end_instant= guard --------------------------------


def test_incremental_snapshot_with_end_instant_filters(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.hudi import (
        HudiCowWriter,
        read_hudi,
        read_hudi_incremental,
    )

    t = str(tmp_path / "t")
    w = HudiCowWriter(t, record_key="k")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    w.insert_batch(df)
    i1 = w.latest_instant()
    w.upsert_batch(
        spark.createDataFrame([(2, "b")], "k long, v string")
    )
    i2 = w.latest_instant()
    w.upsert_batch(
        spark.createDataFrame([(3, "c")], "k long, v string")
    )
    snap = read_hudi(spark, t, keep_meta=True)
    # snapshot supplied AND end_instant supplied: rows committed after
    # end_instant (k=3) must NOT leak through (previously silently did)
    got = {
        r.k
        for r in read_hudi_incremental(
            spark, t, i1, end_instant=i2, snapshot=snap
        ).collect()
    }
    assert got == {2}


# -- dedup: sizes derived from the materialized gram table ------------------


def test_incremental_dedup_zero_shingle_docs_admitted(spark):
    """Docs with no shingles have no gram rows (hence no derived size
    row); they can never pair, so they are always admitted — same as
    the old explicit size(word_shingles) lineage."""
    from kafka_delta_ingest_spark.operators.dedup import (
        incremental_ngram_dedup,
    )

    existing = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),  # dup: rejected
            (11, ""),  # zero shingles: admitted
            (12, "zz"),  # < n tokens -> zero shingles: admitted
            (13, "one two three four five six seven"),  # novel: admitted
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id
        for r in incremental_ngram_dedup(
            existing, incoming, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert got == {11, 12, 13}
