"""Log-odds hashed-unigram classifier: separation, weight-table
shape, and threshold semantics."""

from pyspark.sql import Row, functions as F

from kafka_delta_ingest_spark.operators.quality import (
    classifier_score,
    train_log_odds_weights,
)


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_weight_table_covers_every_bucket(spark):
    pos = _df(spark, [(0, "alpha beta gamma")])
    neg = _df(spark, [(1, "delta epsilon zeta")])
    w = train_log_odds_weights(pos, neg, n_buckets=64).collect()
    assert len(w) == 64
    assert sorted(r.bucket for r in w) == list(range(64))
    # every weight finite (Laplace smoothing: no log(0) anywhere)
    assert all(abs(r.weight) < 50 for r in w)


def test_classifier_separates_seed_vocabularies(spark):
    pos_words = "excellent research rigorous detailed thorough"
    neg_words = "spam casino lottery winner click"
    pos = _df(spark, [(i, pos_words) for i in range(5)])
    neg = _df(spark, [(i + 10, neg_words) for i in range(5)])
    w = train_log_odds_weights(pos, neg, n_buckets=128)
    test = _df(
        spark,
        [
            (100, "rigorous detailed research"),
            (101, "casino lottery spam"),
            (102, pos_words + " " + neg_words),  # balanced mix
        ],
    )
    got = {r.doc_id: r for r in classifier_score(test, w, n_buckets=128).collect()}
    # tiny seeds + Laplace over 128 buckets → per-token weight ln 6,
    # so a pure-positive doc scores sigmoid(ln 6) ≈ 0.857
    assert got[100].score > 0.8 and got[100].keep
    assert got[101].score < 0.2 and not got[101].keep
    assert 0.2 < got[102].score < 0.8
    assert got[100].n_tok == 3


def test_unseen_words_get_prior_not_crash(spark):
    pos = _df(spark, [(0, "aaa bbb")])
    neg = _df(spark, [(1, "ccc ddd")])
    w = train_log_odds_weights(pos, neg, n_buckets=32)
    test = _df(spark, [(5, "totally novel vocabulary here")])
    rows = classifier_score(test, w, n_buckets=32).collect()
    assert len(rows) == 1 and rows[0].score is not None


def test_threshold_parameter_moves_keep_boundary(spark):
    pos = _df(spark, [(0, "good")])
    neg = _df(spark, [(1, "bad")])
    w = train_log_odds_weights(pos, neg, n_buckets=16)
    test = _df(spark, [(5, "good"), (6, "bad")])
    strict = {
        r.doc_id: r.keep
        for r in classifier_score(test, w, n_buckets=16, threshold=0.99).collect()
    }
    lax = {
        r.doc_id: r.keep
        for r in classifier_score(test, w, n_buckets=16, threshold=0.01).collect()
    }
    assert strict[6] is False and lax[5] is True
