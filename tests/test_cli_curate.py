"""CLI `curate` subcommand: the curation funnel over user paths."""

import os

from pyspark.sql import Row

from kafka_delta_ingest_spark.cli import main
from kafka_delta_ingest_spark.io import load_table
from tests.conftest import SF_DIR


def test_curate_exact_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    report = str(tmp_path / "report")
    docs = load_table(spark, SF_DIR, "documents")
    # Plant an exact duplicate so the dedup stage provably fires.
    dup = docs.limit(1).selectExpr(
        "doc_id + 1000000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    docs.unionByName(dup).write.mode("overwrite").parquet(src)

    rc = main(
        [
            "curate",
            src,
            out,
            "--min_quality",
            "0.5",
            "--dedup",
            "exact",
            "--report",
            report,
        ]
    )
    assert rc == 0
    curated = spark.read.parquet(out)
    assert set(curated.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "holdout",
    }
    assert curated.count() > 0
    assert {"quality", "n_tok"} <= set(curated.columns)
    # The planted duplicate died: normalized texts are unique.
    from pyspark.sql import functions as F

    n = curated.count()
    n_distinct = curated.select(
        F.md5(F.lower(F.col("text"))).alias("k")
    ).distinct().count()
    assert n == n_distinct
    assert os.path.exists(report)
    rep = spark.read.parquet(report)
    assert rep.count() >= 1


def test_curate_fuzzy_with_decontam_and_pii(spark, tmp_path):
    src = str(tmp_path / "in")
    bench = str(tmp_path / "bench")
    out = str(tmp_path / "out")
    docs = load_table(spark, SF_DIR, "documents").limit(120)
    docs.write.mode("overwrite").parquet(src)
    # Benchmark = one real document: its 8-grams contaminate that doc.
    docs.limit(1).selectExpr("doc_id AS bench_id", "text").write.mode(
        "overwrite"
    ).parquet(bench)

    rc = main(
        [
            "curate",
            src,
            out,
            "--dedup",
            "fuzzy",
            "--pii_redact",
            "--decontam_benchmark",
            bench,
        ]
    )
    assert rc == 0
    curated = spark.read.parquet(out)
    assert 0 < curated.count() < 120
    # The benchmark twin itself was decontaminated away.
    bench_id = docs.limit(1).collect()[0].doc_id
    assert curated.filter(curated.doc_id == bench_id).count() == 0


def test_curate_boilerplate_and_classifier_stages(spark, tmp_path):
    src = str(tmp_path / "in")
    pos_p = str(tmp_path / "pos")
    neg_p = str(tmp_path / "neg")
    out = str(tmp_path / "out")

    boiler = " ".join(f"term{i}" for i in range(60))
    goodish = "excellent thorough research into the rigorous details of the method and its careful evaluation"
    baddish = "click here winner casino lottery spam free prize now claim your reward instantly today"
    rows = [
        # two boilerplate carriers: doc 0 keeps the passage, doc 1 loses it
        Row(doc_id=0, text=goodish + " " + boiler),
        Row(doc_id=1, text=goodish + " extra words here " + boiler),
        Row(doc_id=2, text=goodish),
        Row(doc_id=3, text=baddish),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [Row(doc_id=100 + i, text=goodish) for i in range(3)]
    ).write.mode("overwrite").parquet(pos_p)
    spark.createDataFrame(
        [Row(doc_id=200 + i, text=baddish) for i in range(3)]
    ).write.mode("overwrite").parquet(neg_p)

    rc = main(
        [
            "curate", src, out,
            "--min_quality", "0.0",
            "--dedup", "none",
            "--remove_boilerplate",
            "--classifier_pos", pos_p,
            "--classifier_neg", neg_p,
            "--classifier_threshold", "0.5",
        ]
    )
    assert rc == 0
    curated = spark.read.parquet(out)
    got = {r.doc_id: r.text for r in curated.collect()}
    # classifier dropped the spam doc, kept the good ones
    assert 3 not in got and {0, 1, 2} <= set(got)
    # boilerplate survived only in the lowest-id carrier
    assert boiler in got[0]
    assert boiler not in got[1]


def test_curate_gram_index_steady_state(spark, tmp_path):
    """Two curate runs sharing --gram_index: the second batch's
    near-dup resubmissions of batch-1 text must be rejected by the
    persisted index, and the index grows append-only."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").orderBy("doc_id")
    base = docs.limit(20).collect()
    idx = str(tmp_path / "gram_index")
    schema = "doc_id long, text string, lang string, source string, n_chars int"

    src1, out1 = str(tmp_path / "in1"), str(tmp_path / "out1")
    spark.createDataFrame(
        [(d.doc_id, d.text, d.lang, d.source, d.n_chars) for d in base[:10]],
        schema,
    ).write.mode("overwrite").parquet(src1)
    rc = main(
        ["curate", src1, out1, "--min_quality", "0.0", "--dedup", "none",
         "--gram_index", idx]
    )
    assert rc == 0
    n1 = spark.read.parquet(out1).count()
    assert n1 == 10
    idx_n1 = spark.read.parquet(idx).count()
    assert idx_n1 > 0

    # Batch 2: 5 fresh docs + 3 near-dup resubmissions of batch-1 text
    # under new ids (one appended word: high Jaccard, not exact).
    src2, out2 = str(tmp_path / "in2"), str(tmp_path / "out2")
    rows2 = [
        (d.doc_id, d.text, d.lang, d.source, d.n_chars) for d in base[10:15]
    ] + [
        (9_000 + i, base[i].text + " resub", base[i].lang, base[i].source,
         base[i].n_chars)
        for i in range(3)
    ]
    spark.createDataFrame(rows2, schema).write.mode("overwrite").parquet(src2)
    rc = main(
        ["curate", src2, out2, "--min_quality", "0.0", "--dedup", "none",
         "--gram_index", idx]
    )
    assert rc == 0
    admitted2 = {r.doc_id for r in spark.read.parquet(out2).collect()}
    # Golden: the stateless operator against the corpus admitted so far
    # (the synthetic documents table contains natural near-dups, so the
    # fresh docs are not all guaranteed through).
    from kafka_delta_ingest_spark.operators.dedup import incremental_ngram_dedup

    existing = spark.read.parquet(out1).select("doc_id", "text")
    batch2 = spark.createDataFrame(rows2, schema).select("doc_id", "text")
    golden = {
        r.doc_id
        for r in incremental_ngram_dedup(
            existing, batch2, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert admitted2 == golden
    assert not any(i >= 9_000 for i in admitted2)
    # index grew by exactly the admitted docs' grams
    idx_n2 = spark.read.parquet(idx).count()
    assert idx_n2 > idx_n1
    assert spark.read.parquet(idx).filter(F.col("doc_id") >= 9_000).count() == 0

    # Replay guard: re-running batch 1 (same ids) must NOT duplicate
    # grams in the index — the CLI skips already-present ids on append
    # (r5 advisor finding: a replayed batch silently inflated
    # idx_sizes, weakening future Jaccard admissions).
    out1b = str(tmp_path / "out1b")
    rc = main(
        ["curate", src1, out1b, "--min_quality", "0.0", "--dedup", "none",
         "--gram_index", idx]
    )
    assert rc == 0
    assert spark.read.parquet(idx).count() == idx_n2
    assert (
        spark.read.parquet(idx).distinct().count() == idx_n2
    )  # still no duplicate (doc_id, gh) rows


def test_curate_paragraph_dedup_stage(spark, tmp_path):
    """--dedup_paragraphs rewrites only touched docs (untouched docs
    keep exact bytes) and the repeated paragraph survives solely in
    its first (id, pos) carrier."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    rows = [
        Row(doc_id=1, text="alpha beta gamma delta one\nshared para body here",
            lang="en", source="s", n_chars=10),
        Row(doc_id=2, text="shared para body here\nepsilon zeta eta theta two",
            lang="en", source="s", n_chars=10),
        Row(doc_id=3, text="untouched text stays byte identical three",
            lang="en", source="s", n_chars=10),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)
    rc = main(
        ["curate", src, out, "--min_quality", "0.0",
         "--dedup", "none", "--dedup_paragraphs"]
    )
    assert rc == 0
    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got[1] == "alpha beta gamma delta one\nshared para body here"
    assert got[2] == "epsilon zeta eta theta two"
    assert got[3] == "untouched text stays byte identical three"
