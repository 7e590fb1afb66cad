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
