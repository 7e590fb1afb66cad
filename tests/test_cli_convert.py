"""`python -m kafka_delta_ingest_spark convert <direction> <src> <dest>`:
the metadata-only bridge CLI over all four conversion directions."""

import pytest

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.cli import main
from kafka_delta_ingest_spark.delta_standard import (
    DeltaStandardWriter,
    read_delta,
)
from kafka_delta_ingest_spark.hudi import HudiCowWriter
from kafka_delta_ingest_spark.iceberg import read_iceberg


def _docs(spark, n=30):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )


def test_cli_convert_all_directions(spark, tmp_path, capsys):
    t = str(tmp_path / "delta")
    DeltaStandardWriter(t).write(_docs(spark))
    h = str(tmp_path / "hudi")
    HudiCowWriter(h, record_key="doc_id").insert_batch(_docs(spark))

    assert main(["convert", "delta-to-iceberg", t,
                 str(tmp_path / "i1")]) == 0
    assert main(["convert", "iceberg-to-delta", str(tmp_path / "i1"),
                 str(tmp_path / "d2")]) == 0
    assert main(["convert", "hudi-to-delta", h,
                 str(tmp_path / "d3")]) == 0
    assert main(["convert", "hudi-to-iceberg", h,
                 str(tmp_path / "i2")]) == 0
    assert main(["convert", "delta-to-hudi", t, str(tmp_path / "h2"),
                 "--record_key", "doc_id"]) == 0
    out = capsys.readouterr().out
    assert "converted\thudi-to-iceberg" in out
    assert "converted\tdelta-to-hudi" in out

    from kafka_delta_ingest_spark.hudi import read_hudi

    base = _docs(spark)
    for view in (
        read_iceberg(spark, str(tmp_path / "i1")),
        read_delta(spark, str(tmp_path / "d2")),
        read_delta(spark, str(tmp_path / "d3")),
        read_iceberg(spark, str(tmp_path / "i2")),
        read_hudi(spark, str(tmp_path / "h2")),
    ):
        v = view.select("doc_id", "grp", "val")
        assert v.exceptAll(base).count() == 0
        assert base.exceptAll(v).count() == 0


def test_cli_convert_refusal_propagates(spark, tmp_path):
    t = str(tmp_path / "delta")
    w = DeltaStandardWriter(t)
    w.write(_docs(spark))
    w.delete_where(spark, "doc_id % 3 = 0")  # live DV
    with pytest.raises(ValueError, match="deletion vector"):
        main(["convert", "delta-to-iceberg", t, str(tmp_path / "ice")])
