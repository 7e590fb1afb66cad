"""Compressed JSONL source: chunk-boundary line splitting, codec
roundtrips through real multi-frame files, the path-pruned Spark
reader, and the Kafka-shape adapter."""

import gzip
import io
import json
import os

import pytest

from kafka_delta_ingest_spark.compressed import (
    codec_for,
    iter_lines,
    jsonl_as_kafka,
    read_jsonl,
    write_jsonl,
)


class _Chunky:
    """Reader that returns at most ``n`` bytes per read, forcing line
    splits across chunk boundaries."""

    def __init__(self, data, n):
        self.buf = io.BytesIO(data)
        self.n = n

    def read(self, size):
        return self.buf.read(min(size, self.n))


@pytest.mark.parametrize("chunk", [1, 2, 3, 7, 64])
def test_iter_lines_across_chunk_boundaries(chunk):
    data = b"alpha\nbeta\r\n\ngamma delta\nomega"  # CRLF, blank, no-EOL tail
    got = list(iter_lines(_Chunky(data, chunk), chunk_bytes=8))
    assert got == [b"alpha", b"beta", b"", b"gamma delta", b"omega"]


def test_iter_lines_rejects_unbounded_line(monkeypatch):
    import kafka_delta_ingest_spark.compressed as M

    monkeypatch.setattr(M, "MAX_LINE_BYTES", 100)
    data = b"x" * 500  # no newline at all
    with pytest.raises(ValueError, match="exceeds"):
        list(M.iter_lines(_Chunky(data, 50), chunk_bytes=50))


def test_codec_for_extensions():
    assert codec_for("a/b/part-0001.jsonl.zst") == "zstd"
    assert codec_for("x.JSONL.GZ".lower()) == "gzip"
    assert codec_for("x.jsonl.lz4") == "lz4"
    assert codec_for("x.jsonl") is None


@pytest.mark.parametrize("ext", ["", ".zst", ".gz", ".lz4"])
def test_write_read_roundtrip_all_codecs(tmp_path, ext):
    import pyarrow as pa

    lines = [json.dumps({"i": i, "t": "ü" * i}).encode() for i in range(50)]
    p = str(tmp_path / f"part-0.jsonl{ext}")
    write_jsonl(p, lines)
    with pa.input_stream(p, compression=codec_for(p)) as r:
        got = [ln for ln in iter_lines(r, chunk_bytes=17) if ln]
    assert got == lines


def test_gzip_interop_with_stdlib_writer(tmp_path):
    """A file written by stdlib gzip (not Arrow) must read back —
    the source accepts third-party-produced corpora."""
    import pyarrow as pa

    p = str(tmp_path / "ext.jsonl.gz")
    with gzip.open(p, "wb") as f:
        f.write(b'{"a":1}\n{"a":2}\n')
    with pa.input_stream(p, compression="gzip") as r:
        assert list(iter_lines(r)) == [b'{"a":1}', b'{"a":2}']


def test_read_jsonl_mixed_codecs_and_line_identity(spark, tmp_path):
    rows = {}
    for k, ext in enumerate(["", ".zst", ".gz", ".lz4"]):
        lines = [f'{{"f":{k},"i":{i}}}'.encode() for i in range(20 + k)]
        lines.insert(3, b"")  # blank line: skipped, numbering keeps it
        p = str(tmp_path / f"part-{k:05d}.jsonl{ext}")
        write_jsonl(p, lines)
        rows[k] = lines
    df = read_jsonl(spark, str(tmp_path))
    got = df.collect()
    # every non-blank line accounted for, with physical line numbers
    by_file = {}
    for r in got:
        k = int(r.path.rsplit("part-", 1)[1][:5])
        by_file.setdefault(k, []).append((r.line_no, bytes(r.value)))
    for k, lines in rows.items():
        expect = [
            (i, ln) for i, ln in enumerate(lines) if ln
        ]
        assert sorted(by_file[k]) == expect, k


def test_read_jsonl_prunes_content_column(spark, tmp_path):
    write_jsonl(str(tmp_path / "a.jsonl"), [b"{}"])
    df = read_jsonl(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the binaryFile scan must read path only — file bytes never
    # become a row value (the 100 TB memory guarantee)
    scan = [ln for ln in plan.splitlines() if "binaryFile" in ln]
    assert scan and all(
        "ReadSchema: struct<path:string>" in ln for ln in scan
    ), plan


def test_jsonl_as_kafka_partition_from_path(spark, tmp_path):
    for k in (3, 11):
        write_jsonl(
            str(tmp_path / f"part-{k:05d}.jsonl.zst"),
            [f'{{"i":{i}}}'.encode() for i in range(4)],
        )
    out = jsonl_as_kafka(
        read_jsonl(spark, str(tmp_path)), topic="dump"
    ).collect()
    assert {r.partition for r in out} == {3, 11}
    assert all(r.topic == "dump" and r.timestamp is None for r in out)
    offs = sorted(r.offset for r in out if r.partition == 3)
    assert offs == [0, 1, 2, 3]


def test_read_jsonl_percent_encoded_paths(spark, tmp_path):
    """binaryFile emits percent-encoded file: URIs — a directory with
    a space must still open (review fix: the un-decoded %20 path
    raised FileNotFoundError inside the task)."""
    d = tmp_path / "my corpus"
    d.mkdir()
    write_jsonl(str(d / "part-00000.jsonl.gz"), [b'{"i":1}', b'{"i":2}'])
    got = read_jsonl(spark, str(d)).collect()
    assert sorted(r.line_no for r in got) == [0, 1]


def test_jsonl_as_kafka_oversized_digit_suffix_falls_back_to_hash(
    spark, tmp_path
):
    """A trailing digit run wider than int32 (timestamp-suffixed dump
    names) must take the stable-hash fallback, not overflow the cast
    to a NULL partition (review fix)."""
    write_jsonl(
        str(tmp_path / "shard-20260815123000.jsonl.gz"), [b'{"i":1}']
    )
    out = jsonl_as_kafka(
        read_jsonl(spark, str(tmp_path)), topic="dump"
    ).collect()
    assert len(out) == 1
    assert out[0].partition is not None
    assert 0 <= out[0].partition < (1 << 15)
