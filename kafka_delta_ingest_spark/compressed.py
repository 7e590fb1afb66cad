"""Compressed newline-delimited file source — the layout large
research corpora actually ship in (``.jsonl.zst`` / ``.jsonl.gz`` /
``.jsonl.lz4``: RedPajama, Dolma, FineWeb, The Pile all distribute
zstd- or gzip-framed JSON lines).

Spark's own text/json sources decompress through Hadoop codecs, and in
a jar-light deployment (this container included) the Hadoop native
bindings for zstd/lz4 are absent — ``NativeCodeLoader`` falls back to
builtin-java classes which cover gzip only.  Arrow ships the codecs as
part of pyarrow, so the portable path is Arrow streaming decompression
inside the Python workers.

Scale design (the part that must survive 100 TB):

* **Paths, not payloads, flow through the plan.** The file listing
  comes from the ``binaryFile`` source with ONLY ``path``/``length``
  selected — that format is column-pruning-aware, so file contents are
  never loaded into rows (a 1 GB ``.zst`` member as a DataFrame cell
  would blow executor memory and shuffle buffers).  Each task opens
  its own files and STREAMS them: ``pa.input_stream`` decompresses in
  bounded chunks, and the line splitter carries the partial tail line
  across chunk boundaries, so peak memory is O(chunk + longest line)
  regardless of file size.
* **One task owns one file** (compressed streams are not splittable
  mid-member) — the CommonCrawl processing model: parallelism scales
  with file count (80k × ~1 GB files → 80k tasks), not with
  ``maxPartitionBytes``.  ``spread()`` widens a short file list to
  cluster width.
* **Kafka-shape adapter.** ``jsonl_as_kafka`` maps (file, line) →
  the (value/partition/offset/topic/timestamp/timestampType) layout
  the ingest dataflow consumes, so a compressed dump replays through
  the exact deserialize → transform → coerce → DLQ pipeline a live
  topic would (reference src/lib.rs:640-720 runs the same loop over
  consumed messages; files are the bootstrap/backfill path).

A fixture writer (``write_jsonl``) emits real multi-frame files via
``pa.output_stream`` for tests and the driver query.
"""

from __future__ import annotations

import posixpath
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .operators.util import spread

#: extension → Arrow codec name (pa.input_stream compression=).
EXT_CODECS = {
    ".gz": "gzip",
    ".gzip": "gzip",
    ".zst": "zstd",
    ".zstd": "zstd",
    ".lz4": "lz4",
    ".bz2": "bz2",
    ".br": "brotli",
}

#: refuse lines longer than this (a binary file mistaken for JSONL
#: would otherwise accumulate the whole stream into the carry buffer).
MAX_LINE_BYTES = 64 << 20


def codec_for(path: str) -> str | None:
    """Codec name for a file path by extension; None = uncompressed."""
    return EXT_CODECS.get(posixpath.splitext(path)[1].lower())


def iter_lines(reader, chunk_bytes: int = 1 << 20) -> Iterator[bytes]:
    """Split a byte stream into ``\\n``-terminated lines, reading in
    bounded chunks and carrying the partial tail across boundaries.
    Trailing ``\\r`` is stripped (CRLF corpora); the final unterminated
    line, if any, is yielded."""
    carry = b""
    while True:
        chunk = reader.read(chunk_bytes)
        if not chunk:
            break
        parts = (carry + chunk).split(b"\n")
        carry = parts.pop()
        if len(carry) > MAX_LINE_BYTES:
            raise ValueError(
                f"line exceeds {MAX_LINE_BYTES} bytes — not a text file?"
            )
        for ln in parts:
            yield ln[:-1] if ln.endswith(b"\r") else ln
    if carry:
        yield carry[:-1] if carry.endswith(b"\r") else carry


def write_jsonl(path: str, lines: Iterable[bytes]) -> None:
    """Fixture writer: compression chosen by extension (real
    multi-frame zstd / gzip members / LZ4 frames via Arrow)."""
    import pyarrow as pa

    comp = codec_for(path)
    with pa.output_stream(path, compression=comp) as w:
        for ln in lines:
            w.write(ln + b"\n")


_LINES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("line_no", LongType()),
        StructField("value", BinaryType()),
    ]
)


def _local(path: str) -> str:
    """file: URI → filesystem path (binaryFile emits file:/…).

    binaryFile emits PERCENT-ENCODED URIs — a directory named
    "my corpus" arrives as ``file:/…/my%20corpus/…`` — so the path
    must be unquoted after the scheme strip or the open fails."""
    from urllib.parse import unquote

    if path.startswith("file://"):
        path = path[7:]
    elif path.startswith("file:"):
        path = path[5:]
    else:
        return path
    return unquote(path)


def read_jsonl(
    spark,
    path: str,
    batch_rows: int = 10_000,
    chunk_bytes: int = 1 << 20,
) -> DataFrame:
    """DataFrame of (path, line_no, value) over (optionally
    compressed) newline-delimited files.  ``line_no`` is the 0-based
    physical line index within its file — with the file path it is the
    replayable (partition, offset) identity of a record.  Blank lines
    are skipped (line numbering still counts them), matching every
    JSONL reader's convention."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path")  # column pruning: content is never read
    )
    wide = spread(files)

    def gen(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            out_p: list[str] = []
            out_n: list[int] = []
            out_v: list[bytes] = []
            for uri in pdf["path"]:
                with pa.input_stream(
                    _local(uri), compression=codec_for(uri)
                ) as r:
                    for i, ln in enumerate(iter_lines(r, chunk_bytes)):
                        if not ln:
                            continue
                        out_p.append(uri)
                        out_n.append(i)
                        out_v.append(ln)
                        if len(out_v) >= batch_rows:
                            yield pd.DataFrame(
                                {"path": out_p, "line_no": out_n,
                                 "value": out_v}
                            )
                            out_p, out_n, out_v = [], [], []
            if out_v:
                yield pd.DataFrame(
                    {"path": out_p, "line_no": out_n, "value": out_v}
                )

    return wide.mapInPandas(gen, _LINES_SCHEMA)


def jsonl_as_kafka(
    lines: DataFrame, topic: str, partition_from_path: bool = True
) -> DataFrame:
    """(path, line_no, value) → the Spark-Kafka-source column layout
    the ingest dataflow consumes.  Partition identity: the file (its
    basename's trailing integer when present — the ``part-00007``
    convention — else a stable hash), offset: the line number.  The
    timestamp is the LogAppendTime stand-in NULL: file dumps carry no
    broker time, and the coercion tree passes nulls through (reference
    src/transforms.rs timestamp handling)."""
    digits = F.regexp_extract(
        F.regexp_replace(F.col("path"), r"(\.[A-Za-z0-9]+)+$", ""),
        r"(\d+)$",
        1,
    )
    # Trailing digit runs longer than 9 chars (timestamp-suffixed
    # dumps like shard-20260815123000) overflow int32 to NULL under
    # the cast; those fall back to the stable hash like no-digit
    # names, keeping the (partition, offset) identity total.
    part = (
        F.when(
            (digits != "") & (F.length(digits) <= 9), digits.cast("int")
        )
        .otherwise(F.pmod(F.xxhash64("path"), F.lit(1 << 15)).cast("int"))
        if partition_from_path
        else F.lit(0)
    )
    return lines.select(
        F.col("value"),
        part.alias("partition"),
        F.col("line_no").alias("offset"),
        F.lit(topic).alias("topic"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
