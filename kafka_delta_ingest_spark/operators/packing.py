"""Sequence packing: arranging documents into fixed-length training
contexts.

Two published shapes, both deterministic and oracle-replayable:

* :func:`pack_concat_chunk` — GPT-style "concatenate and chunk"
  (Brown et al. 2020 §2.1, Raffel et al. 2020): shuffle documents into
  a deterministic order, concatenate their token streams, and cut the
  stream into ``ctx_len``-token windows. Documents may straddle window
  boundaries; there is zero padding. Output maps every document to the
  context windows it lands in.

* :func:`pack_bins_nfd` — no-split bin packing for SFT-style training
  where an example must not be cut: next-fit-decreasing inside
  deterministic shards. NFD is the classic one-pass approximation
  (Johnson 1973: next-fit ≤ 2·OPT, decreasing order in practice far
  better); sharding makes it distributed — each shard packs its own
  bins sequentially, so packing quality degrades only by the shard
  count while the work spreads over the cluster.

Scale notes: concat-chunk needs a GLOBAL exclusive prefix sum of token
counts in hash order. That is the same 256-bucket two-level scan
``sample_token_budget`` uses (one tiny 256-row window + per-bucket
windows that run 256-way parallel) — no global sort, no single-task
window. NFD shards via ``id % n_shards``; each shard is one
``applyInPandas`` group whose memory is O(shard rows), so the default
derives ``n_shards`` from corpus_rows / ``rows_per_shard`` (≈200 MB
of (id, n_tokens) longs per task at the 4M-row default). The
reference engine has no packing surface; this extends the LLM-pipeline
family (SURVEY §6).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from kafka_delta_ingest_spark.operators.text import token_count


def pack_concat_chunk(
    df: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Concat-and-chunk packing plan: each document's placement in the
    concatenated token stream, cut into ``ctx_len``-token contexts.

    Documents are ordered by ``md5(seed || id)`` — the deterministic
    corpus shuffle every split/sample operator here uses, which also
    IS the "shuffle your corpus before packing" step the recipe calls
    for. Zero-token documents occupy no stream positions; they report
    the context the stream cursor is in and span one context.

    Returns one row per document: ``(id, n_tokens, stream_start,
    first_ctx, last_ctx, n_ctx)`` where ``stream_start`` is the
    exclusive prefix sum of token counts in shuffle order and a
    document spans contexts ``floor(start/ctx)`` through
    ``floor((start+tokens-1)/ctx)``.

    Plan shape: two-level distributed prefix scan — per-row keys
    bucket by their first two hex chars (hex order == global key
    order); one 256-row aggregate + window computes bucket offsets;
    per-bucket windows (256-way parallel, each over ~1/256 of the
    corpus) finish the exact scan. No global sort or single-task
    window anywhere.
    """
    key = F.md5(F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string")))
    rows = (
        df.select(
            F.col(id_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn("_bkey", key)
        .withColumn("_bucket", F.substring("_bkey", 1, 2))
    )
    per_bucket = rows.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bsum"))
    wb = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    bounds = per_bucket.withColumn(
        "_boff", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    ).select("_bucket", "_boff")
    ws = Window.partitionBy("_bucket").orderBy("_bkey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    placed = (
        rows.join(F.broadcast(bounds), "_bucket")
        .withColumn(
            "stream_start",
            F.col("_boff") + F.coalesce(F.sum("n_tokens").over(ws), F.lit(0)),
        )
        .withColumn(
            "first_ctx", F.floor(F.col("stream_start") / ctx_len)
        )
        .withColumn(
            "last_ctx",
            F.floor(
                (
                    F.col("stream_start")
                    + F.greatest(F.col("n_tokens") - 1, F.lit(0))
                )
                / ctx_len
            ),
        )
        .withColumn(
            "n_ctx", (F.col("last_ctx") - F.col("first_ctx") + 1).cast("int")
        )
    )
    return placed.select(
        id_col, "n_tokens", "stream_start", "first_ctx", "last_ctx", "n_ctx"
    )


def pack_bins_nfd(
    df: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
    rows_per_shard: int = 4_000_000,
) -> DataFrame:
    """No-split bin packing: assign each document to a bin of capacity
    ``ctx_len`` tokens via next-fit-decreasing within deterministic
    shards (``id % n_shards``).

    Within a shard, documents are taken in (tokens desc, id asc) order
    and appended to the current bin while they fit; a document that
    does not fit opens a new bin. A document longer than ``ctx_len``
    gets a bin of its own (an overflow bin — callers truncate or
    concat-chunk those separately). The scan is sequential per shard
    but shards run in parallel; determinism makes the result
    rerun-stable and exactly replayable by a recursive-CTE oracle.

    Sharding / memory envelope: each shard is ONE ``applyInPandas``
    group holding only ``(id, n_tokens)`` longs — roughly 40-50 bytes
    per row as a pandas frame, so the default ``rows_per_shard`` of 4M
    bounds a shard's task memory near ~200 MB regardless of corpus
    size. ``n_shards=None`` (the default) derives the shard count from
    one cheap column-pruned count: ``max(32, ceil(rows /
    rows_per_shard))`` — a 1e10-doc corpus gets ~2500 shards instead
    of 32 shards of 3e8 rows each. Pass an explicit ``n_shards`` for a
    pinned, replayable shard layout (the oracle twin does). More
    shards = more parallelism but slightly worse packing (bins never
    span shards); the quality loss is O(n_shards) bins total.

    Returns ``(id, n_tokens, shard, bin)`` — ``bin`` is 0-based within
    the shard; ``(shard, bin)`` is the global bin key.
    """
    if n_shards is None:
        import math

        n_rows = df.select(id_col).count()
        n_shards = max(32, math.ceil(n_rows / max(1, rows_per_shard)))
    rows = df.select(
        F.col(id_col).cast("long").alias("_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.col("_id"), F.lit(n_shards)).cast("int"))

    out_schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("shard", IntegerType()),
            StructField("bin", IntegerType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "_id"], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []
        cur, fill = 0, 0
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            if first:
                first = False
                fill = t
            elif fill + t <= ctx_len:
                fill += t
            else:
                cur += 1
                fill = t
            bins.append(cur)
        return pdf.assign(bin=pd.array(bins, dtype="int32"))

    packed = rows.groupBy("shard").applyInPandas(pack, schema=out_schema)
    return packed.select(
        F.col("_id").alias(id_col), "n_tokens", "shard", "bin"
    )
