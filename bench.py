#!/usr/bin/env python
"""Headline-query benchmark.

Runs the flagship queries from ``__spark_entry__`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is forced end-to-end with a noop sink (full computation, no
collect-to-driver cost, no output I/O skew). Per query the reported
number is the MEDIAN of three timed runs after a small-SF warm pass —
steady-state throughput, the quantity that scales to a long-running
cluster, not first-run compiler/page-cache latency. BENCH_DETAIL.json
additionally records every run and a per-query ``noise`` ratio
(max/median), so external box load during a capture is visible in the
artifact instead of masquerading as a plan regression (r6: 146.0s vs
157.2s on identical code, 21 queries >1.3x, was single-shot signal).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from pyspark.sql.functions import col
from kafka_delta_ingest_spark.session import get_spark

HEADLINE = [
    "ingest_message_path",
    "ingest_dlq_split",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "win_top_orders_per_customer",
    "agg_rollup_orders",
    "events_sessionize",
    "events_tumbling_counts",
    "text_profile",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "events_asof_join",
    "events_range_join",
    "events_interval_join",
    "q9_nation_year_profit",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q2_min_cost_supplier",
    "stream_offset_dedup",
    "embedding_neardup_lsh",
    "multimodal_features",
    "text_repetition_profile",
    "win_moving_avg_range",
    "agg_approx_distinct",
    "dedup_clusters_cc",
    "sim_pq_topk",
    "pii_scrub",
    "decontam_overlap_report",
    "dedup_incremental_admit",
    "text_shared_passages",
    "pipeline_pretrain_curation",
    "text_lm_perplexity",
    "text_dsir_weights",
    "events_funnel",
    "sim_semdedup",
    "pipeline_fuzzy_curation",
    "text_chunk_sliding",
    "text_bpe_pair_census",
    "corpus_card",
    "text_gopher_quality",
    "sim_ivfpq_topk",
    "search_hybrid_rrf",
    "multimodal_jpeg_roundtrip",
    "multimodal_wav_roundtrip",
    "text_quality_classifier",
    "text_remove_boilerplate",
    "pipeline_rag_retrieval",
    "split_ccnet_buckets",
    "split_temperature_mix",
    "dedup_winnow_pairs",
    "dedup_incremental_indexed",
    "multimodal_png_roundtrip",
    "pack_concat_chunk",
    "pack_bins_nfd",
    "text_c4_line_filter",
    "corpus_zipf_fit",
    "dedup_substring_spans",
    "dedup_substring_rewrite",
    "multimodal_adpcm_roundtrip",
    "multimodal_mjpeg_roundtrip",
    "multimodal_g711_roundtrip",
    "pipeline_web_extraction",
    "web_url_normalize",
    "text_trigram_backoff",
    "multimodal_gif_roundtrip",
    "iceberg_read_snapshot",
    "delta_read_standard",
    "multimodal_flac_roundtrip",
    "web_robots_filter",
    "pipeline_pdf_extraction",
    "ingest_compressed_path",
    "multimodal_apng_roundtrip",
    "hudi_read_snapshot",
    "text_bpe_train_probe",
    "ingest_orc_path",
    "ingest_csv_path",
    "sink_zorder_cluster",
    "text_unigram_train_probe",
    "dedup_paragraphs_global",
    "text_lang_id",
    "text_unicode_nfc",
    "text_split_sentences",
    "sink_delta_standard_roundtrip",
    "ingest_delta_standard",
    "delta_read_dv",
    "delta_read_cdf",
    "join_bucketed_colocated",
    "ingest_iceberg",
    "sink_iceberg_roundtrip",
    "hudi_read_mor",
    "hudi_read_incremental",
    # r8: mid-stream schema evolution on the standard log;
    # Hudi as a write destination
    "ingest_delta_standard_evolve",
    "ingest_hudi",
    "multimodal_tiff_roundtrip",
    "sink_delta_standard_zorder",
    # r9: Iceberg incremental scan + maintenance trio completion;
    # UPDATE/MERGE on the standard log; Hudi CoW upsert. The three
    # un-memoized ops (expire/clean/upsert) time the FULL write e2e
    # per repeat — they are write operations; that is their cost.
    "iceberg_read_incremental",
    "iceberg_expire_snapshots",
    "iceberg_upsert",
    "iceberg_delete_where",
    "iceberg_data_skipping",
    "ingest_iceberg_evolve",
    "hudi_clean",
    "sink_delta_standard_update",
    "sink_delta_standard_merge",
    "ingest_delta_standard_cdc",
    "sink_delta_standard_constraints",
    "delta_read_time_travel",
    "hudi_upsert_cow",
    "hudi_upsert_mor",
    "ingest_hudi_mor",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("kdi-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # Warm the JVM/codegen paths once so per-query times measure the
    # steady state, not first-job startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["ingest_message_path"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    # Pre-fork the Arrow/Python worker pool (one worker per core; they are
    # reused across jobs) so pandas-UDF queries don't pay 32× interpreter
    # + numpy import cost inside their timed window.
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "double")
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 4, numPartitions=n_workers).select(
        _warm(col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()
    # Warm each headline plan once at the smallest SF: whole-stage
    # codegen classes are cached by generated source, so this compiles
    # (and JITs) the exact code the timed run executes — the timed
    # window then measures steady-state throughput at the target SF,
    # not first-run compiler latency. Wide-agg plans (64-column MinHash
    # signatures) otherwise pay ~4s of compile on their first job.
    warm_sf = "/root/testdata/sf0.001"
    for name in HEADLINE:
        qs[name](spark, warm_sf).write.mode("overwrite").format("noop").save()
    # Table-format certification fixtures memoize per (process,
    # sf_dir): pre-build them at the TARGET sf too, or their first
    # timed repeat measures a one-time fixture build (a 5-7s outlier
    # that would read as a 40-60x noise ratio, poisoning the load
    # telemetry). The full write-path e2e still executes — once, here.
    for name in [
        "ingest_delta_standard", "ingest_delta_standard_evolve",
        "ingest_iceberg", "ingest_hudi",
        "sink_delta_standard_roundtrip", "sink_iceberg_roundtrip",
        "sink_delta_standard_zorder",
        "sink_delta_standard_update", "sink_delta_standard_merge",
        "ingest_iceberg_evolve", "ingest_delta_standard_cdc",
        "sink_delta_standard_constraints", "delta_read_time_travel",
        "ingest_hudi_mor",
        # r13 (r12 verdict item 2): these two queries memoize their
        # fixture tables per (process, sf_dir) inside the query body;
        # pre-building them HERE declares the timing boundary in the
        # harness like every other table-format fixture above — the
        # timed repeats measure the lazy read under test, never a
        # one-time fixture build.
        "delta_read_dv", "iceberg_data_skipping",
    ]:
        qs[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    times: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}
    noise: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        med = sorted(runs)[1]
        times[name] = round(med, 3)
        runs_detail[name] = [round(r, 3) for r in runs]
        noise[name] = round(max(runs) / med, 3) if med > 0 else 1.0

    total = round(sum(times.values()), 3)
    # min-of-runs headline (r11 verdict item 5): the median-based total
    # still amplifies single-run load bursts (a 22.5s burst inside
    # [12.6, 22.5, 7.3] drags the median to 12.6 when the plan runs in
    # 7.3). The min over 3 warm repeats is the best available estimate
    # of the PLAN's cost on this box; cross-round claims cite this.
    total_min = round(
        sum(min(v) for v in runs_detail.values()), 3
    )
    # noise summary: how load-disturbed this capture was. A clean box
    # shows max_noise near 1.0-1.2; >1.5 means at least one query's
    # worst repeat ran 50% over its median — treat cross-round deltas
    # of that magnitude as environmental.
    max_noise = max(noise.values())
    med_noise = sorted(noise.values())[len(noise) // 2]
    # Like-for-like subtotal over the queries that were already in the
    # round-2 headline set: the grand total grows as operators land
    # (r2: 35 queries, now 50), so cross-round comparisons should use
    # this stable-key subtotal, not the grand total.
    r2_keys = [
        "ingest_message_path", "ingest_dlq_split", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q10_returned_items", "win_top_orders_per_customer",
        "agg_rollup_orders", "events_sessionize", "events_tumbling_counts",
        "text_profile", "dedup_exact", "dedup_minhash_pairs",
        "dedup_simhash_pairs", "dedup_ngram_jaccard", "sim_cosine_topk",
        "sim_ivf_topk", "sim_lsh_topk", "events_asof_join",
        "events_range_join", "events_interval_join", "q9_nation_year_profit",
        "q18_large_orders", "q19_disjunctive_revenue", "q7_volume_shipping",
        "q13_customer_distribution", "q17_small_quantity_revenue",
        "q2_min_cost_supplier", "stream_offset_dedup",
        "embedding_neardup_lsh", "multimodal_features",
        "text_repetition_profile", "win_moving_avg_range",
        "agg_approx_distinct", "dedup_clusters_cc",
    ]
    shared_r2 = round(sum(times[k] for k in r2_keys if k in times), 3)
    # Load self-description (r10 verdict item 5): the r2 stable-key
    # subtotal measured on a LOAD-COMPARABLE capture last round is the
    # cross-round normalizer — these queries' code hasn't changed since
    # r2, so r2sub_vs_prev >> 1.0 means THIS capture ran under external
    # box load and its per-query deltas are environmental, not plan
    # regressions (the r10 driver capture read +70% on this control).
    # Update the constant each round from the capture the round keeps.
    # r13 kept capture: 26.6 — NOTE this is NOT comparable to the r12
    # value (45.5) as pure load telemetry: r13's session-wide fixes
    # (the Python-worker zipimport patch, ingest widening, minhash
    # signature materialization) genuinely sped many r2-subtotal
    # queries, so the control was re-based this round. From r14 on,
    # >1.3 vs THIS constant again reads as environmental load.
    # (History: r11 kept 45.5, r10 kept 47.6, r9 driver 46.8.)
    r2sub_prev = 26.6
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "value_min": total_min,
        "unit": "sec",
        "queries": times,
        "runs": runs_detail,
        "min_of_runs": {
            k: round(min(v), 3) for k, v in runs_detail.items()
        },
        "noise": noise,
        "max_noise": round(max_noise, 3),
        "median_noise": round(med_noise, 3),
        "sf": sf,
        "n_queries": len(times),
        "shared_r2_subtotal": shared_r2,
        "r2sub_prev_round": r2sub_prev,
        "r2sub_vs_prev": round(shared_r2 / r2sub_prev, 3),
        "load_note": (
            "r2sub_vs_prev is the capture's load state vs the prior "
            "round's kept capture on identical never-touched plans; "
            ">1.3 means environmental load dominates cross-round "
            "per-query deltas — compare min_of_runs and re-capture "
            "before reading any delta as a regression"
        ),
    }
    # Full per-query map: printed on an EARLIER stdout line and persisted
    # to a committed file.  The driver captures only the last ~2000 chars
    # of stdout and parses the FINAL line — at 69 queries the full map no
    # longer fits (BENCH_r05.json recorded parsed:null), so the final
    # line must be a compact summary that always fits the tail capture.
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "value_min": total_min,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(times),
                "shared_r2_subtotal": shared_r2,
                "max_noise": round(max_noise, 3),
                "median_noise": round(med_noise, 3),
                "queries_file": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
