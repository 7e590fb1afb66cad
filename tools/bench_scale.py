#!/usr/bin/env python
"""One-off sf0.1 → sf1 scaling spot-check (VERDICT r6 item #7).

Builds a 10x `documents` table from the driver's sf0.1 parquet —
10 replicas, each with doc_ids shifted into a disjoint range and text
CAESAR-SHIFTED by the replica index. The shift preserves word lengths,
whitespace structure, and the intra-replica duplicate/shared-passage
profile (the skew the dedup operators exist for) while making gram
hashes DISJOINT across replicas — so the honest expectation for a
linear-in-corpus operator is ~10x runtime, and a quadratic pair
blowup (what naive 10x copy-paste replication would manufacture:
every doc near-dups its 9 clones, 45x pair work) cannot masquerade
as a scaling cliff that isn't in the plan.

Runs the 5 most expensive headline queries at sf0.1 and at the
scaled dir (min of N repeats each, post warm-up) and writes
BENCH_SCALE.json with per-query ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pipeline_pretrain_curation",
    "dedup_substring_rewrite",
    "dedup_substring_spans",
    "pipeline_fuzzy_curation",
    "text_bpe_train_probe",
    # r8: the table-format ingest e2es — their O(new-files) commit
    # claims deserve a 10x datapoint. Their fixtures memoize per
    # (sf_dir, process); the memo is CLEARED before every timed run so
    # each repeat measures the full write+read e2e.
    "ingest_delta_standard",
    "ingest_iceberg",
    # r9 (r8 verdict task 7): the pair-mining family — the only
    # quadratic worst cases in the repo. Banding/bucketing must keep
    # them sub-linear-in-pairs at 10x data; embeddings replicate with
    # per-replica dimension PERMUTATIONS (norms and intra-replica
    # geometry preserved, cross-replica collisions not manufactured).
    "dedup_minhash_pairs",
    "embedding_neardup_lsh",
    "sim_ivfpq_topk",
    # r9 DML/upsert paths: their write cost must scale with the
    # TOUCHED set + source, not the table. The scaled dir carries
    # FK-preserving 10x orders/customer replicas; the memoized
    # fixtures are cleared per repeat (full write e2e measured).
    "sink_delta_standard_merge",
    "ingest_delta_standard_cdc",
    "hudi_upsert_cow",
    "hudi_upsert_mor",
    "iceberg_upsert",
    # r10 (r9 verdict task 7): the two most expensive untouched
    # queries with no 10x datapoint — simhash banded Hamming pair
    # mining and winnowing-fingerprint shared-passage mining. Both
    # run on the caesar-shifted documents replicas (gram/fingerprint
    # hashes disjoint across replicas), so sub-linear-in-pairs
    # banding is what a <10x ratio certifies.
    "dedup_simhash_pairs",
    "text_shared_passages",
    # r11 (r10 verdict task 6): the two most expensive remaining
    # queries with no 10x datapoint — the unigram EM trainer (per-job-
    # overhead-dominated planted corpus whose size tracks doc count)
    # and incremental-dedup admit (one gram-equi-join pair pass over
    # corpus+batch union).
    "text_unigram_train_probe",
    "dedup_incremental_admit",
    # r12 (r11 verdict task 6): the conversion/bootstrap bridges claim
    # O(live files) metadata + O(rows) key reads; the two with
    # nontrivial executor stages get 10x datapoints — the metadata-only
    # Delta->Iceberg conversion (per-file footer stats job) and the
    # Delta->Hudi METADATA_ONLY bootstrap (per-file key-column reads +
    # skeleton writes). Fixtures memoize; cleared per repeat like the
    # other table-format e2es.
    "table_convert_delta_iceberg",
    "table_bootstrap_delta_hudi",
]

# queries whose table-format fixtures memoize per (process, sf_dir):
# cleared before every timed run so each repeat measures the full
# write+read e2e, not a cached read-back
INGEST_QUERIES = {
    "ingest_delta_standard", "ingest_iceberg",
    "sink_delta_standard_merge", "ingest_delta_standard_cdc",
    "table_convert_delta_iceberg", "table_bootstrap_delta_hudi",
}

REPLICAS = 10
REPEATS = 3  # median-of-3 (r7 verdict: min-of-2 hid a 2x spread)


def build_scaled_documents(src_dir: str, out_dir: str) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    max_id = pc.max(t["doc_id"]).as_py() + 1
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    chunks = []
    for k in range(REPLICAS):
        ids = pc.add(t["doc_id"], k * max_id)
        if k == 0:
            texts = t["text"]
        else:
            trans = str.maketrans(
                lower + upper,
                lower[k:] + lower[:k] + upper[k:] + upper[:k],
            )
            texts = pa.array(
                [
                    None if v is None else v.translate(trans)
                    for v in t["text"].to_pylist()
                ],
                type=pa.string(),
            )
        chunks.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": t["n_chars"],
                }
            )
        )
    pq.write_table(pa.concat_tables(chunks), out)
    return out


def build_scaled_events(src_dir: str, out_dir: str) -> str:
    """10x `events`: replicas with event_ids shifted into disjoint
    ranges (offsets stay unique and monotonic per kafka partition);
    user_id/ts/props untouched so the partition fan-out and payload
    profile match the source."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out):
        return out
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    max_id = pc.max(t["event_id"]).as_py() + 1
    chunks = []
    for k in range(REPLICAS):
        cols = {c: t[c] for c in t.column_names}
        cols["event_id"] = pc.add(t["event_id"], k * max_id)
        chunks.append(pa.table(cols))
    pq.write_table(pa.concat_tables(chunks), out)
    return out


def build_scaled_orders_customer(src_dir: str, out_dir: str) -> None:
    """10x ``orders``/``customer``: replicas with o_orderkey /
    c_custkey / o_custkey shifted into disjoint ranges IN LOCKSTEP, so
    every replica preserves the orders→customer FK profile (the
    match-rate the DML/upsert paths' touched-set size depends on)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    o_out = os.path.join(out_dir, "orders.parquet")
    c_out = os.path.join(out_dir, "customer.parquet")
    if os.path.exists(o_out) and os.path.exists(c_out):
        return
    o = pq.read_table(os.path.join(src_dir, "orders.parquet"))
    c = pq.read_table(os.path.join(src_dir, "customer.parquet"))
    max_ok = pc.max(o["o_orderkey"]).as_py() + 1
    max_ck = pc.max(c["c_custkey"]).as_py() + 1
    o_chunks, c_chunks = [], []
    for k in range(REPLICAS):
        oc = {col: o[col] for col in o.column_names}
        oc["o_orderkey"] = pc.add(o["o_orderkey"], k * max_ok)
        oc["o_custkey"] = pc.add(o["o_custkey"], k * max_ck)
        o_chunks.append(pa.table(oc))
        cc = {col: c[col] for col in c.column_names}
        cc["c_custkey"] = pc.add(c["c_custkey"], k * max_ck)
        c_chunks.append(pa.table(cc))
    pq.write_table(pa.concat_tables(o_chunks), o_out)
    pq.write_table(pa.concat_tables(c_chunks), c_out)


def build_scaled_embeddings(src_dir: str, out_dir: str) -> str:
    """10x ``embeddings``: replicas with vec_ids shifted into disjoint
    ranges and DIMENSIONS PERMUTED per replica (seeded, deterministic).
    Permutation preserves each vector's norm and the intra-replica
    neighbor structure while decorrelating replicas — the honest 10x
    for LSH/IVF ops (10 identical copies would flood every bucket with
    manufactured 45x near-dup pairs)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return out
    t = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    max_id = pc.max(t["vec_id"]).as_py() + 1
    flat = np.asarray(
        t["embedding"].combine_chunks().flatten(), dtype=np.float32
    )
    n = t.num_rows
    dim = len(flat) // n
    mat = flat.reshape(n, dim)
    chunks = []
    for k in range(REPLICAS):
        ids = pc.add(t["vec_id"], k * max_id)
        if k == 0:
            emb = t["embedding"]
        else:
            perm = np.random.RandomState(k).permutation(dim)
            emb = pa.FixedSizeListArray.from_arrays(
                pa.array(mat[:, perm].reshape(-1)), dim
            ).cast(pa.list_(pa.float32()))
        chunks.append(
            pa.table(
                {"vec_id": ids, "embedding": emb, "label": t["label"]}
            )
        )
    pq.write_table(pa.concat_tables(chunks), out)
    return out


def main() -> None:
    import __spark_entry__ as E
    from kafka_delta_ingest_spark.session import get_spark

    import statistics

    # Optional targeted re-capture: `bench_scale.py q1 q2 ...` runs only
    # the named queries and MERGES their rows into the existing
    # BENCH_SCALE.json (used after a plan fix to refresh just the
    # affected family without re-timing the whole battery).
    selected = [q for q in sys.argv[1:] if q in QUERIES]
    if sys.argv[1:] and not selected:
        raise SystemExit(f"unknown queries {sys.argv[1:]}; known: {QUERIES}")
    queries = selected or QUERIES

    sf01 = "/root/testdata/sf0.1"
    scaled = os.environ.get("KDI_SCALE_DIR", "/tmp/kdi-sf1")
    build_scaled_documents(sf01, scaled)
    build_scaled_events(sf01, scaled)
    build_scaled_embeddings(sf01, scaled)
    build_scaled_orders_customer(sf01, scaled)

    spark = get_spark("kdi-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def run(name, sf_dir):
        if name in INGEST_QUERIES:
            # memoized e2e fixtures: clear so every repeat measures
            # the full write+read path, not a cached read
            E._TBLFMT_FIXTURES.clear()
        qs[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    # warm codegen/worker pools at the smallest SF
    for name in queries:
        run(name, "/root/testdata/sf0.001")

    results = {}
    for name in queries:
        t01, t1 = [], []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run(name, sf01)
            t01.append(time.perf_counter() - t0)
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run(name, scaled)
            t1.append(time.perf_counter() - t0)
        m01, m1 = statistics.median(t01), statistics.median(t1)
        results[name] = {
            "sf0.1_sec": round(m01, 3),
            "sf1_sec": round(m1, 3),
            "ratio": round(m1 / m01, 2),
            "spread_sf0.1": round(max(t01) / min(t01), 2),
            "spread_sf1": round(max(t1) / min(t1), 2),
            "runs_sf0.1": [round(x, 3) for x in t01],
            "runs_sf1": [round(x, 3) for x in t1],
        }
        print(name, results[name])

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALE.json",
    )
    if selected and os.path.exists(path):
        with open(path) as f:
            artifact = json.load(f)
        artifact["queries"].update(results)
    else:
        artifact = {
            "metric": "sf0.1_to_sf1_scaling",
            "aggregation": f"median-of-{REPEATS}",
            "replicas": REPLICAS,
            "construction": "10x replicas, caesar-shifted text, "
                            "disjoint id ranges; events replicated with "
                            "disjoint event_id ranges",
            "queries": results,
        }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
