#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named registry query:
  * writes ``plans/<round>/<name>_<tag>.txt`` — the ``explain("formatted")``
    physical plan of the DataFrame the query returns at the target SF;
  * times N noop-sink runs (same methodology as bench.py);
  * parses the Spark event log it just wrote and prints the top stages
    by executor-summed task time, with stage names, shuffle bytes and
    Python/JVM breakdown — the "where does the time actually go"
    evidence the guide's empirical loop needs.

Usage: python tools/profile_query.py <tag> <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS, KDI_PROFILE_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/kdi-events"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs_n = int(os.environ.get("KDI_PROFILE_RUNS", "3"))
    os.makedirs(EVDIR, exist_ok=True)
    os.makedirs(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", os.environ.get("KDI_PLANS_ROUND", "r13")),
        exist_ok=True,
    )

    from kafka_delta_ingest_spark.session import get_spark

    spark = get_spark(
        "kdi-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Same warm-up as bench.py: JVM + python worker pool + plan codegen.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "double")
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 4, numPartitions=n_workers).select(
        _warm(col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    warm_sf = "/root/testdata/sf0.001"
    results = {}
    windows = {}
    for name in names:
        fn = qs[name]
        fn(spark, warm_sf).write.mode("overwrite").format("noop").save()
        df = fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        pf = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", os.environ.get("KDI_PLANS_ROUND", "r13"), f"{name}_{tag}.txt",
        )
        with open(pf, "w") as f:
            f.write(plan)
        runs = []
        t_open = time.time() * 1000
        for i in range(runs_n):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        t_close = time.time() * 1000
        windows[name] = (t_open, t_close)
        results[name] = runs
        print(f"TIMES {name}: runs={runs} min={min(runs)}", flush=True)

    spark.stop()
    time.sleep(1.0)

    # ---- parse the event log: stage durations within each query window
    import glob as _glob

    evfiles = [os.path.join(EVDIR, app_id)]
    if not os.path.exists(evfiles[0]):
        evfiles = sorted(
            _glob.glob(os.path.join(EVDIR, f"*{app_id}*", "events_*"))
        ) or sorted(_glob.glob(os.path.join(EVDIR, f"*{app_id}*")))
    stages = {}       # (stageId, attempt) -> dict
    job_desc = {}     # jobId -> description
    stage_job = {}    # stageId -> jobId
    task_sums = {}    # (stageId, attempt) -> accumulated task metrics
    import itertools

    with open(os.devnull) as _nul:
        lines = itertools.chain.from_iterable(
            open(p) for p in evfiles if os.path.isfile(p)
        )
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[key] = {
                    "name": si.get("Stage Name", ""),
                    "wall_ms": (com - sub) if sub and com else 0,
                    "sub": sub,
                    "ntasks": si.get("Number of Tasks", 0),
                }
            elif e == "SparkListenerTaskEnd":
                si = ev.get("Stage ID")
                key = (si, ev.get("Stage Attempt ID"))
                tm = ev.get("Task Metrics") or {}
                agg = task_sums.setdefault(
                    key,
                    {"run_ms": 0, "cpu_ms": 0, "sh_read_b": 0,
                     "sh_write_b": 0, "fetch_ms": 0, "input_b": 0,
                     "spill_b": 0, "dur_max": 0, "dur_sum": 0, "n": 0,
                     "gc_ms": 0, "deser_ms": 0},
                )
                agg["run_ms"] += tm.get("Executor Run Time", 0)
                agg["cpu_ms"] += (tm.get("Executor CPU Time", 0)) // 1_000_000
                agg["gc_ms"] += tm.get("JVM GC Time", 0)
                agg["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["sh_read_b"] += (
                    sr.get("Remote Bytes Read", 0)
                    + sr.get("Local Bytes Read", 0)
                )
                agg["fetch_ms"] += sr.get("Fetch Wait Time", 0)
                agg["sh_write_b"] += sw.get("Shuffle Bytes Written", 0)
                agg["input_b"] += (tm.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                )
                agg["spill_b"] += tm.get("Disk Bytes Spilled", 0)
                ti = ev.get("Task Info") or {}
                dur = (ti.get("Finish Time", 0) or 0) - (
                    ti.get("Launch Time", 0) or 0
                )
                agg["dur_max"] = max(agg["dur_max"], dur)
                agg["dur_sum"] += max(dur, 0)
                agg["n"] += 1

    for name in names:
        t_open, t_close = windows[name]
        per_desc: dict[str, list] = {}
        for key, st in stages.items():
            if not st["sub"] or not (t_open <= st["sub"] <= t_close):
                continue
            jid = stage_job.get(key[0])
            desc = job_desc.get(jid, "")
            if not desc.startswith(f"{name}#"):
                continue
            per_desc.setdefault(desc, []).append((key, st))
        print(f"\n===== {name} (runs {results[name]}) =====")
        # report the run with the minimum wall time: cleanest signal
        best = None
        for desc, ss in sorted(per_desc.items()):
            wall = sum(st["wall_ms"] for _, st in ss)
            if best is None or wall < best[1]:
                best = (desc, wall, ss)
        if not best:
            print("  (no stages captured)")
            continue
        desc, wall, ss = best
        print(f"  run={desc} stage-wall-sum={wall}ms nstages={len(ss)}")
        ss.sort(key=lambda kv: -kv[1]["wall_ms"])
        for key, st in ss[:14]:
            tm = task_sums.get(key, {})
            print(
                f"  stage {key[0]:>5} wall={st['wall_ms']:>6}ms "
                f"tasks={st['ntasks']:>3} run={tm.get('run_ms',0):>7}ms "
                f"cpu={tm.get('cpu_ms',0):>7}ms "
                f"gc={tm.get('gc_ms',0):>5}ms "
                f"deser={tm.get('deser_ms',0):>5}ms "
                f"maxtask={tm.get('dur_max',0):>6}ms "
                f"in={tm.get('input_b',0)>>20}MB "
                f"shR={tm.get('sh_read_b',0)>>20}MB "
                f"shW={tm.get('sh_write_b',0)>>20}MB "
                f"fetch={tm.get('fetch_ms',0)}ms "
                f"spill={tm.get('spill_b',0)>>20}MB  "
                f"{st['name'][:70]}"
            )


if __name__ == "__main__":
    main()
