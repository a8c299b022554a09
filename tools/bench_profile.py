#!/usr/bin/env python
"""Per-stage profile of one or more registered queries (guide §1/§7).

Runs each named query exactly like bench.py (warm-up + timed run,
``count()`` action) in a session with the Spark event log enabled, then
parses the event log into per-stage rows: wall, executor run/CPU time,
GC, shuffle read/write bytes, task count, and the first line of the
stage's callsite. This substitutes for the (disabled) UI: it answers
"which stage burns the CPU / moves the bytes" without guessing.

    python tools/bench_profile.py dedup_components incremental_jaccard_pairs

Prints one block per query, stages sorted by executor CPU descending.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1, help="timed runs after warm-up")
    ap.add_argument("--top", type=int, default=12, help="stages to print per query")
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="cdc_eventlog_")

    from pyspark.sql import SparkSession

    from cdc_algorithms_spark.queries import SPARK_QUERIES

    # Same configs as session.get_spark (kept in sync by reading its
    # builder is not possible post-hoc; this tool replicates the keys)
    # plus the event log.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder.appName("cdc-bench-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # the bench's preloaded worker daemon (session.get_spark) — without
        # it profiles include worker import/zip-scan overhead the bench no
        # longer pays (r11 ADVICE)
        .config(
            "spark.python.daemon.module",
            "cdc_algorithms_spark.daemon_preload",
        )
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sc = spark.sparkContext
    windows: dict[str, tuple[float, float, float]] = {}
    for name in args.names:
        fn = SPARK_QUERIES[name]
        fn(spark, args.sf_dir).count()  # warm-up (JIT, index caches)
        t0 = time.time()
        sc.setJobDescription(f"PROFILE:{name}")
        best = float("inf")
        for _ in range(args.runs):
            r0 = time.time()
            fn(spark, args.sf_dir).count()
            best = min(best, time.time() - r0)
        sc.setJobDescription(None)
        windows[name] = (t0, time.time(), best)
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log ------------------------------------------
    # Spark 4 default: rolling layout eventlog_v2_<appid>/events_* files
    paths: list[str] = []
    for f in sorted(os.listdir(evdir)):
        full = os.path.join(evdir, f)
        if f.startswith(app_id):
            paths.append(full)
        elif f == f"eventlog_v2_{app_id}" and os.path.isdir(full):
            paths.extend(
                os.path.join(full, g)
                for g in sorted(os.listdir(full))
                if g.startswith("events_")
            )
    if not paths:
        print(f"no event log found in {evdir}", file=sys.stderr)
        sys.exit(1)

    # job id -> (description, submit time); stage id -> job id
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    task_metrics: dict[int, dict] = {}

    def _lines():
        for p in paths:
            with open(p) as f:
                yield from f

    for line in _lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue  # truncated tail line of a live/rolled log
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            job_desc[jid] = desc
            for sid in ev.get("Stage IDs", []):
                stage_job[sid] = jid
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = {
                "name": si.get("Stage Name", ""),
                "ntasks": si.get("Number of Tasks", 0),
                "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                / 1000.0,
            }
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            agg = task_metrics.setdefault(
                sid,
                {"run": 0.0, "cpu": 0.0, "gc": 0.0, "sr": 0, "sw": 0,
                 "input": 0, "pyser": 0.0},
            )
            agg["run"] += tm.get("Executor Run Time", 0) / 1000.0
            agg["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
            agg["gc"] += tm.get("JVM GC Time", 0) / 1000.0
            agg["sr"] += (tm.get("Shuffle Read Metrics") or {}).get(
                "Total Bytes Read",
                (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
                + (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0),
            )
            agg["sw"] += (tm.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            agg["input"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)

    for name in args.names:
        print(f"\n=== {name}  (best timed wall {windows[name][2]:.2f}s) ===")
        rows = []
        for sid, st in stages.items():
            jid = stage_job.get(sid)
            if job_desc.get(jid, "") != f"PROFILE:{name}":
                continue
            m = task_metrics.get(sid, {})
            rows.append((sid, st, m))
        rows.sort(key=lambda r: -(r[2].get("cpu", 0.0)))
        tot_cpu = sum(m.get("cpu", 0.0) for _, _, m in rows)
        tot_run = sum(m.get("run", 0.0) for _, _, m in rows)
        njobs = sum(
            1 for d in job_desc.values() if d == f"PROFILE:{name}"
        )
        print(f"jobs={njobs} stages={len(rows)} "
              f"total executorRun={tot_run:.1f}s cpu={tot_cpu:.1f}s")
        for sid, st, m in rows[: args.top]:
            print(
                f"  s{sid:<5} tasks={st['ntasks']:<4} wall={st['wall']:.2f}s "
                f"run={m.get('run', 0):.2f}s cpu={m.get('cpu', 0):.2f}s "
                f"gc={m.get('gc', 0):.2f}s in={m.get('input', 0) / 1e6:.1f}MB "
                f"sr={m.get('sr', 0) / 1e6:.2f}MB sw={m.get('sw', 0) / 1e6:.2f}MB "
                f" {st['name'][:70]}"
            )


if __name__ == "__main__":
    main()
