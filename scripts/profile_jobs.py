"""Driver-job profiler (r14) — guide §5 "the driver should do almost no
data work" / VERDICT r13 ask #5 (store walls are driver-bound: scaling
ratios ~1 at sf0.1, so their cost is job COUNT, not compute).

Runs named declared queries (or the pipeline walls from bench.py) in a
session with the Spark event log enabled, then parses the log into a
per-phase job census: jobs, tasks, wall seconds, top job descriptions.

Usage::

    python scripts/profile_jobs.py corpus_chain_rebase ann_index_reindex \
        [--sf DIR] [--out /tmp/prof.json]

Pipeline walls accepted by name: co2_pipeline_e2e, co2_pipeline_incremental,
co2_pipeline_streaming, crawl_pipeline_e2e.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_eventlog(log_dir: str) -> list[dict]:
    evs = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for fn in files:
            if fn.startswith(("local-", "events_", "app-")):
                paths.append(os.path.join(root, fn))
    for p in paths:
        opener = open
        if p.endswith(".zstd") or p.endswith(".zst"):
            continue  # compression off in our session
        with opener(p) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") in (
                    "SparkListenerJobStart",
                    "SparkListenerJobEnd",
                    "SparkListenerStageCompleted",
                ):
                    evs.append(e)
    return evs


def census(evs: list[dict], t0_ms: float, t1_ms: float) -> dict:
    jobs = {}
    stage_tasks = {}
    for e in evs:
        if e["Event"] == "SparkListenerJobStart" and t0_ms <= e["Submission Time"] <= t1_ms:
            props = e.get("Properties") or {}
            stage_names = [s.get("Stage Name", "") for s in e.get("Stage Infos", [])]
            jobs[e["Job ID"]] = {
                "t0": e["Submission Time"],
                "callsite": stage_names[-1] if stage_names else "",
                "desc": props.get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                "n_tasks_planned": sum(
                    s.get("Number of Tasks", 0) for s in e.get("Stage Infos", [])
                ),
            }
        elif e["Event"] == "SparkListenerJobEnd" and e["Job ID"] in jobs:
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
        elif e["Event"] == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stage_tasks[si["Stage ID"]] = si.get("Number of Tasks", 0)
    n_jobs = len(jobs)
    total_tasks = sum(
        sum(stage_tasks.get(s, 0) for s in j["stages"]) for j in jobs.values()
    )
    by_desc = defaultdict(lambda: [0, 0.0])
    for j in jobs.values():
        d = (j["desc"] or j.get("callsite") or "<none>")[:110]
        by_desc[d][0] += 1
        if "t1" in j:
            by_desc[d][1] += (j["t1"] - j["t0"]) / 1000.0
    top = sorted(by_desc.items(), key=lambda kv: -kv[1][1])[:25]
    return {
        "n_jobs": n_jobs,
        "n_tasks": total_tasks,
        "job_seconds_sum": round(
            sum((j.get("t1", j["t0"]) - j["t0"]) / 1000.0 for j in jobs.values()), 2
        ),
        "top_descs": [
            {"desc": d, "n": n, "sec": round(s, 2)} for d, (n, s) in top
        ],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    log_dir = tempfile.mkdtemp(prefix="spark_evlog_")
    from incremental_datapipeline_using_snowflake_spark.session import get_session

    spark = get_session(
        "profile_jobs",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    import bench
    from incremental_datapipeline_using_snowflake_spark.queries import (
        all_queries,
        memo_evict_new,
        memo_snapshot,
    )

    walls = {
        "co2_pipeline_e2e": bench.run_pipeline_bench,
        "co2_pipeline_incremental": bench.run_pipeline_incremental_bench,
        "co2_pipeline_streaming": bench.run_pipeline_streaming_bench,
        "crawl_pipeline_e2e": bench.run_crawl_pipeline_bench,
    }
    qs = all_queries()
    # bench-equivalent warmup
    for warm in ("q6_forecast_revenue", "region_revenue", "pandas_udf_normalize",
                 "window_family", "text_profile"):
        try:
            qs[warm][0](spark, args.sf).count()
        except Exception:
            pass
    spark.catalog.clearCache()

    results = {}
    for name in args.names:
        snap = memo_snapshot()
        spark.sparkContext.setJobDescription(None)
        t0 = time.time()
        if name in walls:
            walls[name](spark)
        else:
            fn, _sql = qs[name]
            df = fn(spark, args.sf)
            n = df.count()
            _ = df.limit(1).collect()
        t1 = time.time()
        spark.catalog.clearCache()
        memo_evict_new(snap)
        results[name] = {"wall_s": round(t1 - t0, 3), "_t0": t0 * 1000, "_t1": t1 * 1000}

    spark.stop()  # flush event log
    time.sleep(1)
    evs = parse_eventlog(log_dir)
    for name, r in results.items():
        r.update(census(evs, r.pop("_t0"), r.pop("_t1")))
    out = json.dumps(results, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
