"""Stage-level profile of the 400/1600-query serving batch (round 4).

Runs ONE pruned BM25 top-10 batch over the shared design-regime index
with Spark event logging enabled, then parses the event log into
per-stage wall / task-time / max-task / shuffle bytes — the tool behind
the serving-side scaling attribution in BASELINE.md (which stage stops
shrinking when executors go 2 -> 8).

    python tools/qprof.py local-cluster[2,4,10240] [n_queries]
    python tools/qprof.py local-cluster[8,4,10240] [n_queries]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/spark_graft_scaling_corpus_500000_v300000"
EVDIR = "/tmp/spark_graft_qprof_events"


def main() -> None:
    sys.path.insert(0, REPO)
    master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[2,4,10240]"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession

    from engine.corpusgen import synth_queries
    from engine.csearch import search_index
    from engine.postings import read_index

    spark = (
        SparkSession.builder.master(master)
        .appName("qprof")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                "256")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    idx = read_index(spark, CORPUS + "_idx")
    search_index(spark, idx, synth_queries(spark, 1, seed=99,
                                           vocab_size=300_000),
                 k=10).collect()  # warmup
    qs = synth_queries(spark, n_queries, vocab_size=300_000)
    t0 = time.time()
    n = len(search_index(spark, idx, qs, k=10).collect())
    wall = time.time() - t0
    spark.stop()

    stages: dict = {}
    logf = sorted(glob.glob(EVDIR + "/*"))[-1]
    if os.path.isdir(logf):  # Spark 4 rolling event-log directory
        parts = sorted(glob.glob(logf + "/events_*"))
    else:
        parts = [logf]
    lines = []
    for p in parts:
        with open(p) as fh:
            lines.extend(fh)
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            # TaskEnd events precede StageCompleted: merge, don't
            # replace, or the accumulated task metrics are wiped
            stages.setdefault(sid, {}).update({
                "name": si["Stage Name"].split("\n")[0][:70],
                "wall": round((comp - sub) / 1e3, 2) if sub and comp
                else None,
                "tasks": si["Number of Tasks"],
            })
        elif ev.get("Event") == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            s = stages.setdefault(sid, {})
            s["task_time"] = s.get("task_time", 0) + m.get(
                "Executor Run Time", 0) / 1e3
            s["max_task"] = max(s.get("max_task", 0),
                                m.get("Executor Run Time", 0) / 1e3)
            sw = (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0)
            sr = (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0) + (
                m.get("Shuffle Read Metrics") or {}).get(
                "Local Bytes Read", 0)
            s["shuf_w_mb"] = round(s.get("shuf_w_mb", 0) + sw / 1e6, 1)
            s["shuf_r_mb"] = round(s.get("shuf_r_mb", 0) + sr / 1e6, 1)

    print(f"\n=== {master} n_queries={n_queries} batch wall {wall:.1f}s "
          f"rows={n} ===")
    big = sorted((s for s in stages.values() if s.get("wall")),
                 key=lambda s: -s["wall"])[:12]
    for s in big:
        print(f"{s['wall']:8.1f}s wall {s.get('task_time', 0):9.1f}s task "
              f"max {s.get('max_task', 0):7.1f}s "
              f"[{s.get('tasks', '?'):>4} tasks] "
              f"shufW {s.get('shuf_w_mb', 0):8.1f}MB "
              f"shufR {s.get('shuf_r_mb', 0):8.1f}MB  {s.get('name', '')}")


if __name__ == "__main__":
    main()
