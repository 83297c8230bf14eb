"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline pipelines at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...per-stage sec...}, "sf": ...}.

Stages:
  index_build      checkpointed compressed posting build (8 shards,
                   skew-salted merge) -> fresh temp dir; also reports
                   docs_per_sec in the side channel
  query_batch      all 50 reference queries, k=100, block-max pruned,
                   over the warm compressed index
  query_batch_nop  same without pruning (prune win is visible)
  query_p50        per-query latency p50 over 10 single-query runs
  e2e_uncompressed tokenize->stats->score->topk straight from parquet

Usage: python bench.py [--scaling]   (--scaling: run the index build at
local[8] and local[32] in subprocesses and report efficiency)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _mk_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def run_bench(sf_dir: str, cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from engine.csearch import search_index
    from engine.postings import build_index, read_index
    from engine.queries_set import REFERENCE_QUERIES, queries_df
    from engine.search import search_corpus

    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    qdf = queries_df(spark)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    out = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        t0 = time.time()
        build_index(spark, docs, out, n_shards=8,
                    hot_df_threshold=max(100, n_docs // 10), n_salts=8)
        timings["index_build"] = round(time.time() - t0, 3)
        extras["docs_per_sec"] = round(n_docs / timings["index_build"], 1)

        idx = read_index(spark, out)
        idx["postings"] = idx["postings"].cache()
        idx["postings"].count()  # warm

        t0 = time.time()
        search_index(spark, idx, qdf, k=100, prune="auto").count()
        timings["query_batch"] = round(time.time() - t0, 3)

        t0 = time.time()
        search_index(spark, idx, qdf, k=100, prune=True).count()
        timings["query_batch_forced_prune"] = round(time.time() - t0, 3)

        lats = []
        for qid, q in REFERENCE_QUERIES[5:15]:
            one = spark.createDataFrame([(qid, q)], ["query_id", "query"])
            t0 = time.time()
            search_index(spark, idx, one, k=10, prune="auto").count()
            lats.append(time.time() - t0)
        timings["query_p50"] = round(statistics.median(lats), 3)

        t0 = time.time()
        search_corpus(spark, docs, qdf, k=100).count()
        timings["e2e_uncompressed"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()

    total = round(
        timings["index_build"] + timings["query_batch"] + timings["query_p50"], 3
    )
    return {
        "metric": "index_build + bm25_topk batch + per-query p50 (sec)",
        "value": total,
        "unit": "sec",
        "queries": {**timings, **extras},
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "n_docs": n_docs,
    }


def run_scaling(sf_dir: str) -> None:
    """local[8] vs local[32] on the identical input (BASELINE.md)."""
    import subprocess

    res = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__],
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus),
                 "SPARK_GRAFT_SF_DIR": sf_dir},
            capture_output=True, text=True, check=True,
        )
        res[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    th8 = res[8]["n_docs"] / res[8]["queries"]["index_build"]
    th32 = res[32]["n_docs"] / res[32]["queries"]["index_build"]
    eff = (th32 / th8) / (32 / 8)
    print(json.dumps({
        "metric": "index-build scaling efficiency local[8]->local[32]",
        "throughput_8": round(th8, 1),
        "throughput_32": round(th32, 1),
        "efficiency": round(eff, 3),
        "sf": res[8]["sf"],
    }))


if __name__ == "__main__":
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        run_scaling(sf)
    else:
        print(json.dumps(run_bench(sf, cpus)))
