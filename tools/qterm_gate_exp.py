"""A/B the qterm strategies (lazy in-plan vs collect-once) for the
round-4 p50 regression fix: build the sf0.1 index once, then time
single-query and 50-query-batch search_index under both routes,
interleaved reps. Usage:
    python tools/qterm_gate_exp.py [--reps N] [--sf DIR] [--prune]
Prints one JSON line with per-route wall stats."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import engine.csearch as cs
    from engine.postings import build_index, read_index
    from engine.queries_set import REFERENCE_QUERIES, queries_df

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("qterm-gate-exp")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    n_docs = docs.count()
    qdf = queries_df(spark)
    out = tempfile.mkdtemp(prefix="qterm_gate_")
    build_index(spark, docs, out, n_shards=8,
                hot_df_threshold=max(100, n_docs // 10), n_salts=8)
    idx = read_index(spark, out)
    idx["postings"] = idx["postings"].cache()
    idx["postings"].count()
    # warm both routes
    for gate in (0, 10**9):
        cs.QTERM_COLLECT_MIN_QUERIES = gate
        cs.search_index(spark, idx, qdf.limit(2), k=10, prune=True).count()

    res: dict = {"n_docs": n_docs, "cpus": args.cpus, "reps": args.reps}
    single_qs = [
        spark.createDataFrame([(qid, q)], ["query_id", "query"])
        for qid, q in REFERENCE_QUERIES[5:10]
    ]
    for name, runner in (
        ("p50_single", lambda: [
            cs.search_index(spark, idx, one, k=10, prune="auto").count()
            for one in single_qs]),
        ("batch50", lambda: cs.search_index(
            spark, idx, qdf, k=100, prune="auto").count()),
        ("batch50_prune", lambda: cs.search_index(
            spark, idx, qdf, k=100, prune=True).count()),
    ):
        for route, gate in (("lazy", 10**9), ("collect", 0)):
            walls = []
            for _ in range(args.reps):
                cs.QTERM_COLLECT_MIN_QUERIES = gate
                t0 = time.time()
                runner()
                walls.append(round(time.time() - t0, 3))
            res[f"{name}_{route}"] = {
                "walls": walls,
                "median": round(statistics.median(walls), 3),
            }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
