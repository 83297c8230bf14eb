"""Warm-serving A/B: does warm_serving() remove the per-batch constant?

Round-4 serving runs measured a ~30 s per-batch fixed term at ANY
executor count and batch size (BASELINE.md). This harness measures the
back-to-back protocol the round-4 verdict asked for (item 3): on ONE
long-lived session over the design-regime index, run consecutive
query batches cold (the round-4 behavior) and warm (warm_serving),
with DIFFERENT query seeds per batch so no batch is served from a
previous batch's term working set. Done-bar: batch 2's warm wall ~=
marginal-rate x batch size, i.e. the fixed term no longer recurs.

Usage:
  python tools/warm_exp.py [--docs 500000] [--vocab 300000]
      [--queries 1600] [--batches 3] [--master local-cluster[8,4,10240]]
      [--payload-cache memory|disk|none]

Writes bench/warm_exp_latest.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--vocab", type=int, default=300_000)
    ap.add_argument("--queries", type=int, default=1600)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--master", default="local-cluster[8,4,10240]")
    ap.add_argument("--payload-cache", default="memory",
                    choices=["memory", "disk", "none"])
    args = ap.parse_args()

    import bench
    from engine.corpusgen import synth_queries
    from engine.csearch import release_warm, search_index, warm_serving
    from engine.postings import read_index

    corpus = bench._scaling_corpus(args.docs, vocab_size=args.vocab)
    idx_dir = bench._scaling_index(corpus)

    os.environ["SPARK_GRAFT_MASTER"] = args.master
    spark = bench._mk_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    idx = read_index(spark, idx_dir)

    def batch(seed: int) -> float:
        qs = synth_queries(spark, args.queries, seed=seed,
                           vocab_size=args.vocab)
        t0 = time.time()
        search_index(spark, idx, qs, k=10).collect()
        return round(time.time() - t0, 3)

    # one tiny warmup exercises codegen/Arrow/python-worker spin-up on
    # both legs identically
    search_index(spark, idx, synth_queries(spark, 1, seed=999,
                                           vocab_size=args.vocab),
                 k=10).collect()

    cold = [batch(seed=100 + i) for i in range(args.batches)]
    t0 = time.time()
    warm_serving(spark, idx, payload_cache=(
        None if args.payload_cache == "none" else args.payload_cache))
    warm_setup = round(time.time() - t0, 3)
    warm = [batch(seed=200 + i) for i in range(args.batches)]
    release_warm(idx)
    spark.stop()

    res = {
        "n_docs": args.docs, "vocab_size": args.vocab,
        "n_queries_per_batch": args.queries, "master": args.master,
        "payload_cache": args.payload_cache,
        "cold_batch_walls": cold,
        "warm_setup_wall": warm_setup,
        "warm_batch_walls": warm,
        "cold_steady": min(cold[1:]) if len(cold) > 1 else cold[0],
        "warm_steady": min(warm[1:]) if len(warm) > 1 else warm[0],
        "per_batch_constant_removed": round(
            (min(cold[1:]) if len(cold) > 1 else cold[0])
            - (min(warm[1:]) if len(warm) > 1 else warm[0]), 3),
        "measured_unix_ts": round(time.time(), 1),
    }
    with open(os.path.join(REPO, "bench", "warm_exp_latest.json"),
              "w") as fh:
        json.dump(res, fh)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
