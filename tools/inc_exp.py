"""Measurement harness for VERDICT r2 items 8-9 (results -> BASELINE.md):

  (a) incremental vs full stream-merge wall at 1M batch docs + a 5k-doc
      append-only stream batch (engine/postings.merge_partials
      incremental path vs forced full re-merge, identical inputs);
  (b) pruned query-batch wall over the 1M index for each
      search_index cache_level (memory / disk / none).

Run AFTER the box is quiet (the scaling protocol monopolizes cores):
    python tools/inc_exp.py [--reuse]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/tmp/idx_1m_exp"
CORPUS = "/tmp/spark_graft_scaling_corpus_1000000"
N_STREAM = 5000


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("inc-exp")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def main() -> None:
    from pyspark.sql import functions as F

    from engine.corpusgen import synth_corpus
    from engine.csearch import search_index
    from engine.postings import (
        build_index, load_manifest, merge_partials, read_index,
    )
    from engine.queries_set import queries_df
    from engine.streaming import start_incremental_index

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {}

    if not os.path.exists(os.path.join(BASE, "_manifest.json")):
        shutil.rmtree(BASE, ignore_errors=True)
        docs = spark.read.parquet(CORPUS)
        t0 = time.time()
        build_index(spark, docs, BASE, n_shards=8,
                    hot_df_threshold=50_000, n_salts=8,
                    id_col="doc_id", text_col="content")
        result["base_build_wall"] = round(time.time() - t0, 1)

    m = load_manifest(BASE)
    avgdl = m["stats"]["avgdl"]

    # ---- (a) incremental vs full merge of a 5k append-only stream
    # batch, in BOTH vocabulary regimes:
    #   smallvocab — stream drawn from the corpus's own 1,030-token
    #     vocabulary: touches ~every tid, the incremental worst case
    #     (the auto guard must pick the full merge);
    #   disjoint  — stream drawn from 200 NEW tokens at the corpus
    #     avgdl: touches ~16% of the term space, the favorable regime.
    small_stream = (
        synth_corpus(spark, N_STREAM)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    nv = 200
    svocab = F.array(*[F.lit(f"streamonly{i}") for i in range(nv)])
    n_tok = int(round(avgdl))
    disjoint_stream = (
        spark.range(N_STREAM)
        .select((F.col("id") + 20_000_000).alias("doc_id"))
        .withColumn("repo", F.lit("org0/streamrepo"))
        .withColumn("path", F.concat(F.lit("s/"),
                                     F.col("doc_id").cast("string")))
        .withColumn("commit", F.lit("c" * 40))
        .withColumn("lang", F.lit("python"))
        .withColumn(
            "content",
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(n_tok)),
                lambda j: F.element_at(
                    svocab, (F.pmod(F.xxhash64(F.col("doc_id"), j),
                                    F.lit(nv)) + 1).cast("int")))),
        )
    )
    legs = [
        ("smallvocab_auto", small_stream, "auto"),
        ("smallvocab_forced_inc", small_stream, True),
        ("disjoint_auto", disjoint_stream, "auto"),
        ("disjoint_full", disjoint_stream, False),
    ]
    merge = {}
    for name, stream_rows, inc in legs:
        d = f"{BASE}_{name}"
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(BASE, d)
        inp = tempfile.mkdtemp(prefix=f"inc_exp_{name}_")
        stream_rows.write.mode("overwrite").parquet(inp + "/drop")
        q = start_incremental_index(
            spark, inp + "/drop", d, avgdl_hint=avgdl,
            schema=("doc_id long, repo string, path string, commit string,"
                    " lang string, content string"),
            text_col="content")
        q.awaitTermination(600)
        t0 = time.time()
        merge_partials(spark, d, hot_df_threshold=50_000, n_salts=8,
                       incremental=inc)
        wall = round(time.time() - t0, 1)
        mm = load_manifest(d)
        merge[name] = {"merge_wall": wall, "last_merge": mm["last_merge"],
                       "encode_avgdl": round(mm["encode_avgdl"], 3),
                       "avgdl": round(mm["stats"]["avgdl"], 3)}
        # rank-identity spot check across merge modes of the same input
        idx = read_index(spark, d)
        res = search_index(spark, idx, queries_df(spark), k=10,
                           prune=True).orderBy("query_id", "rank")
        merge[name]["topk_sig"] = hash(tuple(
            (r.query_id, r.doc_id, round(r.score, 6)) for r in res.collect()))
        shutil.rmtree(d, ignore_errors=True)
    result["stream_merge_5k_on_1m"] = merge
    result["merge_modes_rank_identical"] = {
        "smallvocab": merge["smallvocab_auto"]["topk_sig"]
        == merge["smallvocab_forced_inc"]["topk_sig"],
        "disjoint": merge["disjoint_auto"]["topk_sig"]
        == merge["disjoint_full"]["topk_sig"],
    }

    # ---- (b) query-batch wall per cache_level over the base index
    idx = read_index(spark, BASE)
    qdf = queries_df(spark)
    levels = {}
    for lvl in ("memory", "disk", "none"):
        walls = []
        for _ in range(2):
            t0 = time.time()
            search_index(spark, idx, qdf, k=100, prune=True,
                         cache_level=lvl).count()
            walls.append(round(time.time() - t0, 2))
        levels[lvl] = {"walls": walls, "best": min(walls)}
    result["query_batch_cache_levels_1m"] = levels

    print(json.dumps(result))
    with open(os.path.join(REPO, "bench", "inc_exp_latest.json"), "w") as fh:
        json.dump(result, fh)
    spark.stop()


if __name__ == "__main__":
    main()
