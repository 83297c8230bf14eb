"""Large-vocabulary measurement for the tid-bucketed layout
(VERDICT r3 item 2 / "What's missing" #1).

The synthetic gate corpus has ~1,030 distinct terms over 64 buckets, so
the layout's two headline mechanisms could not show their saving at toy
scale (BASELINE.md records both as measured negatives there). This
harness builds the DESIGN-regime corpus — corpusgen's zipfian
vocab_size extension, 10^5+ distinct terms, term-aware auto pb_mod —
and measures:

  (a) incremental stream merge: a 5k-doc batch with a bounded term set
      must rewrite <= |batch-term buckets| bucket dirs and hardlink the
      rest (counted via st_nlink), and beat the forced full merge;
      a same-vocabulary batch (touches most tids) must auto-fall back
      to the full merge. Rank identity across modes is asserted on the
      stream-doc results.
  (b) pb-pruned serving: query batch wall with partition pruning vs the
      same index served with pruning disabled (index['pb_mod']=None —
      same plans otherwise).

Results -> bench/lv_exp_latest.json + BASELINE.md. Run on a quiet box:
    python tools/lv_exp.py [--reuse] [--docs 500000] [--vocab 300000]
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

BASE = "/tmp/idx_lv_exp"
N_STREAM = 5000
OUT = os.path.join(REPO, "bench", "lv_exp_latest.json")


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("lv-exp")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _bucket_files(postings_dir: str) -> dict:
    """{pb dir name: set of part-file names} of a postings version."""
    out = {}
    for name in os.listdir(postings_dir):
        if name.startswith("pb="):
            out[name] = {
                f for f in os.listdir(os.path.join(postings_dir, name))
                if not f.startswith((".", "_"))
            }
    return out


def _bucket_rewrite_stats(before: dict, after_dir: str) -> dict:
    """Rewritten vs preserved bucket dirs of an incremental version.
    Spark part-file names are unique per write, so a bucket whose file
    set is IDENTICAL to the pre-merge version was carried over by the
    hardlink step (metadata-only); a bucket with new file names was
    rewritten. (st_nlink can't be used: the merge deletes the previous
    version after the pointer flip, dropping link counts back to 1.)"""
    after = _bucket_files(after_dir)
    rewritten = linked = 0
    for name, files in after.items():
        if before.get(name) == files:
            linked += 1
        else:
            rewritten += 1
    return {"rewritten_buckets": rewritten, "hardlinked_buckets": linked}


def main() -> None:
    from pyspark.sql import functions as F

    from engine.corpusgen import synth_corpus
    from engine.csearch import search_index
    from engine.postings import (
        build_index, load_manifest, merge_partials, read_index,
    )
    from engine.queries_set import queries_df
    from engine.streaming import start_incremental_index

    n_docs = 500_000
    vocab = 300_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--vocab" in sys.argv:
        vocab = int(sys.argv[sys.argv.index("--vocab") + 1])

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"n_docs": n_docs, "vocab_size": vocab}

    if "--reuse" not in sys.argv or not os.path.exists(
        os.path.join(BASE, "_manifest.json")
    ):
        shutil.rmtree(BASE, ignore_errors=True)
        docs = synth_corpus(spark, n_docs, vocab_size=vocab)
        t0 = time.time()
        build_index(spark, docs, BASE, n_shards=8,
                    hot_df_threshold=max(1000, n_docs // 20), n_salts=8,
                    id_col="doc_id", text_col="content")
        result["base_build_wall"] = round(time.time() - t0, 1)

    m = load_manifest(BASE)
    avgdl = m["stats"]["avgdl"]
    result["n_terms"] = m["stats"].get("n_terms")
    result["pb_mod"] = m.get("pb_mod")

    # ---- (a) incremental merge in the design regime --------------------
    # bounded-term stream: 200 disjoint tokens -> touches <= 200 buckets
    nv = 200
    svocab = F.array(*[F.lit(f"streamonly{i}") for i in range(nv)])
    n_tok = int(round(avgdl))
    bounded_stream = (
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
    # same-vocab stream: 5k docs over the full zipf vocabulary — tens of
    # thousands of distinct terms; the auto guard must pick full merge
    wide_stream = (
        synth_corpus(spark, N_STREAM, vocab_size=vocab)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    legs = [
        ("bounded_auto", bounded_stream, "auto"),
        ("bounded_full", bounded_stream, False),
        ("wide_auto", wide_stream, "auto"),
    ]
    merge: dict = {}
    sigs: dict = {}
    for name, stream_rows, inc in legs:
        d = f"{BASE}_{name}"
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(BASE, d)
        inp = tempfile.mkdtemp(prefix=f"lv_exp_{name}_")
        stream_rows.write.mode("overwrite").parquet(inp + "/drop")
        q = start_incremental_index(
            spark, inp + "/drop", d, avgdl_hint=avgdl,
            schema=("doc_id long, repo string, path string, commit string,"
                    " lang string, content string"),
            text_col="content")
        q.awaitTermination(600)
        pre = load_manifest(d)
        before = _bucket_files(
            os.path.join(d, pre.get("postings_dir", "postings")))
        t0 = time.time()
        merge_partials(spark, d, hot_df_threshold=max(1000, n_docs // 20),
                       n_salts=8, incremental=inc)
        wall = round(time.time() - t0, 1)
        mm = load_manifest(d)
        row = {"merge_wall": wall, "last_merge": mm["last_merge"]}
        pdir = os.path.join(d, mm.get("postings_dir", "postings"))
        if mm["last_merge"] == "incremental":
            row.update(_bucket_rewrite_stats(before, pdir))
        merge[name] = row
        # rank identity on queries hitting the STREAM docs
        idx = read_index(spark, d)
        qs = spark.createDataFrame(
            [("sq1", "streamonly1 streamonly2 streamonly3")],
            "query_id string, query string")
        sigs[name] = tuple(
            (r.query_id, r.doc_id, round(r.score, 6), r.rank)
            for r in search_index(spark, idx, qs, k=10, prune=True)
            .orderBy("query_id", "rank").collect())
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(inp, ignore_errors=True)
    result["stream_merge"] = merge
    result["bounded_rank_identical"] = sigs["bounded_auto"] == sigs["bounded_full"]
    result["bounded_stream_hits"] = len(sigs["bounded_auto"])

    # ---- (b) pb-pruned serving vs pruning disabled ---------------------
    idx = read_index(spark, BASE)
    qdf = queries_df(spark)
    idx_nopb = dict(idx)
    idx_nopb["pb_mod"] = None
    serving = {}
    for name, ix in (("pb_pruned", idx), ("unpruned", idx_nopb)):
        walls = []
        for _ in range(3):
            t0 = time.time()
            search_index(spark, ix, qdf, k=100, prune=True).count()
            walls.append(round(time.time() - t0, 2))
        serving[name] = {"walls": walls, "best": min(walls)}
    # identical results?
    a = search_index(spark, idx, qdf, k=100, prune=True)
    b = search_index(spark, idx_nopb, qdf, k=100, prune=True)
    ra = sorted((r.query_id, r.doc_id, round(r.score, 6)) for r in a.collect())
    rb = sorted((r.query_id, r.doc_id, round(r.score, 6)) for r in b.collect())
    serving["rank_identical"] = ra == rb
    serving["speedup"] = round(
        serving["unpruned"]["best"] / serving["pb_pruned"]["best"], 3)
    result["serving_pb_pruning"] = serving

    result["measured_unix_ts"] = round(time.time(), 1)
    print(json.dumps(result, indent=1))
    with open(OUT, "w") as fh:
        json.dump(result, fh)
    spark.stop()
    # the docstring promises rank identity is ASSERTED: a measurement
    # whose modes disagree must fail the run, not land as evidence
    if not (result["bounded_rank_identical"] and serving["rank_identical"]):
        raise SystemExit(
            "rank identity violated: bounded_rank_identical="
            f"{result['bounded_rank_identical']} serving.rank_identical="
            f"{serving['rank_identical']} — see {OUT}")


if __name__ == "__main__":
    main()
