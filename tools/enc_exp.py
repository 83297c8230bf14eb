"""Encode-phase experiment: occurrence-shuffle vs pre-aggregated tf.

Variants (all: -> repartition(shard, tid) -> numpy encode kernel -> noop):
  A  current: per-occurrence rows, kernel counts tf via np.unique
  B  groupBy(shard,tid,doc_id) partial-agg + 2nd exchange, tf-aware kernel
  C  per-doc run-length tf in JVM (array_sort + HOFs), single exchange
"""
import sys, time, json

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from bench import _mk_spark
from engine.analysis import with_tokens
from engine.postings import TID_ENC_SCHEMA, _encode_partition_fn
from engine.codec import encode_blocked
from pyspark.sql import functions as F

CORPUS = "/tmp/spark_graft_scaling_corpus_1000000"


def _encode_pretf_fn(avgdl, yield_rows=256):
    def fn(batches):
        shards, tids, ds, tfs, dls = [], [], [], [], []
        for pdf in batches:
            if len(pdf):
                shards.append(pdf["shard"].to_numpy(np.int32))
                tids.append(pdf["tid"].to_numpy(np.int64))
                ds.append(pdf["doc_id"].to_numpy(np.int64))
                tfs.append(pdf["tf"].to_numpy(np.int64))
                dls.append(pdf["dl"].to_numpy(np.int64))
        if not shards:
            return
        shard = np.concatenate(shards); tid = np.concatenate(tids)
        d = np.concatenate(ds); tf = np.concatenate(tfs); dl = np.concatenate(dls)
        del shards, tids, ds, tfs, dls
        order = np.lexsort((d, tid, shard))
        shard, tid, d, tf, dl = (shard[order], tid[order], d[order],
                                 tf[order], dl[order])
        change = np.flatnonzero(
            (shard[1:] != shard[:-1]) | (tid[1:] != tid[:-1])) + 1
        bounds = np.concatenate(([0], change, [shard.size]))
        out = {k: [] for k in ("shard", "tid", "n_docs", "doc_bytes",
                               "tf_bytes", "dl_bytes", "block_last",
                               "block_max", "doc_off", "tf_off", "dl_off")}
        def flush():
            df = pd.DataFrame(out)
            for k in out: out[k] = []
            return df
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            enc = encode_blocked(d[lo:hi], tf[lo:hi], dl[lo:hi], avgdl)
            out["shard"].append(int(shard[lo])); out["tid"].append(int(tid[lo]))
            out["n_docs"].append(hi - lo)
            for k in ("doc_bytes", "tf_bytes", "dl_bytes", "block_last",
                      "block_max", "doc_off", "tf_off", "dl_off"):
                out[k].append(enc[k])
            if len(out["tid"]) >= yield_rows:
                yield flush()
        if out["tid"]:
            yield flush()
    return fn


def occurrences(docs, n_shards=8):
    # the SAME projection the real build measures — never a local copy
    from engine.postings import raw_token_projection

    return raw_token_projection(docs, n_shards, text_col="content")


def runlen_tf(docs, n_shards=8):
    shard = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).cast("int")
    t = with_tokens(docs, "content").select(
        shard.alias("shard"), "doc_id",
        F.size("tokens").cast("long").alias("dl"), "tokens")
    t = t.withColumn("s", F.array_sort("tokens"))
    # run starts (1-based); guarded for empty docs
    t = t.withColumn("starts", F.expr(
        "CASE WHEN size(s) >= 1 THEN "
        "filter(sequence(1, size(s)), i -> i = 1 OR s[i-1] != s[i-2]) "
        "ELSE array() END"))
    t = t.withColumn("pairs", F.expr(
        "zip_with(starts,"
        " concat(slice(starts, 2, size(starts) - 1), array(size(s) + 1)),"
        " (a, b) -> struct(s[a-1] AS term, CAST(b - a AS LONG) AS tf))"))
    return t.select(
        "shard", "doc_id", "dl", F.explode("pairs").alias("p")
    ).select("shard", F.xxhash64("p.term").alias("tid"), "doc_id",
             F.col("p.tf").alias("tf"), "dl")


def run(variant, cpus):
    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)
    with_tokens(docs.limit(2000), "content").select(
        F.sum(F.size("tokens"))).collect()
    t0 = time.time()
    if variant == "A":
        enc = occurrences(docs).repartition("shard", "tid").mapInPandas(
            _encode_partition_fn(200.0), TID_ENC_SCHEMA)
    elif variant == "B":
        pre = occurrences(docs).groupBy("shard", "tid", "doc_id").agg(
            F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        enc = pre.repartition("shard", "tid").mapInPandas(
            _encode_pretf_fn(200.0), TID_ENC_SCHEMA)
    elif variant == "C":
        enc = runlen_tf(docs).repartition("shard", "tid").mapInPandas(
            _encode_pretf_fn(200.0), TID_ENC_SCHEMA)
    enc.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.stop()
    return round(wall, 2)


if __name__ == "__main__":
    v, cpus = sys.argv[1], int(sys.argv[2])
    print(json.dumps({"variant": v, "cpus": cpus, "wall": run(v, cpus)}))
