"""Compressed posting-list build: sharded, checkpointed, skew-salted.

Reference analog: Lucene IndexWriter builds per-segment posting lists
and commits every 10,000 docs (LuceneIndexBuilder.java:39-49); segments
are later merged. Here (north_rule):

  build phase (per shard s of the corpus, shard = xxhash64(doc)%S):
      tokenize -> tf -> groupBy(term) applyInPandas encode
      -> parquet partials/shard=s  (one blocked delta+varbyte partial
         posting list per term per shard, dl stored inline like Lucene
         norms, block-max metadata per 128-posting block)
      -> manifest entry with per-shard lineage (term/posting counts,
         wall ms, status) — the shard IS the resumable checkpoint: a
         re-run skips shards already marked ok in the manifest.

  merge phase (explicit skew handling, north_rule):
      df(term) = sum of partial counts (broadcast); terms with
      df > hot_threshold keep up to n_salts rows in the final table
      (salt = shard % n_salts — shard doc spaces are disjoint, so
      per-salt lists are independent and the giant hot-term group is
      never materialized in a single task); cold terms merge to one
      row. Each (term, salt) group decodes its few partials, re-sorts,
      re-encodes — numpy inside applyInPandas, Arrow-batched.

Final layout (parquet, sorted by term within files so row-group
min/max stats serve the query path's term IN (...) pushdown):
  postings/   term, salt, df, n_docs, doc_bytes, tf_bytes, dl_bytes,
              block_last, block_max, doc_off, tf_off, dl_off
  doc_stats/  doc_id, dl, content_sha
  stats/      n_docs, avgdl
  _manifest.json  per-shard lineage + collection stats + merge status

Scale notes: at 10^12 files n_shards grows to O(10^4-10^5); each shard
build is an independent bounded job (the failure-recovery unit), and
the merge shuffles only already-compressed partials — a small fraction
of raw token volume. Query-time dl comes from the posting list itself,
so serving needs no doc_stats join at all.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from .analysis import with_tokens
from .codec import decode_blocked, encode_blocked

ENC_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        StructField("n_docs", LongType(), False),
        StructField("doc_bytes", BinaryType(), False),
        StructField("tf_bytes", BinaryType(), False),
        StructField("dl_bytes", BinaryType(), False),
        StructField("block_last", ArrayType(LongType()), False),
        StructField("block_max", ArrayType(DoubleType()), False),
        StructField("doc_off", ArrayType(IntegerType()), False),
        StructField("tf_off", ArrayType(IntegerType()), False),
        StructField("dl_off", ArrayType(IntegerType()), False),
    ]
)


def _row_from_enc(term: str, salt: int, n: int, enc: dict) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "term": [term],
            "salt": [salt],
            "n_docs": [n],
            "doc_bytes": [enc["doc_bytes"]],
            "tf_bytes": [enc["tf_bytes"]],
            "dl_bytes": [enc["dl_bytes"]],
            "block_last": [enc["block_last"]],
            "block_max": [enc["block_max"]],
            "doc_off": [enc["doc_off"]],
            "tf_off": [enc["tf_off"]],
            "dl_off": [enc["dl_off"]],
        }
    )


def _encode_group_fn(avgdl: float):
    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        d = pdf["doc_id"].to_numpy(np.int64)
        enc = encode_blocked(d, pdf["tf"].to_numpy(np.int64),
                             pdf["dl"].to_numpy(np.int64), avgdl)
        return _row_from_enc(key[0], 0, d.size, enc)

    return encode


def _merge_group_fn(avgdl: float):
    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ds, ts, ls = [], [], []
        for r in pdf.itertuples(index=False):
            d, t, dl = decode_blocked(r.doc_bytes, r.tf_bytes, r.dl_bytes,
                                      r.doc_off, r.tf_off, r.dl_off)
            ds.append(d); ts.append(t); ls.append(dl)
        d = np.concatenate(ds)
        enc = encode_blocked(d, np.concatenate(ts), np.concatenate(ls), avgdl)
        return _row_from_enc(key[0], int(key[1]), d.size, enc)

    return merge


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"shards": {}, "stats": None, "merged": False}


def _save_manifest(out_dir: str, m: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


def init_stats(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Write doc_stats + collection stats (idempotent; its own
    checkpoint in the manifest). Returns the manifest."""
    manifest = load_manifest(out_dir)
    if manifest["stats"] is not None:
        return manifest
    ds_path = os.path.join(out_dir, "doc_stats")
    st_path = os.path.join(out_dir, "stats")
    toks = with_tokens(corpus, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.size("tokens").cast("long").alias("dl"),
        F.sha2(F.col(text_col), 256).alias("content_sha"),
    )
    toks.write.mode("overwrite").parquet(ds_path)
    n_docs, avgdl, n_tokens = (
        spark.read.parquet(ds_path)
        .agg(F.count(F.lit(1)), F.avg("dl"), F.sum("dl"))
        .collect()[0]
    )
    avgdl = float(avgdl or 0.0)
    spark.createDataFrame(
        [(int(n_docs), avgdl)],
        StructType([StructField("n_docs", LongType()),
                    StructField("avgdl", DoubleType())]),
    ).write.mode("overwrite").parquet(st_path)
    manifest["stats"] = {"n_docs": int(n_docs), "avgdl": avgdl,
                         "n_tokens": int(n_tokens or 0)}
    _save_manifest(out_dir, manifest)
    return manifest


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    hot_df_threshold: int = 1 << 17,
    n_salts: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Full checkpointed build; idempotent/resumable. Returns manifest."""
    manifest = init_stats(spark, corpus, out_dir, id_col, text_col)
    avgdl = manifest["stats"]["avgdl"]

    # Shard builds are independent bounded jobs; run a few concurrently
    # so Spark's scheduler fills the cluster (on a real cluster each
    # shard job gets its own stage pipeline; locally threads overlap the
    # fixed per-job latency). The manifest is the checkpoint: each shard
    # appends its lineage entry under a lock as it completes.
    from concurrent.futures import ThreadPoolExecutor
    from threading import Lock

    from pyspark.sql import Observation

    lock = Lock()
    todo = [s for s in range(n_shards)
            if manifest["shards"].get(str(s), {}).get("status") != "ok"]

    def build_shard(shard: int):
        t0 = time.time()
        sub = corpus.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)) == shard
        )
        pl = (
            with_tokens(sub, text_col)
            .select(F.col(id_col).alias("doc_id"),
                    F.size("tokens").cast("long").alias("dl"),
                    F.explode("tokens").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        )
        enc = pl.groupBy("term").applyInPandas(_encode_group_fn(avgdl), ENC_SCHEMA)
        obs = Observation(f"shard{shard}")
        enc = enc.observe(obs, F.count(F.lit(1)).alias("n_terms"),
                          F.sum("n_docs").alias("n_postings"))
        shard_path = os.path.join(out_dir, "partials", f"shard={shard}")
        enc.write.mode("overwrite").parquet(shard_path)
        got = obs.get
        with lock:
            manifest["shards"][str(shard)] = {
                "n_terms": int(got["n_terms"] or 0),
                "n_postings": int(got["n_postings"] or 0),
                "wall_ms": int((time.time() - t0) * 1000),
                "status": "ok",
            }
            _save_manifest(out_dir, manifest)

    if todo:
        workers = int(os.environ.get("SPARK_GRAFT_BUILD_THREADS", "4"))
        with ThreadPoolExecutor(max_workers=max(1, min(workers, len(todo)))) as ex:
            list(ex.map(build_shard, todo))

    return merge_partials(spark, out_dir, hot_df_threshold, n_salts)


def merge_partials(
    spark: SparkSession,
    out_dir: str,
    hot_df_threshold: int = 1 << 17,
    n_salts: int = 8,
) -> dict:
    """Merge all partial shards (batch- or stream-written) into the
    final postings table with explicit hot-term salt splitting. Safe to
    re-run; also refreshes nothing else (stats are build-time)."""
    manifest = load_manifest(out_dir)
    avgdl = manifest["stats"]["avgdl"]
    t0 = time.time()
    partials = spark.read.option(
        "basePath", os.path.join(out_dir, "partials")
    ).parquet(os.path.join(out_dir, "partials"))
    dfs = partials.groupBy("term").agg(F.sum("n_docs").alias("df"))
    with_df = partials.join(F.broadcast(dfs), "term").withColumn(
        "msalt",
        F.when(
            F.col("df") > hot_df_threshold,
            F.pmod(F.xxhash64(F.col("shard").cast("string")),
                   F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    merged = with_df.groupBy("term", "msalt").applyInPandas(
        _merge_group_fn(avgdl), ENC_SCHEMA
    )
    out = merged.join(F.broadcast(dfs), "term").select(
        "term", "salt", "df", "n_docs", "doc_bytes", "tf_bytes", "dl_bytes",
        "block_last", "block_max", "doc_off", "tf_off", "dl_off",
    )
    out.sortWithinPartitions("term").write.mode("overwrite").parquet(
        os.path.join(out_dir, "postings")
    )
    manifest["merged"] = True
    manifest["merge_wall_ms"] = int((time.time() - t0) * 1000)
    _save_manifest(out_dir, manifest)
    return manifest


def read_index(spark: SparkSession, out_dir: str) -> dict:
    """Open a built index: postings DF + doc_stats DF + scalar stats."""
    st = spark.read.parquet(os.path.join(out_dir, "stats")).collect()[0]
    return {
        "postings": spark.read.parquet(os.path.join(out_dir, "postings")),
        "doc_stats": spark.read.parquet(os.path.join(out_dir, "doc_stats")),
        "n_docs": int(st["n_docs"]),
        "avgdl": float(st["avgdl"]),
    }
