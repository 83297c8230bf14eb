"""Structured Streaming incremental index + multimodal plumbing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engine.multimodal import (
    byte_histogram, decode_image, frame_sample_plan, media_stats, synth_media,
)
from engine.postings import init_stats, load_manifest, merge_partials, read_index
from engine.queries_set import REFERENCE_QUERIES, queries_df
from engine.csearch import search_index
from engine.streaming import start_incremental_index, windowed_event_counts

from .oracle import bm25_topk


def test_streaming_incremental_index(spark, documents, tmp_path):
    """Docs arriving as files -> stream shards -> merge -> identical
    search results to the oracle."""
    inp = str(tmp_path / "incoming")
    out = str(tmp_path / "sidx")
    # stage the corpus as two separate file drops
    documents.where(F.col("doc_id") < 250).write.parquet(inp + "/d1")
    documents.where(F.col("doc_id") >= 250).write.parquet(inp + "/d2")
    import shutil

    os.makedirs(inp + "/all")
    for d in ("d1", "d2"):
        for f in os.listdir(f"{inp}/{d}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{inp}/{d}/{f}", f"{inp}/all/{f}")

    m = init_stats(spark, documents, out)
    q = start_incremental_index(spark, inp + "/all", out,
                                avgdl_hint=m["stats"]["avgdl"])
    q.awaitTermination(120)
    assert not q.isActive or q.stop() is None

    mf = load_manifest(out)
    stream_shards = [k for k in mf["shards"] if k.startswith("stream")]
    assert stream_shards, mf["shards"]

    merge_partials(spark, out, hot_df_threshold=100, n_salts=4)
    idx = read_index(spark, out)
    res = search_index(spark, idx, queries_df(spark), k=10, prune=True)
    docs = [(r.doc_id, r.text) for r in documents.select("doc_id", "text").collect()]
    golden = bm25_topk(docs, list(REFERENCE_QUERIES), k=10)
    got = sorted((r.query_id, r.doc_id, r.rank) for r in res.collect())
    want = sorted((q_, d, rk) for q_, d, s, rk in golden)
    assert got == want


def test_streaming_restart_skips_committed_batches(spark, documents, tmp_path):
    inp = str(tmp_path / "in2")
    out = str(tmp_path / "sidx2")
    documents.limit(100).write.parquet(inp)
    m = init_stats(spark, documents.limit(100), out)
    q = start_incremental_index(spark, inp, out, avgdl_hint=m["stats"]["avgdl"])
    q.awaitTermination(120)
    n1 = len(load_manifest(out)["shards"])
    # restart with no new files: checkpoint must prevent reprocessing
    q2 = start_incremental_index(spark, inp, out, avgdl_hint=m["stats"]["avgdl"])
    q2.awaitTermination(120)
    assert len(load_manifest(out)["shards"]) == n1


def test_windowed_event_counts(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events).collect()
    assert out and all(r.n > 0 for r in out)
    total = sum(r.n for r in out)
    assert total == events.count()


def test_multimodal_plumbing(spark, documents):
    media = synth_media(documents.limit(60))
    stats = media_stats(media).collect()
    assert all(r.n_bytes == 64 for r in stats)
    kinds = {r.kind for r in stats}
    assert kinds == {"image", "audio", "video"}

    hists = {r.media_id: r.histogram for r in byte_histogram(media).collect()}
    assert len(hists) == 60
    assert all(len(h) == 16 and sum(h) == 64 for h in hists.values())

    plan = frame_sample_plan(media, fps=1.0)
    rows = plan.groupBy("media_id").count().collect()
    assert rows and all(r["count"] >= 1 for r in rows)

    with pytest.raises(NotImplementedError):
        decode_image(media)


def test_media_payload_deterministic(spark, documents):
    """Same input -> byte-identical payloads (md5-derived)."""
    a = {r.media_id: bytes(r.payload) for r in synth_media(documents.limit(5)).collect()}
    b = {r.media_id: bytes(r.payload) for r in synth_media(documents.limit(5)).collect()}
    assert a == b
    import hashlib

    want = hashlib.md5(b"0").digest()
    assert a[0][:16] == want
