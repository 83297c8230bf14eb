"""Round-2 regression tests: ADVICE fixes + new reference features."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------- ADVICE fix regressions

def test_shingles_short_and_empty_docs(spark):
    """ADVICE(high): sequence(1, 0) is DESCENDING in Spark — shingling a
    doc with fewer than k analyzer tokens used to crash with
    INVALID_PARAMETER_VALUE.START. Short docs must yield fallbacks, not
    errors, across fingerprint and the shingle-based dedup ops."""
    from engine.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from engine.textops import fingerprint

    docs = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, "the a an"),  # 1, 0, 0 tokens
         (3, "two tokens"), (4, "exactly five tokens right here"),
         (5, "this is a much longer document with plenty of tokens inside")],
        "doc_id long, text string",
    )
    fp = fingerprint(docs, k=5).collect()
    assert len(fp) == 6 and all(r["fingerprint"] for r in fp)
    # shingle-based pair ops must simply not crash on short docs
    ngram_jaccard_pairs(docs, threshold=0.1, k=3).collect()
    minhash_lsh_pairs(docs, threshold=0.1, k=3).collect()


def test_total_variation_counts_q_only_keys(spark):
    """ADVICE(medium): grouped TVD must sum over the KEY UNION — a key
    with q-mass absent from the group's p contributes |0 - q|."""
    from engine.graph import total_variation

    p = spark.createDataFrame(
        [("g1", "a", 1.0), ("g2", "a", 0.5), ("g2", "b", 0.5)],
        "source string, key string, prob double",
    )
    q = spark.createDataFrame(
        [("a", 0.5), ("b", 0.25), ("c", 0.25)], "key string, prob double"
    )
    rows = {r["source"]: r["tvd"]
            for r in total_variation(p, q, by="source").collect()}
    # g1: |1-.5| + |0-.25| + |0-.25| = 1.0 -> 0.5 (left join would say .25)
    assert rows["g1"] == pytest.approx(0.5)
    # g2: |.5-.5| + |.5-.25| + |0-.25| = 0.5 -> 0.25
    assert rows["g2"] == pytest.approx(0.25)


def test_ranklib_lines_no_locale_separators(spark):
    """ADVICE(low): features >= 1000 must print '1234.500000', never
    '1,234.500000'."""
    from engine.runfile import ranklib_lines

    df = spark.createDataFrame(
        [("q1", 7, 1, 1234.5)], "query_id string, doc_id int, rel int, f double"
    )
    line = ranklib_lines(df, ["f"]).collect()[0]["line"]
    assert "1:1234.500000" in line and "," not in line


def test_search_round_dp_is_exact_not_buffered(spark, documents, tmp_path_factory):
    """ADVICE(low): with round_dp set, pruned search must equal the
    unpruned search under the SAME rounded ordering — rank identity by
    construction, not via a top-100 buffer."""
    from engine.csearch import search_index
    from engine.postings import build_index, read_index
    from engine.queries_set import queries_df

    out = str(tmp_path_factory.mktemp("rdpidx"))
    build_index(spark, documents, out, n_shards=2, hot_df_threshold=50,
                n_salts=2)
    idx = read_index(spark, out)
    qs = queries_df(spark)
    pruned = search_index(spark, idx, qs, k=10, prune=True, round_dp=4)
    plain = search_index(spark, idx, qs, k=10, prune=False, round_dp=4)
    a = sorted(map(tuple, pruned.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_streaming_docs_enter_collection_stats(spark, tmp_path_factory):
    """ADVICE(low): after streaming ingest + merge, n_docs/avgdl must
    reflect the streamed docs (not the init-time snapshot)."""
    from engine.postings import (
        init_stats, merge_partials, read_index,
    )
    from engine.streaming import start_incremental_index

    out = str(tmp_path_factory.mktemp("sstats"))
    inp = str(tmp_path_factory.mktemp("sin"))
    first = spark.createDataFrame(
        [(0, "alpha beta gamma", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    init_stats(spark, first, out)
    more = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta", "en", "s", 40),
         (2, "alpha", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    more.write.mode("overwrite").parquet(inp + "/drop")
    q = start_incremental_index(spark, inp + "/drop", out, avgdl_hint=3.0)
    q.awaitTermination(120)
    m = merge_partials(spark, out, hot_df_threshold=100, n_salts=2)
    assert m["stats"]["n_docs"] == 3
    assert m["stats"]["avgdl"] == pytest.approx((3 + 7 + 1) / 3)
    idx = read_index(spark, out)
    assert idx["doc_stats"].count() == 3


# ------------------------------------------------------ new feature operators

def test_section_split_reference_semantics(spark):
    """sectionSplit (KotlinRankLibTrainer.kt:118-135): feature i is the
    single-token BM25 of query token i; 0.0 when the query is shorter
    than i+1 tokens or the doc lacks the token."""
    from engine.features import section_split_scores
    from engine.indexer import collection_stats, doc_stats, postings_long

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "apple cherry")], "query_id string, query string"
    )
    cand = spark.createDataFrame(
        [("q1", 0), ("q1", 1)], "query_id string, doc_id long"
    )
    pl = postings_long(docs)
    ds = doc_stats(docs)
    n, avgdl = collection_stats(ds).collect()[0]
    out = {r["doc_id"]: r for r in
           section_split_scores(queries, cand, pl, ds, n, avgdl).collect()}
    # doc 0 has 'apple' (pos 0) but not 'cherry' (pos 1)
    assert out[0]["sec0"] > 0 and out[0]["sec1"] == 0.0
    # doc 1 has 'cherry' but not 'apple'
    assert out[1]["sec0"] == 0.0 and out[1]["sec1"] > 0
    # query has 2 tokens -> sec2/sec3 are 0 everywhere
    assert out[0]["sec2"] == 0.0 and out[1]["sec3"] == 0.0
    # hand-check sec0 on doc 0: tf=2, dl=3, df(apple)=1, N=2, avgdl=2.5
    idf = np.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    tfp = (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert out[0]["sec0"] == pytest.approx(idf * tfp, rel=1e-9)


def test_entity_query_feature_is_text_plus_entity(spark):
    """addEntityQueries (KotlinRankLibTrainer.kt:82-94): per token, a
    SHOULD clause on BOTH fields — the explain value is the sum."""
    from engine.features import entity_query_scores
    from engine.indexer import collection_stats, doc_stats, postings_long
    from engine.search import bm25_scores, query_term_freqs

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "apple apple")], "query_id string, query string"
    )
    cand = spark.createDataFrame([("q1", 0)], "query_id string, doc_id long")
    pl = postings_long(docs)
    ds = doc_stats(docs)
    n, avgdl = collection_stats(ds).collect()[0]
    got = entity_query_scores(queries, cand, pl, ds, n, avgdl).collect()[0]
    text = bm25_scores(query_term_freqs(queries), pl, ds, n, avgdl) \
        .collect()[0]["score"]
    # entity field: tf=1, dl_e(doc0)=2 distinct tokens, avgdl_e=4/2=2
    idf = np.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    ent = 2 * idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.0))  # qtf=2
    assert got["entity_score"] == pytest.approx(text + ent, rel=1e-9)


def test_doc_bigram_field_reference_take(spark):
    """Per-doc bigram field (BigramAnalyzer.java:73): keeps
    floor(total_occurrences/10) distinct bigrams; short docs get an
    empty field."""
    from engine.textops import doc_bigram_field

    docs = spark.createDataFrame(
        [(0, "ababababababababababab"),   # 21 bigrams -> keep 2
         (1, "xy")],                       # 1 bigram  -> keep 0
        "doc_id long, text string",
    )
    rows = doc_bigram_field(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["bigram"])
    assert len(by_doc.get(0, set())) == 2
    assert 1 not in by_doc  # under 10 bigrams -> empty field
    assert by_doc[0] <= {"ab", "ba"}


def test_bigram_field_topk_matches_hand_bm25(spark):
    from engine.textops import bigram_field_topk, doc_bigram_field

    docs = spark.createDataFrame(
        [(i, ("spark merge " * 8) if i % 2 == 0 else ("window scan " * 8))
         for i in range(6)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "spark merge")], "query_id string, query string"
    )
    res = bigram_field_topk(docs, queries, k=3).collect()
    assert len(res) == 3
    # even docs carry the 'spark merge' bigrams -> they must win
    assert all(r["doc_id"] % 2 == 0 for r in res)
    assert [r["rank"] for r in sorted(res, key=lambda r: r["rank"])] == [1, 2, 3]


def test_byte_histogram_vectorized_matches_bincount(spark):
    from engine.multimodal import byte_histogram, synth_media

    docs = spark.createDataFrame(
        [(i, "x") for i in range(7)], "doc_id long, text string"
    )
    media = synth_media(docs)
    got = {r["media_id"]: r["histogram"]
           for r in byte_histogram(media).collect()}
    for r in media.collect():
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        want = np.bincount(arr >> 4, minlength=16)[:16].tolist()
        assert got[r["media_id"]] == want


def test_ann_recall_entry_is_green_shape(spark):
    import __spark_entry__ as e

    rows = e.q_embedding_ann_recall(spark, "/root/testdata/sf0.001").collect()
    # round 4 folded the fifth dedup family (embedding_near_dup) into
    # this entry as a second union-labeled path — both must be green
    assert sorted(r["path"] for r in rows) == ["near_dup", "rp_topk"]
    for r in rows:
        assert r["recall_ge_target"] is True, r
        assert r["exact_verify"] is True, r
