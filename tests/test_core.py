"""Core engine tests: tokenizer, stats, BM25 rank-identity vs the
pure-pandas oracle (SURVEY.md section 5 items 1-2, 4)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.analysis import tokenize_series, with_tokens
from engine.indexer import build_index, collection_stats, doc_stats, postings_long, term_df
from engine.queries_set import REFERENCE_QUERIES, queries_df
from engine.search import query_term_freqs, search_corpus

from .oracle import bm25_topk, tokenize as oracle_tokenize


def test_tokenizer_matches_oracle_spec():
    texts = [
        "The quick BROWN fox, the fox!",
        "a the an and",          # all stopwords
        "",                       # empty
        None,                     # null
        "x1 y2 z3 def import",   # alphanumerics
        "CamelCase under_score dash-ed",
    ]
    got = tokenize_series(pd.Series(texts)).tolist()
    want = [oracle_tokenize(t) for t in texts]
    assert got == want
    assert got[0] == ["quick", "brown", "fox", "fox"]
    assert got[1] == []
    assert got[5] == ["camelcase", "under", "score", "dash", "ed"]


def test_tokenize_udf_spark(spark):
    df = spark.createDataFrame([(1, "The Quick fox"), (2, "a the")], ["doc_id", "text"])
    rows = {r.doc_id: r.tokens for r in with_tokens(df).collect()}
    assert rows[1] == ["quick", "fox"]
    assert rows[2] == []


MICRO = [
    (0, "spark window spark"),
    (1, "the spark merge"),
    (2, "window window window merge"),
    (3, "a the an"),  # dl = 0 after stopwords
]


def test_tf_df_dl_micro(spark):
    corpus = spark.createDataFrame(MICRO, ["doc_id", "text"])
    pl = {(r.term, r.doc_id): r.tf for r in postings_long(corpus).collect()}
    assert pl[("spark", 0)] == 2
    assert pl[("spark", 1)] == 1
    assert pl[("window", 2)] == 3
    assert pl[("merge", 2)] == 1
    assert ("the", 1) not in pl

    ds = {r.doc_id: r.dl for r in doc_stats(corpus).collect()}
    assert ds == {0: 3, 1: 2, 2: 4, 3: 0}

    dfs = {r.term: r.df for r in term_df(postings_long(corpus)).collect()}
    assert dfs == {"spark": 2, "window": 2, "merge": 2}

    n, avgdl = collection_stats(doc_stats(corpus)).collect()[0]
    assert n == 4
    assert avgdl == pytest.approx((3 + 2 + 4 + 0) / 4)


def test_query_term_freqs_qtf(spark):
    q = spark.createDataFrame([("q1", "spark spark merge"), ("q2", "a the")],
                              ["query_id", "query"])
    got = {(r.query_id, r.term): r.qtf for r in query_term_freqs(q).collect()}
    assert got == {("q1", "spark"): 2, ("q1", "merge"): 1}


def test_bm25_micro_hand_computed(spark):
    """Single-term query on the micro corpus, hand-checked numbers."""
    import math

    corpus = spark.createDataFrame(MICRO, ["doc_id", "text"])
    queries = spark.createDataFrame([("q1", "window")], ["query_id", "query"])
    res = search_corpus(spark, corpus, queries, k=10).collect()
    got = {r.doc_id: (r.score, r.rank) for r in res}

    n, avgdl = 4, 9 / 4
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def part(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[0][0] == pytest.approx(idf * part(1, 3), rel=1e-9)
    assert got[2][0] == pytest.approx(idf * part(3, 4), rel=1e-9)
    assert got[2][1] == 1 and got[0][1] == 2
    assert set(got) == {0, 2}


def test_rank_identity_vs_oracle(spark, documents):
    """Full reference query set on sf0.001: rank-identical top-k (k=10)."""
    docs = [(r.doc_id, r.text) for r in documents.select("doc_id", "text").collect()]
    golden = bm25_topk(docs, list(REFERENCE_QUERIES), k=10)

    res = search_corpus(spark, documents, queries_df(spark), k=10).collect()
    got = sorted((r.query_id, r.doc_id, r.score, r.rank) for r in res)
    want = sorted(golden)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert g[2] == pytest.approx(w[2], rel=1e-9), (g, w)


def test_empty_and_absent_queries(spark, documents):
    res = search_corpus(spark, documents, queries_df(spark), k=10)
    qids = {r.query_id for r in res.select("query_id").distinct().collect()}
    assert "q0003" not in qids  # all-stopword query: zero hits
    assert "q0004" not in qids  # absent token: zero hits
    assert "q0000" in qids      # rare token still matches


def test_content_sha_invariant(spark, documents):
    """north_rule: sha256(content) equality per row vs source."""
    import hashlib

    ds = doc_stats(documents, with_sha=True)
    joined = ds.join(documents.select("doc_id", "text"), "doc_id").collect()
    assert len(joined) == documents.count()
    for r in joined[:50]:
        assert r.content_sha == hashlib.sha256(r.text.encode()).hexdigest()


def test_jvm_expr_equals_udf_tokenizer(spark, documents):
    """The JVM tokens_expr and the pandas tokenize_udf must emit
    identical token arrays on real corpus text (same-analyzer invariant
    across implementations)."""
    from engine.analysis import with_tokens

    jvm = with_tokens(documents, use_udf=False).select("doc_id", "tokens")
    udf = with_tokens(documents, use_udf=True).select(
        "doc_id", F.col("tokens").alias("tokens_udf")
    )
    diff = jvm.join(udf, "doc_id").where(
        F.col("tokens") != F.col("tokens_udf")
    ).count()
    assert diff == 0


def test_jvm_expr_equals_udf_on_edge_cases(spark):
    from engine.analysis import with_tokens

    df = spark.createDataFrame(
        [(1, "The quick BROWN fox, the fox!"), (2, "a the an and"), (3, ""),
         (4, None), (5, "x1 y2 z3 def import"), (6, "Camel_Case dash-ed 123")],
        ["doc_id", "text"],
    )
    a = {r.doc_id: r.tokens for r in with_tokens(df, use_udf=False).collect()}
    b = {r.doc_id: r.tokens for r in with_tokens(df, use_udf=True).collect()}
    assert a == b
