"""Reference-parity extras: rerank/LM layer, graph ops, string ops,
run-file sink (SURVEY.md sections 2.3-2.9 circle items)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from engine.graph import (
    adjacency, doc_entity_edges, kl_divergence, normalize_dist, softmax,
    top_entities, total_variation, two_hop_mixture,
)
from engine.parity import jaccard_tokens, token_filter, underscore_to_space
from engine.rerank import alpha_blend, lm_scores, sanitize, weighted_rerank, zscore_norm
from engine.runfile import trec_lines, write_runfile
from engine.strsim import jaro_winkler


def test_zscore_reference_formula(spark):
    df = spark.createDataFrame(
        [("q", 1, 1.0), ("q", 2, 2.0), ("q", 3, 3.0)],
        ["query_id", "doc_id", "score"],
    )
    got = {r.doc_id: r.score_z for r in zscore_norm(df, "score").collect()}
    # mean 2, un-normalized "std" = sqrt(1+0+1) = sqrt(2)
    assert got[1] == pytest.approx(-1 / math.sqrt(2))
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(1 / math.sqrt(2))


def test_sanitize_and_blend(spark):
    df = spark.createDataFrame(
        [(1, float("nan"), 2.0), (2, float("inf"), 4.0), (3, 1.0, None)],
        ["doc_id", "mix", "base"],
    )
    got = {r.doc_id: r.blend_score
           for r in alpha_blend(df, "mix", "base", alpha=0.5).collect()}
    assert got[1] == pytest.approx(1.0)   # nan->0, 0.5*2
    assert got[2] == pytest.approx(2.0)   # inf->0, 0.5*4
    assert got[3] == pytest.approx(0.5)   # null base->0, 0.5*1


def test_weighted_rerank_order(spark):
    df = spark.createDataFrame(
        [("q", 1, 0.1, 0.9), ("q", 2, 0.9, 0.1), ("q", 3, 0.5, 0.5)],
        ["query_id", "doc_id", "f1", "f2"],
    )
    got = [r.doc_id for r in
           weighted_rerank(df, {"f1": 1.0, "f2": 0.1}, k=3)
           .orderBy("rank").collect()]
    assert got == [2, 3, 1]


def test_lm_dirichlet_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "spark window spark"), (1, "window merge")], ["doc_id", "text"]
    )
    from engine.indexer import doc_stats, postings_long

    pl, ds = postings_long(docs), doc_stats(docs)
    qt = spark.createDataFrame([("q", "spark", 1.0)],
                               "query_id string, term string, qtf double")
    total = 5
    res = {r.doc_id: r.score
           for r in lm_scores(qt, pl, ds, total, kind="dirichlet").collect()}
    mu, p_c = 2000.0, 2 / 5
    want = max(0.0, math.log(1 + 2 / (mu * p_c)) + math.log(mu / (3 + mu)))
    assert res[0] == pytest.approx(want, rel=1e-9)
    assert 1 not in res


def test_graph_mixture_sums_to_one(spark, documents):
    edges = doc_entity_edges(documents.limit(100))
    origins = spark.createDataFrame([("0",), ("1",)], ["origin"])
    dist = two_hop_mixture(edges, origins, n_steps=2)
    sums = {r.origin: r.s for r in
            dist.groupBy("origin").agg(F.sum("prob").alias("s")).collect()}
    for v in sums.values():
        assert v == pytest.approx(1.0, rel=1e-9)
    top = top_entities(dist, n=5)
    tsums = {r.origin: r.s for r in
             top.groupBy("origin").agg(F.sum("prob").alias("s")).collect()}
    for v in tsums.values():
        assert v == pytest.approx(1.0, rel=1e-9)


def test_kl_tvd_zero_for_identical(spark):
    p = spark.createDataFrame([("a", 0.5), ("b", 0.5)], ["key", "prob"])
    assert kl_divergence(p, p).collect()[0]["kl"] == pytest.approx(0.0)
    assert total_variation(p, p).collect()[0]["tvd"] == pytest.approx(0.0)
    q = spark.createDataFrame([("a", 1.0)], ["key", "prob"])
    tvd = total_variation(p, q).collect()[0]["tvd"]
    assert tvd == pytest.approx(0.5)  # |0.5-1| + |0.5-0| over 2


def test_softmax_sums_to_one(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("c", 3.0)], ["k", "v"])
    rows = softmax(df, "v").collect()
    assert sum(r.softmax for r in rows) == pytest.approx(1.0)
    by = {r.k: r.softmax for r in rows}
    assert by["c"] > by["b"] > by["a"]


def test_string_ops(spark):
    df = spark.createDataFrame([(1, "Foo_Bar 123 enwiki:Baz_Qux end")], ["i", "s"])
    out = token_filter(underscore_to_space(df, "s"), "s").collect()[0]["s"]
    assert "123" not in out and "enwiki:" not in out and "_" not in out
    assert "Foo Bar" in out

    jd = spark.createDataFrame([(1, "a b c", "b c d")], ["i", "x", "y"])
    assert jd.transform(lambda d: jaccard_tokens(d, "x", "y")).collect()[0][
        "jaccard"] == pytest.approx(0.5)


def test_jaro_winkler_known_values():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.961111, abs=1e-6)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.813333, abs=1e-6)
    assert jaro_winkler("", "") == 0.0
    assert jaro_winkler("same", "same") == 1.0


def test_runfile_sink(spark, tmp_path):
    res = spark.createDataFrame(
        [("q1", 7, 3.14159, 1), ("q1", 9, 2.5, 2)],
        ["query_id", "doc_id", "score", "rank"],
    )
    lines = [r.line for r in trec_lines(res).orderBy("line").collect()]
    assert lines[0] == "q1 Q0 7 1 3.1416 Lucene-BM25"
    out = str(tmp_path / "run")
    write_runfile(res, out)
    import glob

    files = glob.glob(out + "/part-*")
    assert len(files) == 1
    content = open(files[0]).read().strip().splitlines()
    assert content[0].startswith("q1 Q0 7 1")


def test_adjacency_sorted(spark):
    edges = spark.createDataFrame(
        [("1", "b"), ("1", "a"), ("2", "c"), ("1", "a")], ["src", "dst"]
    )
    got = {r.node: r.neighbors for r in adjacency(edges).collect()}
    assert got == {"1": ["a", "b"], "2": ["c"]}


def test_sessionize_gap_semantics(spark):
    from datetime import datetime

    from engine.events import sessionize

    rows = [
        (1, 10, datetime(2024, 1, 1, 0, 0)),
        (2, 10, datetime(2024, 1, 1, 0, 10)),   # same session (10 min)
        (3, 10, datetime(2024, 1, 1, 1, 0)),    # new session (50 min gap)
        (4, 20, datetime(2024, 1, 1, 0, 5)),    # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert got[1] == got[2] == "10#1"
    assert got[3] == "10#2"
    assert got[4] == "20#1"


def test_asof_join_semantics(spark):
    from datetime import datetime

    from engine.events import asof_join

    rows = [
        (1, 10, datetime(2024, 1, 1, 0, 0), "view"),
        (2, 10, datetime(2024, 1, 1, 0, 5), "purchase"),  # matches view 1
        (3, 10, datetime(2024, 1, 1, 0, 9), "view"),
        (4, 10, datetime(2024, 1, 1, 0, 10), "purchase"), # matches view 3
        (5, 20, datetime(2024, 1, 1, 0, 1), "purchase"),  # no prior view
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.event_id: r.asof_event_id for r in asof_join(df).collect()}
    assert got[2] == 1 and got[4] == 3 and got[5] is None
