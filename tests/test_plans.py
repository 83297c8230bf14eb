"""Physical-plan shape assertions: the scale properties the engine
depends on must be visible in the optimized plan, not just hoped for."""

from __future__ import annotations

import pytest

from engine.csearch import search_index
from engine.postings import build_index, read_index
from engine.queries_set import queries_df
from engine.search import search_corpus


@pytest.fixture(scope="module")
def built(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planidx"))
    build_index(spark, documents, out, n_shards=2,
                hot_df_threshold=1000, n_salts=2)
    idx = read_index(spark, out)
    idx["out_dir"] = out
    return idx


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_filter_reaches_parquet_scan(spark, built):
    plan = _formatted(search_index(spark, built, queries_df(spark),
                                   k=10, prune=False))
    assert "PushedFilters" in plan
    # the IN list over query terms must be pushed into the scan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "In(term" in pushed and "spark" in pushed


def test_query_side_is_broadcast(spark, built):
    plan = _formatted(search_index(spark, built, queries_df(spark),
                                   k=10, prune=False))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # tiny query side must never SMJ


def test_topk_is_bounded_before_exchange(spark, built):
    """WindowGroupLimit must appear below the final exchange — the
    distributed analog of Lucene's bounded-heap TopScoreDocCollector."""
    plan = _plan(search_index(spark, built, queries_df(spark),
                              k=10, prune=False))
    assert "WindowGroupLimit" in plan


def test_partial_aggregation_before_shuffle(spark, documents):
    """The (query, doc) score sum must have a map-side partial agg."""
    plan = _plan(search_corpus(spark, documents, queries_df(spark), k=10))
    assert "partial_sum" in plan


def test_merge_never_broadcasts_term_tables(spark, built):
    """The merge joins dfs/term_dict on tid — both have one row PER
    DISTINCT TERM (10^8-10^9 rows at north-star scale), so the plan must
    not carry an unconditional broadcast hint. With auto-broadcast
    disabled (simulating a term table too big to broadcast), a hint
    would still force a BroadcastExchange — assert none appears."""
    from engine.postings import merge_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(merge_plan(spark, built["out_dir"], 10.0, 1000, 2))
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ngram_jaccard_never_broadcasts_doc_sizes(spark, documents):
    """`sizes` in ngram_jaccard_pairs has one row per document — same
    rule: no unconditional broadcast hint."""
    from engine.dedup import ngram_jaccard_pairs

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(ngram_jaccard_pairs(documents.limit(50), threshold=0.5))
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_rp_lsh_single_scan_of_embeddings(spark):
    """Bucket generation must read the embeddings source ONCE (array of
    per-table keys + explode), not once per table."""
    from engine.similarity import rp_lsh_topk

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(rp_lsh_topk(spark, emb, query_ids=[0, 1], k=3, n_tables=4))
    # a LocalTableScan per unionAll branch would appear 4+ times
    assert plan.count("LocalTableScan") <= 2


def test_scan_prunes_unused_columns(spark, built):
    """prune=False never reads the block metadata columns."""
    plan = _formatted(search_index(spark, built, queries_df(spark),
                                   k=10, prune=False))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    assert "block_last" not in scan_lines[0]
    assert "block_max" not in scan_lines[0]
