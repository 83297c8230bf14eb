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
    return read_index(spark, out)


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


def test_scan_prunes_unused_columns(spark, built):
    """prune=False never reads the block metadata columns."""
    plan = _formatted(search_index(spark, built, queries_df(spark),
                                   k=10, prune=False))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    assert "block_last" not in scan_lines[0]
    assert "block_max" not in scan_lines[0]
