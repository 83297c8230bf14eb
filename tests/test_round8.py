"""Round-5 fixes (VERDICT r4): qterm strategy gate (single-query p50
regression), warm serving, stream-ingest batched encode, zero-copy
codec buffers, and the ADVICE r4 codec robustness nits."""

from __future__ import annotations

import pytest

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from engine.postings import build_index, read_index

    out = str(tmp_path_factory.mktemp("r8_idx"))
    docs = spark.createDataFrame(
        [(i, f"apple banana {'fig ' * (i % 3)}cherry t{i % 7}", "en",
          "s", 30) for i in range(40)],
        DOC_SCHEMA,
    )
    build_index(spark, docs, out, n_shards=2, hot_df_threshold=10**9,
                n_salts=2)
    return read_index(spark, out)


def _res(spark, idx, qs, **kw):
    from engine.csearch import search_index

    return sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.rank)
        for r in search_index(spark, idx, qs, **kw).collect()
    )


@pytest.mark.parametrize("prune", [False, True])
def test_qterm_collect_gate_routes_identical(spark, small_index,
                                             monkeypatch, prune):
    """The round-4 p50 regression fix: search_index picks lazy in-plan
    qterm for small batches and collect-once for large ones
    (csearch.QTERM_COLLECT_MIN_QUERIES). The two routes must be
    score-identical — same rows, scores to 9 dp, ranks — on both the
    pruned and unpruned paths."""
    import engine.csearch as cs

    qs = spark.createDataFrame(
        [("q0", "apple fig"), ("q1", "banana t3"), ("q2", "cherry")],
        "query_id string, query string",
    )
    monkeypatch.setattr(cs, "QTERM_COLLECT_MIN_QUERIES", 10**9)
    lazy = _res(spark, small_index, qs, k=10, prune=prune)
    monkeypatch.setattr(cs, "QTERM_COLLECT_MIN_QUERIES", 0)
    collected = _res(spark, small_index, qs, k=10, prune=prune)
    assert lazy == collected
    assert len(lazy) > 0


def test_qterm_gate_thresholds(spark, small_index, monkeypatch):
    """Single queries stay on the lazy route at the default threshold
    (no dedicated collect job on the p50 path); the gate reads the
    module constant at call time so serving deployments can tune it."""
    import engine.csearch as cs

    assert 1 < cs.QTERM_COLLECT_MIN_QUERIES <= 1600
    one = spark.createDataFrame([("q0", "apple")],
                                "query_id string, query string")
    # both routes serve a single query correctly regardless of gate
    monkeypatch.setattr(cs, "QTERM_COLLECT_MIN_QUERIES", 0)
    a = _res(spark, small_index, one, k=5)
    monkeypatch.setattr(cs, "QTERM_COLLECT_MIN_QUERIES", 10**9)
    b = _res(spark, small_index, one, k=5)
    assert a == b and len(a) > 0
