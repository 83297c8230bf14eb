"""Round-6 optimization tests: serving-route identity after the
action-count restructure (driver-side prune thresholds, df-passthrough
unpruned scoring), the warm stats-drift release (ADVICE r5 #1/#2), and
the bench headline-size canary."""

from __future__ import annotations

import pytest

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def r9_index(spark, tmp_path_factory):
    from engine.postings import build_index, read_index

    out = str(tmp_path_factory.mktemp("r9_idx"))
    # tie-heavy corpus: repeated docs produce equal scores so the
    # (score desc, doc_id asc) tie-break is exercised on every route
    docs = spark.createDataFrame(
        [(i, f"apple banana {'fig ' * (i % 3)}cherry t{i % 5}", "en",
          "s", 30) for i in range(60)],
        DOC_SCHEMA,
    )
    build_index(spark, docs, out, n_shards=2, hot_df_threshold=20,
                n_salts=2)
    return read_index(spark, out)


def _res(spark, idx, qs, **kw):
    from engine.csearch import search_index

    return sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.rank)
        for r in search_index(spark, idx, qs, **kw).collect()
    )


@pytest.mark.parametrize("decode_impl", ["arrow", "pandas"])
@pytest.mark.parametrize("round_dp", [None, 4])
def test_all_routes_rank_identical(spark, r9_index, round_dp, decode_impl,
                                   monkeypatch):
    """The round-6 restructure must keep every (prune x agg_impl)
    route rank-identical: unpruned join now scores from the decoded
    rows' own df column (no qterm at all), pruned computes its block
    thresholds driver-side from collected metadata, matmul feeds from
    the local qterm relation. Any driver-float slack in the pruning
    bounds may only widen the kept-block superset, never change
    results. Parametrized over BOTH decode kernel twins so the pandas
    df-passthrough variant stays covered."""
    import engine.csearch as cs

    monkeypatch.setattr(cs, "DECODE_IMPL", decode_impl)
    qs = spark.createDataFrame(
        [("q0", "apple fig"), ("q1", "banana t3 zzz_absent"),
         ("q2", "cherry cherry apple")],
        "query_id string, query string",
    )
    results = {
        (p, a): _res(spark, r9_index, qs, k=10, prune=p, agg_impl=a,
                     round_dp=round_dp)
        for p in (False, True) for a in ("join", "matmul")
    }
    base = results[(False, "join")]
    assert len(base) > 0
    for key, val in results.items():
        assert val == base, f"route {key} diverged"


def test_warm_drift_releases_persisted(spark, r9_index):
    """ADVICE r5 #1: when collection stats drift under a live warm
    index (maintenance landed), search_index must DROP the stale
    persisted postings and warm map — not just serve cold while the
    pre-maintenance bytes stay pinned in executor storage."""
    from engine.csearch import release_warm, warm_serving

    qs = spark.createDataFrame([("q0", "apple fig")],
                               "query_id string, query string")
    cold = _res(spark, r9_index, qs, k=10, prune=False)
    warm_serving(spark, r9_index, payload_cache="memory")
    try:
        assert "warm_persisted" in r9_index
        r9_index["n_docs"] += 1  # simulate a merge landing
        try:
            drifted = _res(spark, r9_index, qs, k=10, prune=False)
        finally:
            r9_index["n_docs"] -= 1
        # the stale warm state must be gone after the drifted call
        assert "warm_persisted" not in r9_index
        assert "warm_tmeta" not in r9_index
        assert len(drifted) > 0
        # and the index serves correctly cold afterwards
        assert _res(spark, r9_index, qs, k=10, prune=False) == cold
    finally:
        release_warm(r9_index)


def test_warm_null_tmeta_degrades(spark, r9_index):
    """ADVICE r5 #2: a warm tmeta row whose collected df/block_max is
    NULL (foreign or hand-edited index) must degrade like the cold
    join — no TypeError at query time, on any route."""
    from engine.csearch import release_warm, warm_serving

    qs = spark.createDataFrame([("q0", "apple fig")],
                               "query_id string, query string")
    cold = {p: _res(spark, r9_index, qs, k=10, prune=p)
            for p in (False, True)}
    warm_serving(spark, r9_index, payload_cache=None)
    try:
        r9_index["warm_tmeta"]["fig"] = (None, None)
        # both routes score from the payload rows' own df (the
        # degenerate warm row only affects pruning bounds, which
        # default to keep-all), so results must equal the COLD truth
        # exactly — no crash, no silently dropped term
        for p in (False, True):
            assert _res(spark, r9_index, qs, k=10, prune=p) == cold[p]
        assert len(cold[False]) > 0
    finally:
        release_warm(r9_index)


def test_bench_headline_bounded():
    """BENCH-artifact canary (round-5 verdict #1/#7): the compact
    scaling-evidence summary attached to the bench headline must stay
    bounded — file pointers + a few scalars per cell, never inlined
    payloads — so the emitted line always stays far below bench.py's
    6 KB degrade guard and parses as one JSON line."""
    import json

    import bench

    ev = bench.scaling_evidence()
    line = json.dumps(ev)
    assert len(line) < 4500, f"scaling evidence grew to {len(line)} chars"
    # every cell is flat: a file pointer plus scalar headline numbers
    for key, cell in ev.items():
        assert isinstance(cell, dict)
        for v in cell.values():
            assert not isinstance(v, (dict, list)), (
                f"{key} inlines a nested payload")
