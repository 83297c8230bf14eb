"""Deletes + compaction (reference analog: Lucene
IndexWriter.deleteDocuments + liveDocs, then forceMergeDeletes).

Contract under test (engine/postings.py delete_docs /
compact_tombstones, engine/csearch.py search_index tombstone filter):

1. a tombstoned doc vanishes from results IMMEDIATELY, while the
   surviving docs keep their PRE-delete scores (collection stats and df
   still count the deleted docs — Lucene-parity) — pruned and unpruned
   serving agree;
2. compact_tombstones makes the index rank-AND-score identical to a
   from-scratch build over the surviving corpus, and clears the
   tombstones;
3. every crash window (before the journaled swap, inside it, after it
   but before the final merge) leaves a correct-serving index and a
   re-run finishes the job.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engine.csearch import search_index
from engine.postings import (
    build_index, compact_tombstones, delete_docs, load_manifest,
    read_index, read_tombstones,
)
from engine.queries_set import queries_df

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(df):
    return sorted(
        (r.query_id, r.doc_id, round(r.score, 9), r.rank) for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark, documents):
    return documents


@pytest.fixture()
def built(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, n_shards=4, hot_df_threshold=100,
                n_salts=4)
    return out


DELETED = lambda: F.col("doc_id") % 10 == 3  # noqa: E731 — 10% of docs


def test_delete_hides_docs_immediately_stats_unchanged(spark, corpus, built):
    """Lucene-liveDocs semantics: deleted docs disappear from results at
    once; survivors keep pre-delete scores (stats still count deleted
    docs); pruned == unpruned on the tombstoned index."""
    qdf = queries_df(spark)
    idx0 = read_index(spark, built)
    # full ranking over everything, before any delete
    full = search_index(spark, idx0, qdf, k=10**9, prune=False)
    full_rows = {(r.query_id, r.doc_id): r.score for r in full.collect()}

    victims = corpus.where(DELETED()).select("doc_id")
    n_victims = victims.count()
    assert n_victims > 0
    n = delete_docs(spark, built, victims)
    assert n == n_victims

    idx = read_index(spark, built)
    assert idx["tombstones"] is not None
    # stats unchanged until compaction (Lucene parity)
    assert idx["n_docs"] == idx0["n_docs"]
    assert idx["avgdl"] == idx0["avgdl"]

    got_unpruned = search_index(spark, idx, qdf, k=10, prune=False)
    got_pruned = search_index(spark, idx, qdf, k=10, prune=True)

    # oracle: drop victims from the FULL pre-delete ranking, re-rank by
    # (score desc, doc_id asc), take 10 — scores must be byte-identical
    victim_ids = {r.doc_id for r in victims.collect()}
    want = []
    by_q: dict[str, list] = {}
    for (q, d), s in full_rows.items():
        if d not in victim_ids:
            by_q.setdefault(q, []).append((s, d))
    for q, lst in by_q.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        want += [(q, d, round(s, 9), i + 1) for i, (s, d) in enumerate(lst[:10])]

    assert _rows(got_unpruned) == sorted(want)
    # the theta-safety property: pruning over a tombstoned index is
    # rank-identical to the unpruned plan (phase-1 theta is computed
    # over SURVIVORS, so no surviving doc can be pruned out)
    assert _rows(got_pruned) == sorted(want)


def test_delete_accepts_iterable_and_dedups(spark, corpus, built):
    n1 = delete_docs(spark, built, [3, 13, 3])
    assert n1 == 2
    # appending the same ids again is idempotent on the distinct count
    n2 = delete_docs(spark, built, [13, 23])
    assert n2 == 3
    tombs = read_tombstones(spark, built)
    assert sorted(r.doc_id for r in tombs.collect()) == [3, 13, 23]


def test_compact_equals_fresh_build_on_survivors(spark, corpus, built,
                                                 tmp_path):
    qdf = queries_df(spark)
    delete_docs(spark, built, corpus.where(DELETED()).select("doc_id"))
    m = compact_tombstones(spark, built, hot_df_threshold=100, n_salts=4)
    assert m["n_tombstones"] == 0
    assert m["compacted_removed"] > 0

    idx = read_index(spark, built)
    assert idx["tombstones"] is None

    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, corpus.where(~DELETED()), fresh_dir, n_shards=4,
                hot_df_threshold=100, n_salts=4)
    fidx = read_index(spark, fresh_dir)

    # collection stats re-baselined to the survivors
    assert idx["n_docs"] == fidx["n_docs"]
    assert idx["avgdl"] == pytest.approx(fidx["avgdl"], rel=1e-12)

    got = _rows(search_index(spark, idx, qdf, k=10, prune=True))
    want = _rows(search_index(spark, fidx, qdf, k=10, prune=True))
    assert got == want and got  # rank AND score identical, non-empty


def test_compact_noop_without_tombstones(spark, built):
    m0 = load_manifest(built)
    m = compact_tombstones(spark, built)
    assert m["stats"] == m0["stats"]
    assert "compact_pending" not in m


def test_compact_crash_before_merge_serves_correctly(spark, corpus, built,
                                                     monkeypatch, tmp_path):
    """Crash AFTER the journaled swap but BEFORE the re-baselining
    merge: tombstones still stand, so NO deleted doc is ever served, and
    pruned/unpruned serving stay rank-identical (the hybrid
    stats-refreshed-postings-old window is internally consistent); a
    re-run finishes compaction."""
    import engine.postings as P

    qdf = queries_df(spark)
    victims = {r.doc_id
               for r in corpus.where(DELETED()).select("doc_id").collect()}
    delete_docs(spark, built, corpus.where(DELETED()).select("doc_id"))

    class Boom(Exception):
        pass

    real_merge = P.merge_partials

    def boom(*a, **kw):
        raise Boom()

    monkeypatch.setattr(P, "merge_partials", boom)
    with pytest.raises(Boom):
        compact_tombstones(spark, built, hot_df_threshold=100, n_salts=4)
    monkeypatch.setattr(P, "merge_partials", real_merge)

    # tombstones still standing -> no deleted doc served, and the
    # hybrid window (stats already re-baselined, postings still old) is
    # internally consistent: pruned == unpruned
    idx = read_index(spark, built)
    assert idx["tombstones"] is not None
    got_p = _rows(search_index(spark, idx, qdf, k=10, prune=True))
    got_u = _rows(search_index(spark, idx, qdf, k=10, prune=False))
    assert got_p == got_u and got_p
    assert not any(d in victims for _, d, _, _ in got_p)

    # re-run finishes: equals a fresh build on the survivors
    compact_tombstones(spark, built, hot_df_threshold=100, n_salts=4)
    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, corpus.where(~DELETED()), fresh_dir, n_shards=4,
                hot_df_threshold=100, n_salts=4)
    got2 = _rows(search_index(spark, read_index(spark, built), qdf, k=10,
                              prune=True))
    want2 = _rows(search_index(spark, read_index(spark, fresh_dir), qdf,
                               k=10, prune=True))
    assert got2 == want2


def test_compact_crash_inside_swap_recovers(spark, corpus, built, tmp_path,
                                            monkeypatch):
    """Crash INSIDE the journaled rmtree+rename window: the journal
    entry + per-tmp _SUCCESS conditions make re-entry idempotent."""
    import engine.postings as P

    qdf = queries_df(spark)
    delete_docs(spark, built, corpus.where(DELETED()).select("doc_id"))

    real_swap = P._finish_compact_swap
    calls = {"n": 0}

    class Boom(Exception):
        pass

    def crashing_swap(out_dir):
        # simulate dying after the FIRST rename only
        calls["n"] += 1
        swaps = [("_compact_partials_tmp", "partials")]
        for tmp_name, final_name in swaps:
            tmp = os.path.join(out_dir, tmp_name)
            if os.path.exists(os.path.join(tmp, "_SUCCESS")):
                final = os.path.join(out_dir, final_name)
                import shutil as _sh

                _sh.rmtree(final, ignore_errors=True)
                os.rename(tmp, final)
        raise Boom()

    monkeypatch.setattr(P, "_finish_compact_swap", crashing_swap)
    with pytest.raises(Boom):
        compact_tombstones(spark, built, hot_df_threshold=100, n_salts=4)
    monkeypatch.setattr(P, "_finish_compact_swap", real_swap)

    # journal entry stands; re-entry finishes the remaining swaps and
    # the whole compaction
    assert load_manifest(built).get("compact_pending")
    compact_tombstones(spark, built, hot_df_threshold=100, n_salts=4)
    assert "compact_pending" not in load_manifest(built)
    assert load_manifest(built)["n_tombstones"] == 0

    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, corpus.where(~DELETED()), fresh_dir, n_shards=4,
                hot_df_threshold=100, n_salts=4)
    got = _rows(search_index(spark, read_index(spark, built), qdf, k=10,
                             prune=True))
    want = _rows(search_index(spark, read_index(spark, fresh_dir), qdf,
                              k=10, prune=True))
    assert got == want
