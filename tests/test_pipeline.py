"""Training-data pipeline ops: dedup, similarity, textops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.dedup import (
    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash,
    simhash_near_pairs,
)
from engine.similarity import cosine_topk, rp_lsh_topk
from engine.textops import fingerprint, language_id, quality_score, token_counts


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "spark window merge table column vector stream value data small"),
        (1, "spark window merge table column vector stream value data small"),  # exact dup of 0
        (2, "spark window merge table column vector stream value data big"),    # near dup of 0
        (3, "join filter group hash customer sort order slow line part"),
        (4, "join filter group hash customer sort order slow line fast"),       # near dup of 3
        (5, "key query scan batch row agg the a key query scan batch"),
        (6, "completely different words entirely unrelated content here now"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, dup_docs):
    got = {r.doc_id: (r.canonical_id, r.is_dup) for r in exact_dedup(dup_docs).collect()}
    assert got[0] == (0, False)
    assert got[1] == (0, True)
    assert got[2] == (2, False)


def test_ngram_jaccard(spark, dup_docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(dup_docs, threshold=0.5, k=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (3, 4) in pairs
    assert not any(6 in p for p in pairs)


def test_minhash_lsh_finds_near_dups(spark, dup_docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in minhash_lsh_pairs(dup_docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    # LSH candidates must never report pairs below the verify threshold
    assert all(j >= 0.5 for j in pairs.values())


def test_simhash_hamming(spark, dup_docs):
    sigs = {r.doc_id: r.simhash for r in simhash(dup_docs).collect()}
    assert sigs[0] == sigs[1]  # identical text -> identical signature
    ham02 = bin(sigs[0] ^ sigs[2]).count("1")
    ham06 = bin(sigs[0] ^ sigs[6]).count("1")
    assert ham02 < ham06  # near-dup closer than unrelated

    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in simhash_near_pairs(dup_docs, max_hamming=6).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_pigeonhole_complete(spark, documents):
    """Bucketed candidate generation finds every pair an all-pairs scan
    finds (hamming <= 3 must share one of four 12-bit chunks)."""
    sub = documents.limit(120)
    sigs = {r.doc_id: r.simhash for r in simhash(sub).collect()}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                want.add((a, b))
    got = {(r.doc_a, r.doc_b)
           for r in simhash_near_pairs(sub, max_hamming=3).collect()}
    assert got == want


@pytest.fixture(scope="module")
def embeddings(spark):
    import os
    return spark.read.parquet(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
        + "/embeddings.parquet"
    )


def test_cosine_topk_matches_numpy(spark, embeddings):
    import numpy as np

    rows = embeddings.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    qids = [0, 1, 2]
    got = cosine_topk(embeddings, qids, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos))
    for q in qids:
        sims = []
        qv = vecs[q]
        for vid, v in vecs.items():
            if vid == q:
                continue
            c = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            sims.append((round(c, 6), -vid))
        sims.sort(reverse=True)
        want = [(-d, c) for c, d in sims[:5]]
        have = [(vid, c) for _, vid, c in sorted(by_q[q])]
        assert [v for v, _ in have] == [v for v, _ in want]
        for (v1, c1), (v2, c2) in zip(have, want):
            assert c1 == pytest.approx(c2, abs=2e-6)


def test_rp_lsh_recall_on_clustered_data(spark):
    """LSH ANN recall@5 vs brute force on data WITH neighbor structure
    (clusters); isotropic random vectors have no recoverable neighbors."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(30):
        center = rng.normal(size=16)
        center /= np.linalg.norm(center)
        for _ in range(8):
            v = center + 0.15 * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [0, 8, 16, 24, 32, 40]
    exact = cosine_topk(df, qids, k=5).collect()
    approx = rp_lsh_topk(spark, df, qids, k=5).collect()
    ex = {(r.query_id, r.vec_id) for r in exact}
    ap = {(r.query_id, r.vec_id) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, recall


def test_rp_lsh_sane_on_random_data(spark, embeddings):
    """On the random embeddings table the ANN result must still be a
    valid ranking: scores sorted desc, no self matches, <= k rows."""
    qids = [0, 1, 2]
    res = rp_lsh_topk(spark, embeddings, qids, k=5).collect()
    by_q = {}
    for r in res:
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
    for q, rows in by_q.items():
        rows.sort()
        assert len(rows) <= 5
        assert all(rows[i][1] >= rows[i + 1][1] for i in range(len(rows) - 1))


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "The quick fox the end")], ["doc_id", "text"])
    r = token_counts(df).collect()[0]
    assert r.n_chars == 21 and r.n_ws_tokens == 5 and r.n_tokens == 3


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "el la los que es un gato"), (2, "the and is of it"),
         (3, "xyz qqq www")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got[1] == "es" and got[2] == "en" and got[3] == "und"


def test_quality_and_fingerprint(spark, dup_docs):
    q = {r.doc_id: r for r in quality_score(dup_docs).collect()}
    assert all(0.0 <= r.quality <= 1.0 for r in q.values())
    assert q[5].stop_ratio > 0  # contains 'the a'
    fp = {r.doc_id: r.fingerprint for r in fingerprint(dup_docs).collect()}
    assert fp[0] == fp[1]        # identical docs -> identical fingerprint
    assert fp[0] != fp[6]
    assert all(len(v) == 32 for v in fp.values())
