"""Index-vs-source audit (engine/postings.verify_index, cli verify).

The north rule requires "content sha256 equality verified per row
against the source". test_core.py::test_content_sha_invariant pins that
at build time; verify_index is the OPS surface — re-checking a standing
index against the corpus after ingests/merges/compactions, as one
distributed full-outer join with only scalar counts at the driver.

Contract:
1. a freshly built index audits clean (ok, zero mismatches, matched ==
   n_source == n_index), with and without the dl recount;
2. a source row whose content changed after indexing -> sha_mismatch;
3. a source row the index never saw -> missing_in_index;
4. an index row absent from the source -> missing_in_source, NOT ok —
   unless that doc is tombstoned (a deliberate delete), which keeps
   the audit green and is counted separately.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.postings import build_index, delete_docs, verify_index


@pytest.fixture(scope="module")
def built(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("audit") / "idx")
    build_index(spark, documents, out, n_shards=4, hot_df_threshold=100,
                n_salts=4)
    return out


def test_clean_index_audits_ok(spark, documents, built):
    n = documents.count()
    r = verify_index(spark, built, documents, text_col="text")
    assert r["ok"]
    assert r["n_index"] == r["n_source"] == r["matched"] == n
    assert r["sha_mismatch"] == r["missing_in_index"] == 0
    assert r["missing_in_source"] == r["tombstoned"] == 0
    assert r["dl_mismatch"] is None


def test_clean_index_audits_ok_with_dl_recount(spark, documents, built):
    r = verify_index(spark, built, documents, text_col="text",
                     recount_dl=True)
    assert r["ok"] and r["dl_mismatch"] == 0


def test_changed_content_is_a_sha_mismatch(spark, documents, built):
    vic = documents.limit(1).select("doc_id").collect()[0].doc_id
    drifted = documents.withColumn(
        "text",
        F.when(F.col("doc_id") == vic,
               F.concat(F.col("text"), F.lit(" DRIFT"))).otherwise(
            F.col("text")))
    r = verify_index(spark, built, drifted, text_col="text")
    assert not r["ok"]
    assert r["sha_mismatch"] == 1
    assert r["matched"] == documents.count() - 1


def test_unindexed_source_row_is_missing_in_index(spark, documents, built):
    extra = spark.createDataFrame(
        [(10**12, "never indexed", "en", "synthetic", 13)],
        documents.schema)
    r = verify_index(spark, built, documents.unionByName(extra),
                     text_col="text")
    assert not r["ok"] and r["missing_in_index"] == 1


def test_index_only_doc_fails_unless_tombstoned(spark, documents, built):
    vic = documents.limit(1).select("doc_id").collect()[0].doc_id
    shrunk = documents.where(F.col("doc_id") != vic)
    r = verify_index(spark, built, shrunk, text_col="text")
    assert not r["ok"] and r["missing_in_source"] == 1
    # a deliberate delete of that doc makes the same shape legitimate
    delete_docs(spark, built, [int(vic)])
    r2 = verify_index(spark, built, shrunk, text_col="text")
    assert r2["ok"]
    assert r2["missing_in_source"] == 1 and r2["tombstoned"] == 1
