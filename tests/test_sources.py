"""engine/sources.py — corpus source adapter (table-or-path, doc_id
derivation, lang filter pushdown)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.corpusgen import synth_corpus
from engine.sources import (
    CORPUS_COLUMNS,
    corpus_text_col,
    is_table_identifier,
    read_corpus,
)


def test_is_table_identifier():
    assert is_table_identifier("iceberg.code.repos")
    assert is_table_identifier("repos")
    assert not is_table_identifier("/data/corpus")
    assert not is_table_identifier("s3://bucket/corpus")
    assert not is_table_identifier("relative/dir")


def test_read_corpus_parquet_derives_doc_id(spark, tmp_path):
    p = str(tmp_path / "corpus")
    synth_corpus(spark, 50).drop("doc_id").write.parquet(p)
    df = read_corpus(spark, p)
    assert set(CORPUS_COLUMNS) <= set(df.columns)
    assert "doc_id" in df.columns
    # natural key (repo, path, commit) -> doc_id is deterministic & unique
    assert df.select("doc_id").distinct().count() == 50
    again = read_corpus(spark, p)
    assert (
        df.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    )


def test_read_corpus_keeps_existing_doc_id(spark, tmp_path):
    p = str(tmp_path / "corpus_id")
    synth_corpus(spark, 20).write.parquet(p)
    df = read_corpus(spark, p)
    # original ids 0..19 retained, not rehashed
    assert df.agg(F.max("doc_id")).collect()[0][0] == 19


def test_read_corpus_lang_filter_pushed_down(spark, tmp_path):
    p = str(tmp_path / "corpus_lang")
    synth_corpus(spark, 200).write.parquet(p)
    df = read_corpus(spark, p, langs=["python", "java"])
    assert df.select("lang").distinct().count() <= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan


def test_read_corpus_table_identifier(spark, tmp_path):
    synth_corpus(spark, 30).write.mode("overwrite").saveAsTable(
        "src_adapter_test"
    )
    try:
        df = read_corpus(spark, "src_adapter_test")
        assert df.count() == 30
        assert corpus_text_col(df) == "content"
    finally:
        spark.sql("DROP TABLE IF EXISTS src_adapter_test")


def test_corpus_text_col_driver_shape(documents):
    assert corpus_text_col(documents) == "text"
