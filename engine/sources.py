"""Corpus source adapter: catalog tables (Iceberg et al.) or parquet paths.

The north-rule input is "an Iceberg table of source-code repositories
with columns (repo, path, commit, lang, content)" (BASELINE.json
input_hint). On a real cluster that table lives in a catalog and is read
with `spark.read.table("catalog.db.repos")` — Iceberg's Spark runtime
then provides snapshot isolation, time travel (`snapshot-id` /
`as-of-timestamp` reader options), hidden-partition pruning, and
metadata-level file skipping, all through the standard DataSourceV2
reader that Catalyst pushes filters/projection into.

This sandbox container has no Iceberg runtime jar or catalog, so tests
exercise the parquet path; the table path is the same code minus the
`format` branch — `read.table` is format-agnostic by design, which is
exactly why the adapter takes an identifier rather than shipping a
bundled catalog.

Reference parity: the reference opens its corpus via a paragraph-corpus
reader (jsr-lucene-project `LuceneIndexBuilder.java:35-60` iterates a
deserialized corpus stream); here the corpus is a table scan that
Catalyst can prune/push into, which is the Spark-first equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: input_hint column contract for source-code corpora
CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def is_table_identifier(src: str) -> bool:
    """A catalog table identifier, not a filesystem path.

    Paths contain `/` (or a URI scheme); identifiers are dotted names
    like `iceberg.code.repos`.
    """
    return "/" not in src and "\\" not in src and ":" not in src


def read_corpus(
    spark: SparkSession,
    src: str,
    options: dict[str, str] | None = None,
    langs: list[str] | None = None,
) -> DataFrame:
    """Read the corpus from a catalog table identifier or a parquet path.

    `options` are handed to the reader verbatim — for an Iceberg table
    that is where `snapshot-id` / `as-of-timestamp` (time travel) or
    `split-size` go; they are reader-level, so this adapter stays
    engine-agnostic.  `langs` applies a language filter that Catalyst
    pushes into the scan (partition/metadata pruning when the table is
    partitioned or sorted by lang — the natural layout for this corpus).

    Ensures a `doc_id` column: kept if present, else derived
    deterministically as xxhash64(repo, path, commit) — the natural key
    of the input_hint schema (one row per file version).
    """
    reader = spark.read
    if options:
        for k, v in options.items():
            reader = reader.option(k, v)
    if is_table_identifier(src):
        df = reader.table(src)
    else:
        df = reader.parquet(src)
    if langs:
        df = df.filter(F.col("lang").isin(langs))
    if "doc_id" not in df.columns:
        df = df.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
    return df


def corpus_text_col(df: DataFrame) -> str:
    """The text column under either corpus shape (input_hint `content`
    or driver-testdata `text`)."""
    if "content" in df.columns:
        return "content"
    if "text" in df.columns:
        return "text"
    raise ValueError(
        f"no content/text column in corpus schema {df.columns}"
    )
