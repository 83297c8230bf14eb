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

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: input_hint column contract for source-code corpora
CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")

#: explicit catalog-table marker: read_corpus("table:db.repos") never
#: guesses — the identifier after the prefix goes straight to read.table
TABLE_PREFIX = "table:"


def is_table_identifier(src: str) -> bool:
    """Syntactically a catalog table identifier, not a filesystem path.

    Paths contain `/` (or a URI scheme); identifiers are dotted names
    like `iceberg.code.repos`. NOTE: a bare relative filename
    ('corpus.parquet') is syntactically ambiguous — read_corpus resolves
    the ambiguity by preferring the path interpretation when the path
    exists on the local filesystem, and callers can force either side
    with the ``table:`` prefix or a ``./`` path prefix.
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
    if src.startswith(TABLE_PREFIX):
        df = reader.table(src[len(TABLE_PREFIX):])
    elif os.path.exists(src):
        # an existing local path wins over the table interpretation even
        # when the name is separator-free ('corpus.parquet', 'data') —
        # routing those to read.table fails with TABLE_OR_VIEW_NOT_FOUND.
        # Absolutized because the JVM resolves relative paths against
        # ITS cwd, which need not match this process's.
        df = reader.parquet(os.path.abspath(src))
    elif not is_table_identifier(src):
        df = reader.parquet(src)
    else:
        df = reader.table(src)
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
