"""Tokenization (SURVEY.md T1).

Reference behavior: Lucene StandardAnalyzer — Unicode word-break
tokenize + lowercase + English stop-word removal — applied identically
at index time (LuceneIndexBuilder.java:34) and query time
(LuceneQueryBuilder.java:60-81, KotlinQueryRetriever.kt:39-49). The
same-analyzer invariant (index and query share one tokenizer) is load
bearing: a term only matches if both sides normalize it identically.

Spark-first design: one vectorized pandas UDF (Arrow-batched, no
per-row Python) shared by the index and query paths. The token spec is
deliberately SQL-expressible so the DuckDB oracle can replicate it
exactly:

    tokens(text) = [m for m in regexp_matches(lower(text), '[a-z0-9]+')
                    if m not in ENGLISH_STOP_WORDS]

ENGLISH_STOP_WORDS is Lucene's classic 33-word English stop set
(org.apache.lucene.analysis.en.EnglishAnalyzer#ENGLISH_STOP_WORDS_SET,
public constant since Lucene 1.x).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# Lucene's default English stop set (the one StandardAnalyzer used in 7.2.1).
ENGLISH_STOP_WORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with",
)
_STOP_SET = frozenset(ENGLISH_STOP_WORDS)

TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer core: Series[str] -> Series[list[str]].

    pandas .str ops run over the whole Arrow batch; the only Python-level
    loop is the per-match list comprehension inside findall, which is C
    level in CPython's re module.
    """
    lowered = texts.fillna("").str.lower()
    return lowered.apply(
        lambda s: [t for t in _TOKEN_RE.findall(s) if t not in _STOP_SET]
    )


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_series(texts)


def tokens_expr(text_col: str):
    """The SAME token spec as a pure JVM expression (regexp_extract_all
    + higher-order filter): stays inside whole-stage codegen with no
    Python round-trip — the hot-path variant for the 100 TB build.
    Equality with tokenize_udf is asserted in tests (the same-analyzer
    invariant extends to same-implementation-pair)."""
    raw = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")
    # null text -> [] (the pandas UDF's fillna('') behavior)
    return F.coalesce(
        F.filter(raw, lambda t: ~t.isin(*ENGLISH_STOP_WORDS)),
        F.array().cast("array<string>"),
    )


def with_tokens(df, text_col: str = "text", out_col: str = "tokens",
                use_udf: bool = False):
    """Append a tokens array column using the shared analyzer.

    Default is the JVM expression; use_udf=True routes through the
    Arrow-batched pandas UDF (identical output, kept for environments
    where the analyzer must run custom Python)."""
    col = tokenize_udf(F.col(text_col)) if use_udf else tokens_expr(text_col)
    return df.withColumn(out_col, col)


def stopword_sql_list() -> str:
    """The stop set as a SQL IN-list literal, for DuckDB oracle queries."""
    return ", ".join(f"'{w}'" for w in ENGLISH_STOP_WORDS)


def tokenize_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB SQL producing (id_col, term) long-form tokens — the oracle
    twin of ``with_tokens`` + explode. Must stay semantically identical to
    ``tokenize_series``."""
    return f"""
        SELECT {id_col}, term FROM (
            SELECT {id_col},
                   unnest(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')) AS term
            FROM {table}
        ) WHERE term NOT IN ({stopword_sql_list()})
    """
