"""The fixed "reference query set" (FIXTURES.md section 2).

Mirrors the reference's page/section queries: a query string is a flat
bag of words (page name + section headings concatenated,
LuceneQueryBuilder.java:120-125). The set is hardcoded — a pure
constant — so the Spark path and the DuckDB oracle embed the *same*
literals and rank-identity is well defined across rounds.

Covers the semantically interesting cases from SURVEY.md section 2.5 A3:
  q0000 rare single token        q0001 hot single token
  q0002 duplicate token (qtf=2)  q0003 all-stopword (empty after analysis)
  q0004 token absent from corpus q0005 rare+hot mix
plus 44 seeded 1-6 token mixes over the corpus vocabulary.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

REFERENCE_QUERIES: tuple[tuple[str, str], ...] = (
    ("q0000", "dup"),
    ("q0001", "spark"),
    ("q0002", "spark spark"),
    ("q0003", "a the"),
    ("q0004", "zzzunknown"),
    ("q0005", "dup spark"),
    ("q0006", "table spark merge query"),
    ("q0007", "window fast row merge table"),
    ("q0008", "value spark spark"),
    ("q0009", "filter"),
    ("q0010", "line customer line hash column merge"),
    ("q0011", "row table"),
    ("q0012", "sort"),
    ("q0013", "value merge fast order"),
    ("q0014", "merge line fast merge"),
    ("q0015", "slow window data scan order"),
    ("q0016", "part"),
    ("q0017", "customer batch filter"),
    ("q0018", "value part stream"),
    ("q0019", "sort fast spark sort"),
    ("q0020", "spark"),
    ("q0021", "column row customer"),
    ("q0022", "big vector window merge slow customer"),
    ("q0023", "merge order"),
    ("q0024", "column spark"),
    ("q0025", "key table sort"),
    ("q0026", "fast small"),
    ("q0027", "window group data fast"),
    ("q0028", "vector"),
    ("q0029", "column small batch"),
    ("q0030", "key scan"),
    ("q0031", "window slow big key"),
    ("q0032", "customer join slow"),
    ("q0033", "customer window query customer"),
    ("q0034", "vector hash agg key sort"),
    ("q0035", "small data table key"),
    ("q0036", "group group"),
    ("q0037", "sort"),
    ("q0038", "scan"),
    ("q0039", "big scan scan fast"),
    ("q0040", "part stream filter"),
    ("q0041", "row"),
    ("q0042", "query vector slow data column batch"),
    ("q0043", "join query query hash agg merge"),
    ("q0044", "big"),
    ("q0045", "window small"),
    ("q0046", "value"),
    ("q0047", "scan merge query row join"),
    ("q0048", "hash merge slow"),
    ("q0049", "batch merge row"),
)

QUERIES_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("query", StringType(), False),
    ]
)


def queries_df(spark: SparkSession):
    """The query set as a (tiny, broadcastable) DataFrame — SURVEY S2.

    Round 6: built as a true LocalRelation (engine.localrel) — collect
    is driver-only and joins/broadcasts over it launch no extra jobs,
    where the old RDD-backed createDataFrame cut 50 rows into 32
    slices and made every consumer pay a multi-task job (a cross join
    of two of them was a 1,024-task CartesianProduct)."""
    from .localrel import local_df

    return local_df(spark, list(REFERENCE_QUERIES),
                    "query_id string, query string")


def queries_sql_values(alias: str = "queries") -> str:
    """The same set as a DuckDB VALUES clause for oracle SQL."""
    rows = ", ".join(f"('{qid}', '{q}')" for qid, q in REFERENCE_QUERIES)
    return f"(VALUES {rows}) AS {alias}(query_id, query)"
