"""TREC run-file sink (SURVEY.md K2).

Reference: LuceneQueryBuilder.java:142-153 writes
"<queryId> Q0 <paragraphId> <rank> <score> Lucene-BM25" per hit
(format at :150-151); the Kotlin variant KotlinQueryRetriever.kt:103-113
writes "<qid> Q<n> <pid> <rank> <score> Query".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RUN_TAG = "Lucene-BM25"


def trec_lines(results: DataFrame, tag: str = RUN_TAG) -> DataFrame:
    """(line) column in TREC run format from (query_id, doc_id, score,
    rank) results."""
    return results.select(
        F.format_string(
            "%s Q0 %s %d %.4f " + tag,
            "query_id", F.col("doc_id").cast("string"), "rank",
            F.col("score").cast("double"),
        ).alias("line")
    )


def write_runfile(results: DataFrame, path: str, tag: str = RUN_TAG) -> None:
    """Write a single TREC run file, globally ordered (query_id asc,
    rank asc). coalesce(1) is correct here: a run file is a small,
    human/trec_eval-consumed artifact, not a data table."""
    (
        trec_lines(results.orderBy("query_id", "rank"), tag)
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def ranklib_lines(features: DataFrame, feature_cols: list[str],
                  rel_col: str = "rel", qid_col: str = "query_id") -> DataFrame:
    """K3: RankLib training-file lines
    "<rel> qid:<q> 1:<f1> 2:<f2> ... # <doc_id>"
    (reference KotlinRanklibFormatter.kt:26-30,208-213)."""
    parts = [
        F.col(rel_col).cast("int").cast("string"),
        F.concat(F.lit("qid:"), F.col(qid_col)),
    ]
    for i, c in enumerate(feature_cols, start=1):
        # format_string('%.6f'), NOT format_number: the latter inserts
        # locale grouping separators ('1,234.500000') for |x| >= 1000,
        # corrupting the space-delimited RankLib format
        parts.append(F.concat(F.lit(f"{i}:"),
                              F.format_string("%.6f", F.col(c).cast("double"))))
    parts.append(F.concat(F.lit("# "), F.col("doc_id").cast("string")))
    return features.select(F.concat_ws(" ", *parts).alias("line"))
