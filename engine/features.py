"""RankLib feature columns missing from round 1 (SURVEY.md section 2.9).

Two reference features, re-expressed as DataFrame algebra over the BM25
candidate set (the reference computes both per candidate list via
IndexSearcher.explain):

  section_split_scores   KotlinRankLibTrainer.kt:118-135 (sectionSplit):
      feature i = BM25 score of the SINGLE query token at position i
      (0-based, analyzer order, duplicates retained) against each
      candidate doc; 0.0 for every candidate when the query has fewer
      than i+1 tokens, 0.0 for a candidate that lacks the token (an
      explain() of a non-matching doc scores 0). Registered with
      secIndex 0..3 in querySplit (KotlinRankLibTrainer.kt:179-189).

  entity_query_scores    KotlinRankLibTrainer.kt:82-94 (addEntityQueries):
      one BooleanQuery with, per query token occurrence, a SHOULD
      TermQuery on the entity field AND a SHOULD TermQuery on the text
      field; the explain() value is the sum of both fields' BM25
      contributions. The entity-field stand-in on the documents table is
      the doc's distinct analyzer tokens (the same doc<->entity mapping
      engine/graph.py uses), so: per-value tf = 1, entity-field dl =
      distinct-token count, entity-field avgdl = sum(dl_e)/N, and the
      entity-field df equals the text df (distinct (term, doc) pairs).

Both are pure column math over the postings_long/doc_stats tables — no
UDFs — and each has an exact DuckDB oracle twin in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import B, K1
from .analysis import with_tokens
from .indexer import term_df
from .search import idf_expr, tf_part_expr


def _query_positional_tokens(queries: DataFrame, n_sections: int) -> DataFrame:
    """(query_id, pos, term) for pos < n_sections, analyzer token order
    (duplicates retained — positions are positions, not distinct terms)."""
    return (
        with_tokens(queries, "query")
        .select("query_id", F.posexplode("tokens").alias("pos", "term"))
        .where(F.col("pos") < n_sections)
    )


def section_split_scores(
    queries: DataFrame,
    candidates: DataFrame,
    postings: DataFrame,
    doc_stats_df: DataFrame,
    n_docs: int,
    avgdl: float,
    n_sections: int = 4,
) -> DataFrame:
    """(query_id, doc_id, sec0..sec{n-1}): per-candidate single-token
    BM25 features. candidates: (query_id, doc_id). postings: long-form
    (term, doc_id, tf)."""
    qsec = _query_positional_tokens(queries, n_sections)
    # prune the postings scan to the (tiny) set of section terms before
    # any join — same IN-list pushdown the BM25 path relies on; without
    # it the left join drags the full postings table through a shuffle
    sec_terms = sorted({r["term"] for r in qsec.select("term").distinct().collect()})
    if sec_terms:
        postings = postings.where(F.col("term").isin(sec_terms))
    dfs = term_df(postings)
    qmeta = F.broadcast(
        qsec.join(dfs, "term", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .withColumn("idf", idf_expr(n_docs))
    )
    pl = postings.select(
        F.col("term").alias("_pt"), F.col("doc_id").alias("_pd"),
        F.col("tf").alias("_tf"),
    )
    hits = (
        candidates.select("query_id", "doc_id")
        .join(qmeta, "query_id")
        .join(pl, (F.col("_pt") == F.col("term"))
              & (F.col("_pd") == F.col("doc_id")), "left")
        .join(doc_stats_df.select("doc_id", "dl"), "doc_id")
        .withColumn(
            "sec_score",
            F.when(
                F.col("_tf").isNotNull(),
                F.col("idf") * tf_part_expr(avgdl, tf_col="_tf"),
            ).otherwise(F.lit(0.0)),
        )
    )
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col("pos") == i, F.col("sec_score"))), F.lit(0.0)
        ).alias(f"sec{i}")
        for i in range(n_sections)
    ]
    return hits.groupBy("query_id", "doc_id").agg(*aggs)


def entity_query_scores(
    queries: DataFrame,
    candidates: DataFrame,
    postings: DataFrame,
    doc_stats_df: DataFrame,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """(query_id, doc_id, entity_score): the addEntityQueries feature —
    sum over query tokens (qtf-weighted) of text-field BM25 plus
    entity-field BM25 (entity stand-in = distinct tokens, tf=1)."""
    from .search import bm25_scores, query_term_freqs

    qt = query_term_freqs(queries)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    if not terms:
        return candidates.select(
            "query_id", "doc_id", F.lit(0.0).alias("entity_score")
        ).where(F.lit(False))

    text_part = bm25_scores(qt, postings, doc_stats_df, n_docs, avgdl,
                            terms=terms).withColumnRenamed("score", "_text")

    # entity field stats: dl_e = distinct-token count; avgdl_e over ALL
    # docs (matching the text-side convention, SURVEY 7.1 deviation note)
    e_dl = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dle"))
    sum_dle, = postings.agg(F.count(F.lit(1))).collect()[0]
    avgdl_e = float(sum_dle) / float(n_docs) if n_docs else 0.0

    dfs = term_df(postings)
    q = F.broadcast(
        qt.join(F.broadcast(dfs.where(F.col("term").isin(terms))), "term")
        .withColumn("idf", idf_expr(n_docs))
    )
    ent = (
        postings.where(F.col("term").isin(terms))
        .select("term", "doc_id")  # membership; entity tf is always 1
        .join(q, "term")
        .join(e_dl, "doc_id")
        .withColumn(
            "term_score",
            F.col("qtf").cast("double") * F.col("idf")
            * (F.lit(1.0 + K1))
            / (F.lit(1.0) + F.lit(K1) * (F.lit(1.0 - B)
               + F.lit(B) * F.col("dle").cast("double") / F.lit(avgdl_e))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("_ent"))
    )
    return (
        candidates.select("query_id", "doc_id")
        .join(text_part, ["query_id", "doc_id"], "left")
        .join(ent, ["query_id", "doc_id"], "left")
        .select(
            "query_id", "doc_id",
            (F.coalesce("_text", F.lit(0.0))
             + F.coalesce("_ent", F.lit(0.0))).alias("entity_score"),
        )
    )
