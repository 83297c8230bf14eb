"""Small reference-parity operators (SURVEY.md sections 2.2-2.3, 2.7).

Each is a one-to-two-expression Spark mapping of a reference behavior;
kept in one module so the operator inventory is easy to audit:

  T2  query_construction   pageName + " " + headings concat
                           (LuceneQueryBuilder.java:120-125)
  T4  url_suffix           entity title = substring after last '/'
                           (EntityLinker.java:35-39)
  T5  underscore_to_space  (KotlinRankLibTrainer.kt:52)
  P3  token_filter         strip (\\d+|enwiki:) from query strings
                           (KotlinRankLibTrainer.kt:31-36; NB the sibling
                           KotlinQueryRetriever.kt:90-91 is buggy — it
                           substitutes the whole query per match; we
                           implement the intended filter)
  P4  dedup_query_ids      first-occurrence-wins queryId dedup
                           (LuceneQueryBuilder.java:182-184)
  P2  stored_field_lookup  docID -> stored fields via join
                           (LuceneQueryBuilder.java:145-146)
  S4  qrels scan / J5      qrel membership as a left join flag
                           (KotlinRanklibFormatter.kt:74-81,92)
  T6  jaccard_similarity   token-set Jaccard between two strings
                           (KotlinRankLibTrainer.kt:45-57; JaroWinkler
                           variant in strsim.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def query_construction(pages: DataFrame, name_col: str = "page_name",
                       heading_col: str = "headings") -> DataFrame:
    """T2: query string = page name + ' ' + section headings."""
    return pages.withColumn(
        "query", F.concat_ws(" ", F.col(name_col), F.col(heading_col))
    )


def url_suffix(df: DataFrame, url_col: str, out_col: str = "entity") -> DataFrame:
    """T4: substring after the last '/'."""
    return df.withColumn(out_col, F.substring_index(F.col(url_col), "/", -1))


def underscore_to_space(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """T5."""
    return df.withColumn(out_col or col, F.regexp_replace(F.col(col), "_", " "))


def token_filter(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """P3: strip digit-runs and 'enwiki:' markers from query strings."""
    return df.withColumn(
        out_col or col,
        F.trim(F.regexp_replace(F.col(col), r"(\d+|enwiki:)", "")),
    )


def dedup_query_ids(queries: DataFrame, id_col: str = "query_id") -> DataFrame:
    """P4/U1: keep the first occurrence of each queryId."""
    return queries.dropDuplicates([id_col])


def stored_field_lookup(results: DataFrame, documents: DataFrame,
                        fields: list[str]) -> DataFrame:
    """P2/J2: join results back to stored document fields."""
    return results.join(
        documents.select("doc_id", *fields), "doc_id"
    ).select("query_id", "rank", "doc_id", *fields)


def qrel_flags(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """J5: left join + coalesce(false) membership flag."""
    q = qrels.select("query_id", "doc_id", F.lit(True).alias("is_relevant"))
    return results.join(q, ["query_id", "doc_id"], "left").withColumn(
        "is_relevant", F.coalesce(F.col("is_relevant"), F.lit(False))
    )


def synthetic_qrels(documents: DataFrame, queries: DataFrame) -> DataFrame:
    """Deterministic stand-in qrels for the test corpus: (query, doc) is
    relevant iff md5(query_id||'|'||doc_id) starts with '0' (~1/16)."""
    return (
        queries.select("query_id")
        .crossJoin(documents.select("doc_id"))
        .where(F.md5(F.concat_ws("|", "query_id", F.col("doc_id").cast("string")))
               .startswith("0"))
        .withColumn("rel", F.lit(1))
    )


def jaccard_tokens(df: DataFrame, a_col: str, b_col: str,
                   out_col: str = "jaccard") -> DataFrame:
    """T6 (Jaccard variant): token-set Jaccard between two string
    columns, via array_intersect/array_union — no UDF."""
    ta = F.array_distinct(F.split(F.lower(F.col(a_col)), r"\s+"))
    tb = F.array_distinct(F.split(F.lower(F.col(b_col)), r"\s+"))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return df.withColumn(
        out_col,
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6),
    )


def read_qrels(spark, path: str):
    """S4: space-delimited qrel file scan -> (query_id, doc_id, rel)
    (reference KotlinRanklibFormatter.kt:74-81 splits on space, takes
    columns 0 and 2)."""
    raw = spark.read.csv(path, sep=" ")
    return raw.select(
        F.col("_c0").alias("query_id"),
        F.col("_c2").alias("doc_id"),
        F.coalesce(F.col("_c3").cast("int"), F.lit(1)).alias("rel"),
    )


def relevancy_ratio(results, qrels):
    """A8 (KotlinTrainer.kt:31-57): per query,
    min(score of relevant docs) - min(score of irrelevant docs); the
    global average of that gap is the trainer's objective."""
    flagged = qrel_flags(results, qrels)
    per_q = flagged.groupBy("query_id").agg(
        F.min(F.when(F.col("is_relevant"), F.col("score"))).alias("min_rel"),
        F.min(F.when(~F.col("is_relevant"), F.col("score"))).alias("min_irrel"),
    )
    return per_q.select(
        "query_id",
        (F.col("min_rel") - F.col("min_irrel")).alias("rel_gap"),
    )


def mixture_feature(dist, scores):
    """A5 (KotlinRankLibTrainer.kt:139-159): sinks[e] += prob * score
    over all candidates, normalized by the total — the per-entity score
    mixture. dist: (origin, entity, prob) where origin is a doc id;
    scores: (doc_id, score)."""
    j = dist.join(
        scores.select(F.col("doc_id").cast("string").alias("origin"), "score"),
        "origin",
    )
    sinks = j.groupBy("entity").agg(
        F.sum(F.col("prob") * F.col("score")).alias("mass")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    return sinks.select(
        "entity", (F.col("mass") / F.sum("mass").over(w)).alias("prob")
    )
