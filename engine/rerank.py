"""Feature-based rerank layer (SURVEY.md section 2.9, 2.5 A6, 2.6 W3).

Reference: ranklib/KotlinRanklibFormatter.kt — per query the <=100 BM25
candidates get feature columns (BM25 passthrough, LM similarities,
string distances, ...), each normalized per query (ZSCORE / SUM /
LINEAR), multiplied by a trained weight, summed, and the TopDocs is
re-sorted by the new score (rerankQueries, :192-200). NaN/Inf features
are mapped to 0.0 (:172).

Spark mapping: every feature is a column; normalization is a
Window.partitionBy(query_id); the rerank is one more top-k window.

NOTE on ZSCORE (reproduced as-is for parity, SURVEY A6): the reference
"std" at KotlinRanklibFormatter.kt:117 is sqrt(sum((x-mean)^2)) —
MISSING the /n — so our zscore_norm uses the same un-normalized
denominator. A corrected variant is available via population=True.

LM scorers (KotlinRankLibTrainer.kt:101-114,199-212 uses Lucene
LMDirichletSimilarity / LMJelinekMercerSimilarity(0.5)):
  dirichlet(mu=2000):  qtf * max(0, ln(1 + tf/(mu*p(t|C))) + ln(mu/(dl+mu)))
  jelinek-mercer(l=.5): qtf * ln(1 + ((1-l)*tf/dl) / (l*p(t|C)))
  p(t|C) = ctf(t) / total_token_count   (collection language model)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MU = 2000.0
LAMBDA_JM = 0.5


def sanitize(col):
    """T11: NaN/Inf/null -> 0.0 (KotlinRanklibFormatter.kt:172)."""
    c = col.cast("double")
    bad = F.isnan(c) | c.isNull() | (F.abs(c) == float("inf"))
    return F.when(bad, F.lit(0.0)).otherwise(c)


def zscore_norm(df: DataFrame, value_col: str, by: str = "query_id",
                population: bool = False, out_col: str | None = None) -> DataFrame:
    """A6 ZSCORE over each query's candidate set. population=False
    reproduces the reference's missing-/n denominator verbatim."""
    out_col = out_col or f"{value_col}_z"
    w = Window.partitionBy(by)
    mean = F.avg(value_col).over(w)
    sq = F.sum(F.pow(F.col(value_col) - mean, F.lit(2.0))).over(w)
    denom = F.sqrt(sq / F.count(F.lit(1)).over(w)) if population else F.sqrt(sq)
    return df.withColumn(
        out_col,
        sanitize(F.when(denom > 0, (F.col(value_col) - mean) / denom)
                 .otherwise(F.lit(0.0))),
    )


def linear_norm(df: DataFrame, value_col: str, by: str = "query_id",
                out_col: str | None = None) -> DataFrame:
    """A6 LINEAR (min-max) per query."""
    out_col = out_col or f"{value_col}_mm"
    w = Window.partitionBy(by)
    mn, mx = F.min(value_col).over(w), F.max(value_col).over(w)
    return df.withColumn(
        out_col,
        sanitize(F.when(mx > mn, (F.col(value_col) - mn) / (mx - mn))
                 .otherwise(F.lit(0.0))),
    )


def sum_norm(df: DataFrame, value_col: str, by: str = "query_id",
             out_col: str | None = None) -> DataFrame:
    """A6 SUM: x / sum(x) per query."""
    out_col = out_col or f"{value_col}_s"
    w = Window.partitionBy(by)
    s = F.sum(value_col).over(w)
    return df.withColumn(
        out_col,
        sanitize(F.when(s != 0, F.col(value_col) / s).otherwise(F.lit(0.0))),
    )


def weighted_rerank(df: DataFrame, feature_weights: dict[str, float],
                    k: int = 100, by: str = "query_id",
                    doc_col: str = "doc_id") -> DataFrame:
    """W3: score = sum(w_i * feature_i) (features pre-normalized), then
    re-rank per query (score desc, doc_id asc)."""
    score = None
    for c, wgt in feature_weights.items():
        term = sanitize(F.col(c)) * F.lit(float(wgt))
        score = term if score is None else score + term
    scored = df.withColumn("rerank_score", score)
    w = Window.partitionBy(by).orderBy(F.desc("rerank_score"), F.asc(doc_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def alpha_blend(df: DataFrame, mix_col: str, base_col: str,
                alpha: float = 0.5) -> DataFrame:
    """W6 (KotlinTrainer.kt:83): score = mix*(1-a) + a*base."""
    return df.withColumn(
        "blend_score",
        sanitize(F.col(mix_col)) * F.lit(1.0 - alpha)
        + sanitize(F.col(base_col)) * F.lit(alpha),
    )


# --------------------------------------------------------------- LM scorers

def lm_scores(
    query_terms: DataFrame,
    postings: DataFrame,
    doc_stats_df: DataFrame,
    total_tokens: int,
    kind: str = "dirichlet",
    mu: float = MU,
    lam: float = LAMBDA_JM,
    terms: list[str] | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) under a language-model similarity.
    Same join topology as BM25 (broadcast query side, term-pruned
    postings scan) — only the score expression changes."""
    ctf = postings.groupBy("term").agg(F.sum("tf").alias("ctf"))
    if terms is None:
        terms = [r["term"] for r in query_terms.select("term").distinct().collect()]
    q = F.broadcast(
        query_terms.join(
            F.broadcast(ctf.where(F.col("term").isin(terms))), "term"
        ).withColumn("p_c", F.col("ctf").cast("double") / F.lit(float(total_tokens)))
    )
    hits = (
        postings.where(F.col("term").isin(terms))
        .join(q, "term")
        .join(doc_stats_df.select("doc_id", "dl"), "doc_id")
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    if kind == "dirichlet":
        per_term = F.greatest(
            F.lit(0.0),
            F.log(F.lit(1.0) + tf / (F.lit(mu) * F.col("p_c")))
            + F.log(F.lit(mu) / (dl + F.lit(mu))),
        )
    elif kind == "jelinek_mercer":
        per_term = F.log(
            F.lit(1.0)
            + (F.lit(1.0 - lam) * tf / dl) / (F.lit(lam) * F.col("p_c"))
        )
    else:
        raise ValueError(kind)
    return (
        hits.withColumn("term_score", F.col("qtf").cast("double") * per_term)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
