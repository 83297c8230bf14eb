"""Bipartite graph + distribution operators (SURVEY.md sections 2.4-2.7).

Reference: KotlinGraphBuilder.kt builds paragraph<->entity adjacency in
MapDB (space-joined ID strings, :56-61,73-82); KotlinGraphAnalyzer.kt
estimates a per-paragraph "mixture" distribution over entities by
Monte-Carlo random walks (200 walks x 3 steps, :109-165); GreenFunction
/ GraphAnalyzer add KL divergence (:388-396) and total-variation
distance (:69-75) between distributions.

Spark-first re-expression: the graph is an edges DataFrame; the MC
walk becomes the EXACT 2-hop transition computed by relational algebra
— mixture = P_de x P_ed (uniform transition probs 1/degree), iterated.
Monte Carlo was a single-node estimation hack; the exact product is
deterministic, testable, and scales as two equi-joins per step.
Distributions are long-form (key, prob) rows, never driver-side maps.

The doc<->entity stand-in on the test corpus: entity = analyzer token
(doc 'mentions' term), matching the reference's paragraph<->entity
bipartite shape with realistic fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .analysis import with_tokens


def doc_entity_edges(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(src, dst) distinct doc->entity edges (K4 analog)."""
    return (
        with_tokens(docs, text_col)
        .select(F.col(id_col).cast("string").alias("src"),
                F.explode("tokens").alias("dst"))
        .distinct()
    )


def adjacency(edges: DataFrame, direction: str = "out") -> DataFrame:
    """(node, neighbors sorted array) — the MapDB space-joined adjacency
    (KotlinDatabase.kt:11-22) as a proper array column (S5 analog)."""
    src, dst = ("src", "dst") if direction == "out" else ("dst", "src")
    return edges.groupBy(F.col(src).alias("node")).agg(
        F.sort_array(F.collect_set(dst)).alias("neighbors")
    )


def two_hop_mixture(edges: DataFrame, origins: DataFrame,
                    n_steps: int = 1) -> DataFrame:
    """(origin, entity, prob): exact doc->entity->doc->...->entity
    mixture distribution after n_steps 2-hop rounds, uniform transition
    probabilities (J4/A4, replacing the reference's 200x3 Monte Carlo).

    origins: DataFrame with a single column 'origin' (doc src ids).
    Each step: p(e | d) = 1/outdeg(d); p(d | e) = 1/indeg(e).
    The returned distribution is over entities reached from each origin.
    """
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("ideg"))
    fwd = edges.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("odeg")).alias("p_fwd")
    )
    bwd = edges.join(in_deg, "dst").select(
        "dst", "src", (F.lit(1.0) / F.col("ideg")).alias("p_bwd")
    )

    # current: (origin, node=doc, prob)
    cur = origins.select(
        F.col("origin").cast("string").alias("origin"),
        F.col("origin").cast("string").alias("node"),
        F.lit(1.0).alias("prob"),
    )
    dist = None
    for _ in range(n_steps):
        at_entity = (
            cur.join(fwd, cur["node"] == fwd["src"])
            .select("origin", F.col("dst").alias("entity"),
                    (F.col("prob") * F.col("p_fwd")).alias("prob"))
            .groupBy("origin", "entity")
            .agg(F.sum("prob").alias("prob"))
        )
        dist = at_entity
        cur = (
            at_entity.join(bwd, at_entity["entity"] == bwd["dst"])
            .select("origin", F.col("src").alias("node"),
                    (F.col("prob") * F.col("p_bwd")).alias("prob"))
            .groupBy("origin", "node")
            .agg(F.sum("prob").alias("prob"))
        )
    return dist.select("origin", "entity", F.col("prob").alias("prob"))


def top_entities(dist: DataFrame, n: int = 20) -> DataFrame:
    """W4: top-n entities per origin by prob, then renormalize
    (KotlinGraphAnalyzer.kt:151-162)."""
    w = Window.partitionBy("origin").orderBy(F.desc("prob"), F.asc("entity"))
    top = dist.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n)
    ws = Window.partitionBy("origin")
    return top.select(
        "origin", "entity",
        (F.col("prob") / F.sum("prob").over(ws)).alias("prob"),
    )


def normalize_dist(df: DataFrame, by: str, value_col: str = "prob") -> DataFrame:
    """T9: divide values by their per-group sum (transform_values analog)."""
    w = Window.partitionBy(by)
    return df.withColumn(value_col, F.col(value_col) / F.sum(value_col).over(w))


def kl_divergence(p: DataFrame, q: DataFrame, key: str = "key",
                  by: str | None = None, eps: float = 0.001) -> DataFrame:
    """T7 (GraphAnalyzer.java:388-396): sum p*ln(p / q.getOrDefault(k, eps)).
    p rows: (by?, key, prob); q rows: (key, prob). Left join keeps the
    reference's default-q semantics for keys absent from q."""
    qq = q.select(F.col(key), F.col("prob").alias("q_prob"))
    joined = p.join(qq, key, "left").withColumn(
        "q_prob", F.coalesce(F.col("q_prob"), F.lit(eps))
    )
    grp = [by] if by else []
    return joined.groupBy(*grp).agg(
        F.sum(F.col("prob") * F.log(F.col("prob") / F.col("q_prob"))).alias("kl")
    )


def total_variation(p: DataFrame, q: DataFrame, key: str = "key",
                    by: str | None = None) -> DataFrame:
    """T8 (GreenFunction.java:69-75): 0.5 * sum |p - q| over the key
    UNION (missing prob = 0 on either side).

    With ``by`` set, the key union is built per group: every (group,
    q-key) pair exists in the frame, so keys carrying q-mass but absent
    from that group's p contribute |0 - q| — the reference sums over the
    union of both key sets (GreenFunction.java:70-73), and a left join
    would silently understate the distance."""
    qq = q.select(F.col(key), F.col("prob").alias("q_prob"))
    if not by:
        pp = p.select(F.col(key), F.col("prob").alias("p_prob"))
        joined = pp.join(qq, key, "full_outer")
        grp = []
    else:
        pp = p.select(by, F.col(key), F.col("prob").alias("p_prob"))
        # per-group key union: (group x q-keys) full-outer p's own keys
        frame = p.select(by).distinct().crossJoin(qq.select(key)).join(
            pp, [by, key], "full_outer"
        )
        joined = frame.join(qq, key, "left")
        grp = [by]
    return joined.groupBy(*grp).agg(
        (F.sum(F.abs(F.coalesce(F.col("p_prob"), F.lit(0.0))
                     - F.coalesce(F.col("q_prob"), F.lit(0.0)))) / 2).alias("tvd")
    )


def softmax(df: DataFrame, value_col: str, by: str | None = None,
            out_col: str = "softmax") -> DataFrame:
    """T10 (KotlinTrainer.kt:180-185): exp(x)/sum(exp(x)), computed in
    shifted log-space (x - max) for overflow safety."""
    w = Window.partitionBy(*( [by] if by else [] ))
    shifted = F.exp(F.col(value_col) - F.max(value_col).over(w))
    return df.withColumn("_e", shifted).withColumn(
        out_col, F.col("_e") / F.sum("_e").over(w)
    ).drop("_e")
