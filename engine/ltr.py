"""In-engine rank-weight training (closing the reference's RankLib loop).

The reference never trains in-process: `ranklib_trainer` writes a
feature file, the external RankLib binary learns weights offline, and
the learned weights are pasted back as constants
(KotlinRankLibTrainer.kt:166,195-196; ranklib_method.md:35). This
module closes that train-then-apply loop inside the engine, over the
same gated feature columns, with two distributed trainers:

  fit_linear_weights    closed-form least squares via the normal
                        equations: ONE aggregation pass computes the
                        d x d cross-product sums (d = |features|, a
                        handful), the tiny system is solved driver-side.
                        Deterministic and engine-portable — for d = 2
                        the DuckDB oracle replays the identical closed
                        form, so the learned weights themselves are
                        hash-gated (driver entry `ranklib_trained`).
  coordinate_ascent     RankLib's own default ranker (Metzler & Croft,
                        "Linear feature-based models for information
                        retrieval", 2007): per-feature deterministic
                        line search directly maximizing MAP, weights
                        L1-renormalized after each feature pass. Every
                        candidate evaluation is one distributed MAP job
                        over the (cached) feature table — no RNG, no
                        driver-side data.

Scale notes: both trainers touch the driver with O(d) / O(1) scalars
only. fit_linear_weights is one shuffle-free aggregation regardless of
row count. coordinate_ascent runs `rounds x d x |grid|` MAP jobs; each
is a window + aggregation over (query_id, score, label) — at 10^9
candidate rows you run it on a per-query sample, which is exactly how
RankLib-on-one-box is used upstream of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def feature_cross_sums(feats: DataFrame, feature_cols: list[str],
                       label_col: str) -> dict[str, float]:
    """One aggregation pass: Σ f_i·f_j (i <= j) and Σ f_i·y, keyed
    's{i}{j}' / 'b{i}'."""
    aggs = []
    for i, ci in enumerate(feature_cols):
        for j, cj in enumerate(feature_cols):
            if i <= j:
                aggs.append(F.sum(F.col(ci) * F.col(cj)).alias(f"s{i}{j}"))
        aggs.append(F.sum(F.col(ci) * F.col(label_col)).alias(f"b{i}"))
    row = feats.agg(*aggs).collect()[0]
    return {k: float(row[k] or 0.0) for k in row.asDict()}


def fit_linear_weights(feats: DataFrame, feature_cols: list[str],
                       label_col: str = "y") -> list[float]:
    """Least-squares weights w = (XᵀX)⁻¹ Xᵀy over the feature columns
    (no intercept — an intercept never changes a per-query ranking).

    d == 2 uses the explicit 2x2 inverse (the exact arithmetic the SQL
    oracle twin replays); d > 2 solves with numpy. Raises on a singular
    system (features linearly dependent) rather than returning garbage.
    """
    s = feature_cross_sums(feats, feature_cols, label_col)
    d = len(feature_cols)
    if d == 2:
        det = s["s00"] * s["s11"] - s["s01"] * s["s01"]
        # RELATIVE singularity test (round-3 advisor: an absolute
        # threshold is scale-dependent — small-magnitude feature sums
        # get falsely flagged, huge ill-conditioned ones slip through):
        # det is a difference of two products, so compare it to their
        # magnitude
        scale = max(abs(s["s00"] * s["s11"]), s["s01"] * s["s01"])
        if det == 0 or abs(det) < 1e-12 * scale:
            raise ValueError("singular normal equations: features are "
                             "linearly dependent")
        return [
            (s["s11"] * s["b0"] - s["s01"] * s["b1"]) / det,
            (s["s00"] * s["b1"] - s["s01"] * s["b0"]) / det,
        ]
    import numpy as np

    a = np.empty((d, d))
    b = np.empty(d)
    for i in range(d):
        b[i] = s[f"b{i}"]
        for j in range(d):
            a[i, j] = s[f"s{i}{j}" if i <= j else f"s{j}{i}"]
    # condition number is scale-invariant, unlike det (round-3 advisor)
    cond = np.linalg.cond(a)
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError("singular normal equations: features are "
                         "linearly dependent (cond > 1e12)")
    return [float(w) for w in np.linalg.solve(a, b)]


def mean_average_precision(scored: DataFrame, score_col: str = "score",
                           label_col: str = "y",
                           by: str = "query_id",
                           id_col: str = "doc_id") -> float:
    """MAP over (query, doc, score, binary label): AP per query =
    Σ_k prec@k·rel_k / n_rel (queries with no relevant docs are
    excluded, the trec_eval convention); MAP = mean AP. One window +
    two aggregations, fully distributed."""
    w = Window.partitionBy(by).orderBy(F.desc(score_col), F.asc(id_col))
    ranked = scored.select(
        by, F.col(label_col).cast("double").alias("_y"),
        F.row_number().over(w).alias("_rk"),
    ).withColumn(
        "_cum", F.sum("_y").over(
            Window.partitionBy(by).orderBy("_rk")
            .rowsBetween(Window.unboundedPreceding, 0))
    )
    ap = (
        ranked.groupBy(by)
        .agg((F.sum(F.when(F.col("_y") > 0, F.col("_cum") / F.col("_rk"))
                    .otherwise(0.0))
              / F.sum("_y")).alias("_ap"),
             F.sum("_y").alias("_nrel"))
        .where(F.col("_nrel") > 0)
    )
    row = ap.agg(F.avg("_ap")).collect()[0][0]
    return float(row) if row is not None else 0.0


def ndcg_at_k(scored: DataFrame, k: int = 10, score_col: str = "score",
              label_col: str = "y", by: str = "query_id",
              id_col: str = "doc_id") -> float:
    """nDCG@k over (query, doc, score, graded label) — the metric real
    LTR tuning optimizes, completing the in-engine evaluation surface
    the reference delegated to trec_eval (README.md:64). Standard
    exponential-gain form: DCG@k = Σ_{i<=k} (2^rel_i - 1)/log2(i+1)
    over the score-ranked list; IDCG@k is the same sum over the
    label-ranked (ideal) list; nDCG = DCG/IDCG averaged over queries
    with IDCG > 0 (no-relevant queries are excluded, matching the
    mean_average_precision convention).

    Fully distributed: two windows (actual + ideal rank) + one
    aggregation; the driver sees one scalar."""
    base = scored.select(
        by, F.col(label_col).cast("double").alias("_y"),
        F.col(score_col).alias("_s"), F.col(id_col).alias("_id"),
    )
    w_act = Window.partitionBy(by).orderBy(F.desc("_s"), F.asc("_id"))
    w_idl = Window.partitionBy(by).orderBy(F.desc("_y"), F.asc("_id"))
    gain = lambda rk: (  # noqa: E731
        (F.pow(F.lit(2.0), F.col("_y")) - 1.0) / F.log2(rk + F.lit(1.0)))
    ranked = base.select(
        by,
        F.row_number().over(w_act).alias("_ra"),
        F.row_number().over(w_idl).alias("_ri"),
        "_y",
    )
    per_q = (
        ranked.groupBy(by)
        .agg(
            F.sum(F.when(F.col("_ra") <= k, gain(F.col("_ra")))
                  .otherwise(0.0)).alias("_dcg"),
            F.sum(F.when(F.col("_ri") <= k, gain(F.col("_ri")))
                  .otherwise(0.0)).alias("_idcg"),
        )
        .where(F.col("_idcg") > 0)
    )
    row = per_q.agg(F.avg(F.col("_dcg") / F.col("_idcg"))).collect()[0][0]
    return float(row) if row is not None else 0.0


def coordinate_ascent(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    by: str = "query_id",
    id_col: str = "doc_id",
    n_rounds: int = 2,
    steps: tuple[float, ...] = (0.05, 0.2, 0.5, 1.0),
    init: list[float] | None = None,
    metric: str = "map",
    ndcg_k: int = 10,
) -> tuple[list[float], float]:
    """Deterministic coordinate ascent on MAP (RankLib's default
    algorithm, reference ranklib_method.md:35 trains with it) or on
    nDCG@k (metric='ndcg' — the metric real LTR tuning typically
    targets): for each feature in turn try additive perturbations
    ±step (fixed grid, no RNG), keep the best-scoring weight,
    L1-renormalize after each feature pass. Returns (weights, metric
    value). The feature table is cached for the duration (every
    evaluation re-scans it).

    Both metrics are invariant under positive scaling of the weight
    vector, so the L1 renormalization never decreases the objective —
    with init given, the returned metric is >= the init weights'
    metric by construction (line-search moves are accept-if-better)."""
    if metric not in ("map", "ndcg"):
        raise ValueError(f"metric must be 'map' or 'ndcg', got {metric!r}")
    d = len(feature_cols)
    w = list(init) if init else [1.0 / d] * d
    feats = feats.select(by, id_col, label_col, *feature_cols).cache()

    def score_expr(ws):
        e = F.lit(0.0)
        for wi, c in zip(ws, feature_cols):
            e = e + F.lit(float(wi)) * F.col(c)
        return e

    def evaluate(ws):
        scored = feats.withColumn("_s", score_expr(ws))
        if metric == "ndcg":
            return ndcg_at_k(scored, ndcg_k, "_s", label_col, by, id_col)
        return mean_average_precision(scored, "_s", label_col, by, id_col)

    best = evaluate(w)
    try:
        for _ in range(n_rounds):
            for i in range(d):
                for step in steps:
                    for delta in (step, -step):
                        cand = list(w)
                        cand[i] += delta
                        m = evaluate(cand)
                        if m > best + 1e-12:
                            best, w = m, cand
                norm = sum(abs(x) for x in w)
                if norm > 0:
                    # MAP is scale-invariant in exact arithmetic, but
                    # sum(w_i/norm * f_i) is not bit-identical to
                    # s/norm, so a near-tie can flip rank under fp
                    # rounding; keep the renorm only when it doesn't
                    # lose, so the returned metric never drops below
                    # the tracked best (the monotonicity the
                    # ranklib_trained gate relies on)
                    cand = [x / norm for x in w]
                    m = evaluate(cand)
                    if m >= best:
                        w, best = cand, m
    finally:
        feats.unpersist()
    return w, best
