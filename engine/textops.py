"""Text-analysis operators for large-scale training-data pipelines.

Beyond reference parity (the reference is an IR system; these are the
corpus-hygiene ops a 100 TB ingest needs before indexing). All are
JVM-side column expressions / higher-order functions — no Python in the
hot path — and every one has a DuckDB-expressible twin for the
correctness gate.

Ops:
  token_counts      whitespace tokens + analyzer tokens + char count
  language_id       marker-token n-gram heuristic over a fixed profile
  quality_score     length / stopword-ratio / mean-word-length features
  fingerprint       min-hash of 5-token shingles (doc fingerprint for
                    near-dup candidate generation)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analysis import ENGLISH_STOP_WORDS, TOKEN_PATTERN, stopword_sql_list

# deterministic, tiny per-language marker profiles (n-gram heuristic —
# the classic stopword-profile language guesser, public method)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "is", "of", "to", "in", "that", "it"),
    "es": ("el", "la", "los", "las", "es", "que", "de", "un"),
    "fr": ("le", "la", "les", "est", "que", "une", "des", "dans"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai", "you", "ren"),
}
SHINGLE_K = 5


def _raw_tokens(text_col: str):
    """All word tokens, stopwords KEPT (language markers are stopwords)."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_ws_tokens, n_tokens): char count, whitespace
    split count, analyzer token count (stopwords removed)."""
    toks = _raw_tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(F.filter(toks, lambda t: ~t.isin(*ENGLISH_STOP_WORDS)))
        .cast("long").alias("n_tokens"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits): argmax of marker-token hits,
    deterministic tie-break by language code, 'und' when no marker hits."""
    toks = _raw_tokens(text_col)
    out = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    def marker_pred(markers):
        return lambda t: t.isin(*markers)

    hit_cols = []
    for lang in sorted(LANG_MARKERS):
        c = F.size(F.filter(F.col("_toks"), marker_pred(LANG_MARKERS[lang])))
        hit_cols.append(F.struct(c.cast("long").alias("hits"),
                                 F.lit(lang).alias("lang")))
    # array_max over struct(hits, lang) compares field-by-field: max
    # hits, ties broken by alphabetically-last lang code — the same
    # struct-comparison rule DuckDB's list_max applies in the oracle
    best = F.array_max(F.array(*hit_cols))
    return out.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, mean_token_len, quality):
    quality = 1/(1+exp(-(0.01*n_tokens + 2*stop_ratio - |mean_len-5|/5)))
    — a fixed, documented heuristic (logistic over simple signals)."""
    toks = _raw_tokens(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    n = F.size("_toks").cast("double")
    n_stop = F.size(F.filter(F.col("_toks"),
                             lambda t: t.isin(*ENGLISH_STOP_WORDS))).cast("double")
    tot_len = F.aggregate("_toks", F.lit(0.0),
                          lambda acc, t: acc + F.length(t).cast("double"))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    mean_len = F.when(n > 0, tot_len / n).otherwise(F.lit(0.0))
    raw = 0.01 * n + 2.0 * stop_ratio - F.abs(mean_len - 5.0) / 5.0
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6).alias("quality"),
    )


def shingles_expr(tokens_col, k: int = SHINGLE_K):
    """k-token shingles of an analyzer-token array, space-joined."""
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k))
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, fingerprint): min md5 over k-token shingles — a
    deterministic rolling-window document fingerprint; docs sharing it
    are near-dup candidates. Short docs (<k tokens) fall back to the
    md5 of the whole token stream."""
    from .analysis import with_tokens

    d = with_tokens(docs, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("tokens").alias("_toks")
    )
    sh = shingles_expr(F.col("_toks"), k)
    fp = F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: F.md5(s)))
    ).otherwise(F.md5(F.concat_ws(" ", "_toks")))
    return d.select("doc_id", fp.alias("fingerprint"))


# ----------------------------------------------------------- oracle SQL twins

def token_counts_sql(table: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               length(text)::BIGINT AS n_chars,
               len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_ws_tokens,
               len(list_filter(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'),
                               t -> t NOT IN ({stopword_sql_list()})))::BIGINT AS n_tokens
        FROM {table}
    """


def language_id_sql(table: str = "documents") -> str:
    struct_rows = []
    for lang in sorted(LANG_MARKERS, reverse=True):
        m = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        struct_rows.append(
            "{'hits': len(list_filter(toks, t -> t IN (" + m + ")))::BIGINT,"
            " 'lang': '" + lang + "'}"
        )
    arr = "[" + ", ".join(struct_rows) + "]"
    return f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks
            FROM {table}
        ), best AS (
            SELECT doc_id, list_max({arr}) AS b FROM t
        )
        SELECT doc_id,
               CASE WHEN b.hits > 0 THEN b.lang ELSE 'und' END AS lang_pred,
               b.hits AS lang_hits
        FROM best
    """


def quality_score_sql(table: str = "documents") -> str:
    return f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks
            FROM {table}
        ), m AS (
            SELECT doc_id,
                   len(toks)::DOUBLE AS n,
                   len(list_filter(toks, x -> x IN ({stopword_sql_list()})))::DOUBLE AS n_stop,
                   list_sum(list_transform(toks, x -> length(x)::DOUBLE)) AS tot_len
            FROM t
        )
        SELECT doc_id,
               n::BIGINT AS n_tokens,
               ROUND(CASE WHEN n > 0 THEN n_stop / n ELSE 0.0 END, 6) AS stop_ratio,
               ROUND(CASE WHEN n > 0 THEN tot_len / n ELSE 0.0 END, 6) AS mean_token_len,
               ROUND(1.0 / (1.0 + exp(-(0.01 * n
                     + 2.0 * (CASE WHEN n > 0 THEN n_stop / n ELSE 0.0 END)
                     - abs((CASE WHEN n > 0 THEN tot_len / n ELSE 0.0 END) - 5.0) / 5.0))), 6)
                   AS quality
        FROM m
    """


def fingerprint_sql(table: str = "documents", k: int = SHINGLE_K) -> str:
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'),
                               x -> x NOT IN ({stopword_sql_list()})) AS toks
            FROM {table}
        ), sh AS (
            SELECT doc_id,
                   list_transform(generate_series(1, greatest(len(toks) - {k - 1}, 0)),
                                  i -> md5(array_to_string(toks[i:i+{k - 1}], ' '))) AS fps,
                   toks
            FROM t
        )
        SELECT doc_id,
               CASE WHEN len(fps) > 0 THEN list_min(fps)
                    ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
        FROM sh
    """


# ------------------------------------------------- char bigrams (T3 / W5)

def char_bigrams_top(docs: DataFrame, top_fraction: float = 0.1,
                     text_col: str = "text") -> DataFrame:
    """Corpus-level frequent character bigrams (reference
    BigramAnalyzer.java:20-77): extract all char 2-grams, score each as
    p(bigram) / (p(c1)*p(c2)) (pointwise-mutual-information flavored),
    keep the top 10% by score (score desc, bigram asc tie-break).

    Deviation from reference (documented): BigramAnalyzer.java:54-55
    mixes charAt(0)/charAt(1) when counting monograms; we count the
    marginal char distribution over bigram slots correctly.
    Spark-side: explode + two hash aggs + a percent window, no UDFs."""
    bg = docs.select(
        F.explode(
            F.expr(f"transform(sequence(1, greatest(length({text_col}) - 1, 0)),"
                   f" i -> substring({text_col}, i, 2))")
        ).alias("bigram")
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt")).cache()
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    chars = (
        counts.select(F.explode(F.array(F.substring("bigram", 1, 1),
                                        F.substring("bigram", 2, 1))).alias("ch"),
                      F.col("cnt"))
        .groupBy("ch").agg(F.sum("cnt").alias("ch_cnt"))
    )
    ch_total = 2 * total
    c1 = chars.select(F.col("ch").alias("_c1"), F.col("ch_cnt").alias("c1_cnt"))
    c2 = chars.select(F.col("ch").alias("_c2"), F.col("ch_cnt").alias("c2_cnt"))
    scored = (
        counts.withColumn("_c1", F.substring("bigram", 1, 1))
        .withColumn("_c2", F.substring("bigram", 2, 1))
        .join(F.broadcast(c1), "_c1").join(F.broadcast(c2), "_c2")
        .withColumn(
            "score",
            F.round((F.col("cnt") / F.lit(float(total)))
                    / ((F.col("c1_cnt") / F.lit(float(ch_total)))
                       * (F.col("c2_cnt") / F.lit(float(ch_total)))), 6),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("bigram"))
    n_keep = max(1, int(counts.count() * top_fraction))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_keep)
        .select("bigram", "cnt", "score", F.col("rn").alias("rank"))
    )


def char_bigrams_top_sql(table: str = "documents",
                         top_fraction: float = 0.1) -> str:
    return f"""
        WITH bg AS (
            SELECT substring(text, i, 2) AS bigram
            FROM {table},
                 unnest(generate_series(1, greatest(length(text) - 1, 0))) AS g(i)
        ),
        counts AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram),
        total AS (SELECT sum(cnt) AS t, count(*) AS n_distinct FROM counts),
        chars AS (
            SELECT ch, sum(cnt) AS ch_cnt FROM (
                SELECT substring(bigram, 1, 1) AS ch, cnt FROM counts
                UNION ALL
                SELECT substring(bigram, 2, 1) AS ch, cnt FROM counts
            ) GROUP BY ch
        ),
        scored AS (
            SELECT c.bigram, c.cnt,
                   ROUND((c.cnt::DOUBLE / t.t)
                         / ((c1.ch_cnt::DOUBLE / (2 * t.t))
                            * (c2.ch_cnt::DOUBLE / (2 * t.t))), 6) AS score
            FROM counts c
            CROSS JOIN total t
            JOIN chars c1 ON substring(c.bigram, 1, 1) = c1.ch
            JOIN chars c2 ON substring(c.bigram, 2, 1) = c2.ch
        )
        SELECT bigram, cnt, score, rank FROM (
            SELECT bigram, cnt, score,
                   ROW_NUMBER() OVER (ORDER BY score DESC, bigram ASC) AS rank,
                   (SELECT greatest(1, (n_distinct * {top_fraction})::INT)
                    FROM total) AS n_keep
            FROM scored
        ) WHERE rank <= n_keep
    """
