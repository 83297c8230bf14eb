"""Deterministic synthetic source-code corpus (FIXTURES.md section 1).

Shape fixed by BASELINE.json input_hint:
    (repo:string, path:string, commit:string, lang:string, content:string)
plus a derived doc_id. Every column is a pure function of (seed, row
index) built from JVM-side expressions (xxhash64 / sha2 / element_at) —
generation is distributed, reproducible, and costs no Python.

Content is pseudo-source assembled from a fixed keyword+identifier
vocabulary with a zipf-ish frequency skew (hot tokens like `def` /
`import` exercise the hot-term salt split; `rare<i>` identifiers give a
long tail), 20-400 tokens per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ("python", "java", "kotlin", "scala", "js", "go", "md")
EXT = {"python": "py", "java": "java", "kotlin": "kt", "scala": "scala",
       "js": "js", "go": "go", "md": "md"}

# vocabulary: hot code keywords first (zipf head), then identifiers
KEYWORDS = (
    "def class import return if else for while try except val var fun",
    "public static void int string new null this super match case object",
)
VOCAB: tuple[str, ...] = tuple(
    (" ".join(KEYWORDS)).split()
) + tuple(f"ident{i}" for i in range(200)) + tuple(f"rare{i}" for i in range(800))


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                 min_tokens: int = 20, max_tokens: int = 400,
                 vocab_size: int | None = None) -> DataFrame:
    """n_docs rows of (doc_id, repo, path, commit, lang, content).

    vocab_size: None (default) keeps the fixed ~1k-term vocabulary —
    the regime every existing gate/bench number was measured in.
    Setting it above len(VOCAB) extends the zipf tail with generated
    identifiers ('t<idx>') drawn log-uniformly over [1, vocab_size]
    (rank-r probability ~ 1/r, i.e. zipf(1)) — the LARGE-vocabulary
    regime (10^5-10^6 distinct terms) the tid-bucketed postings layout
    is designed for (round-3 judge item 2: at ~1k terms every bucket is
    touched by every batch, so hardlinked-bucket merges and pb pruning
    can't show their saving). Still pure JVM expressions, deterministic
    in (seed, doc_id)."""
    v = len(VOCAB)
    vocab_arr = F.array(*[F.lit(t) for t in VOCAB])
    lang_arr = F.array(*[F.lit(l) for l in LANGS])
    ext_arr = F.array(*[F.lit(EXT[l]) for l in LANGS])

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731

    n_tok = (F.pmod(h(F.col("doc_id")), F.lit(max_tokens - min_tokens + 1))
             + min_tokens).cast("int")
    # zipf-ish index: u in [0,1) -> floor(V^u) - 1 concentrates mass on
    # the head of the vocabulary
    def tok_at(j):
        if vocab_size and vocab_size > v:
            # finer u granularity (1e7): at V=10^6 the tail step
            # exceeds 1 token per u-quantum, so a 1e5 grid would cap
            # the distinct-term count an order of magnitude short
            u = (F.pmod(h(F.col("doc_id"), j), F.lit(10_000_000))
                 .cast("double") / F.lit(10_000_000.0))
            idx = F.least(
                F.floor(F.pow(F.lit(float(vocab_size)), u)).cast("int"),
                F.lit(vocab_size))
            return F.when(
                idx <= v, F.element_at(vocab_arr, idx)
            ).otherwise(F.concat(F.lit("t"), idx.cast("string")))
        u = (F.pmod(h(F.col("doc_id"), j), F.lit(100000)).cast("double")
             / F.lit(100000.0))
        idx = F.floor(F.pow(F.lit(float(v)), u)).cast("int")
        return F.element_at(vocab_arr, F.least(idx, F.lit(v)))

    lang_idx = (F.pmod(h(F.col("doc_id"), F.lit("lang")), F.lit(len(LANGS)))
                + 1).cast("int")
    content = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), n_tok), tok_at)
    )
    return df.select(
        "doc_id",
        F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string"),
                 F.lit("/repo"), (F.col("doc_id") % 101).cast("string")
                 ).alias("repo"),
        F.concat(F.lit("src/dir"), (F.col("doc_id") % 13).cast("string"),
                 F.lit("/file"), F.col("doc_id").cast("string"), F.lit("."),
                 F.element_at(ext_arr, lang_idx)).alias("path"),
        F.substring(F.sha2(F.concat(F.lit("commit-"),
                                    F.col("doc_id").cast("string")), 256),
                    1, 40).alias("commit"),
        F.element_at(lang_arr, lang_idx).alias("lang"),
        content.alias("content"),
    )


def synth_queries(spark: SparkSession, n_queries: int, seed: int = 7,
                  min_terms: int = 2, max_terms: int = 5,
                  vocab_size: int | None = None) -> DataFrame:
    """Deterministic (query_id, query) set drawn from the SAME zipf
    token distribution as synth_corpus, so query terms hit real
    posting lists with realistic head/tail skew — the serving-side
    input of the N->4N scaling protocol (a 50-query reference set is
    too small a job to measure scaling; this scales the batch). Pure
    JVM expressions, deterministic in (seed, query_id)."""
    v = len(VOCAB)
    vocab_arr = F.array(*[F.lit(t) for t in VOCAB])
    df = spark.range(n_queries).withColumnRenamed("id", "qid")
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731

    n_terms = (F.pmod(h(F.col("qid")), F.lit(max_terms - min_terms + 1))
               + min_terms).cast("int")

    def term_at(j):
        if vocab_size and vocab_size > v:
            u = (F.pmod(h(F.col("qid"), j), F.lit(10_000_000))
                 .cast("double") / F.lit(10_000_000.0))
            idx = F.least(
                F.floor(F.pow(F.lit(float(vocab_size)), u)).cast("int"),
                F.lit(vocab_size))
            return F.when(
                idx <= v, F.element_at(vocab_arr, idx)
            ).otherwise(F.concat(F.lit("t"), idx.cast("string")))
        u = (F.pmod(h(F.col("qid"), j), F.lit(100000)).cast("double")
             / F.lit(100000.0))
        idx = F.floor(F.pow(F.lit(float(v)), u)).cast("int")
        return F.element_at(vocab_arr, F.least(idx, F.lit(v)))

    return df.select(
        F.concat(F.lit("sq"), F.col("qid").cast("string")).alias("query_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), n_terms), term_at)
        ).alias("query"),
    )
