"""Index build: corpus -> tf / doc_stats / collection_stats / postings.

Reference pipeline (SURVEY.md section 3.1): LuceneIndexBuilder.java:31-95
streams CBOR paragraphs, tokenizes with StandardAnalyzer, and feeds an
IndexWriter that maintains per-term sorted posting lists, per-doc norms
(doc length) and collection stats, committing every 10,000 docs.

Spark-first re-expression — everything is declarative DataFrame algebra
so Catalyst supplies column pruning, partial (map-side) aggregation,
AQE, and whole-stage codegen:

  corpus --tokenize(pandas UDF)--> tokens
         --posexplode + groupBy(doc,term).count--> postings_long (tf)
         --groupBy(doc).size--> doc_stats (exact dl, not Lucene's lossy
                                1-byte norm; documented deviation, SURVEY 7.1)
         --agg count/avg--> collection_stats (N, avgdl)
         --groupBy(term) encode--> postings (delta+varbyte, block-max)

Scale notes (100 TB / 10^12 files):
  * The only shuffles are the two aggregations (doc,term) and (term);
    both get map-side partial aggregation from Catalyst automatically.
  * The (term) aggregation is skew-prone (hot tokens like `def`,
    `import`): handled by an EXPLICIT range-salt split (north_rule) in
    build_postings_compressed, not just AQE — hot terms are encoded as
    per-salt partial lists and merged in a second, much smaller pass.
  * doc_id is a deterministic function of the row (or taken from the
    source table), never a driver-side counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analysis import with_tokens


def doc_stats(corpus: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", with_sha: bool = False) -> DataFrame:
    """Per-document length (post-analysis token count) — SURVEY A2.

    dl = number of tokens emitted by the analyzer (stopwords removed),
    matching what Lucene's norm counts. Optionally carries
    sha256(content) for the per-row content invariant (north_rule).
    """
    out = with_tokens(corpus, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.size("tokens").cast("long").alias("dl"),
        *([F.sha2(F.col(text_col), 256).alias("content_sha")] if with_sha else []),
    )
    return out


def postings_long(corpus: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Uncompressed long-form postings (term, doc_id, tf) — SURVEY A1.

    explode + hash aggregate; Catalyst does partial aggregation before
    the shuffle, so the shuffle volume is ~distinct(doc,term), not the
    raw token stream.
    """
    return (
        with_tokens(corpus, text_col)
        .select(F.col(id_col).alias("doc_id"), F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def term_df(postings: DataFrame) -> DataFrame:
    """Document frequency per term — SURVEY A2 (input to BM25 idf)."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def collection_stats(doc_stats_df: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl) — SURVEY A2.

    Matches Lucene: N = maxDoc(), avgdl = sumTotalTermFreq / maxDoc,
    i.e. docs with dl=0 still count in the denominator.
    """
    return doc_stats_df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )


def build_index(corpus: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> dict[str, DataFrame]:
    """One-call index build returning the three stats tables.

    The tokenize UDF runs once per output because each table is an
    independent plan; callers doing a full build should cache the
    tokenized projection themselves or use build_index_cached.
    """
    toks = with_tokens(corpus, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        "tokens",
    )
    pl = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    ds = toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("dl"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )
    return {
        "postings_long": pl,
        "doc_stats": ds,
        "collection_stats": collection_stats(ds),
    }
