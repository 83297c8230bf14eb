"""spark-submit entry: build the inverted index over a source-code
corpus (BASELINE.md scaling protocol / north_rule spark-submit path).

    spark-submit --master local[8]  --py-files engine.zip \
        bench/build_index.py --corpus /path/to/corpus --out /path/to/index
    spark-submit --master local[32] --py-files engine.zip \
        bench/build_index.py --sf 0.1 --out /path/to/index

Either --corpus (a parquet path OR a catalog table identifier such as
`iceberg.code.repos` — see engine/sources.py) or --sf N (driver
testdata documents table) selects the input; --gen N synthesizes N docs
with engine.corpusgen first. --langs py,java filters languages with a
pushed-down scan predicate; --reader-option k=v passes reader options
through (Iceberg time travel: --reader-option snapshot-id=123).
Prints one JSON line with wall time, docs/sec, and the manifest
lineage summary.

Package engine.zip with:  python -m zipfile -c engine.zip engine/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus",
                    help="parquet path or catalog table id of the corpus")
    ap.add_argument("--langs", help="comma-separated lang filter")
    ap.add_argument("--reader-option", action="append", default=[],
                    metavar="K=V", help="reader option (repeatable)")
    ap.add_argument("--sf", help="driver testdata scale factor, e.g. 0.1")
    ap.add_argument("--gen", type=int, help="synthesize N docs instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--hot-df", type=int, default=1 << 17)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bm25-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from engine.postings import build_index, load_manifest

    if args.gen:
        from engine.corpusgen import synth_corpus

        docs = synth_corpus(spark, args.gen)
        id_col, text_col = "doc_id", "content"
    elif args.corpus:
        from engine.sources import corpus_text_col, read_corpus

        bad = [kv for kv in args.reader_option if "=" not in kv]
        if bad:
            raise SystemExit(f"--reader-option must be K=V, got: {bad}")
        opts = dict(kv.split("=", 1) for kv in args.reader_option)
        docs = read_corpus(
            spark, args.corpus, options=opts or None,
            langs=args.langs.split(",") if args.langs else None,
        )
        id_col = "doc_id"
        text_col = corpus_text_col(docs)
    else:
        docs = spark.read.parquet(f"/root/testdata/sf{args.sf}/documents.parquet")
        id_col, text_col = "doc_id", "text"

    n = docs.count()
    t0 = time.time()
    build_index(spark, docs, args.out, n_shards=args.shards,
                hot_df_threshold=args.hot_df, n_salts=args.salts,
                id_col=id_col, text_col=text_col)
    wall = time.time() - t0
    m = load_manifest(args.out)
    print(json.dumps({
        "n_docs": n,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n / wall, 1),
        "n_postings": sum(s.get("n_postings", 0) for s in m["shards"].values()),
        "shards_ok": sum(1 for s in m["shards"].values() if s["status"] == "ok"),
        "merged": m["merged"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
