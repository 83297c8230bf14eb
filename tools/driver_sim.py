"""Simulate the driver's correctness gate locally.

Loads __spark_entry__, smoke-runs entry(spark), then for each queries()
entry runs the Spark DataFrame and the oracle_sql() through DuckDB on
the same parquet tables and compares row-count + column names +
order-insensitive values (floats canonicalized to 9 significant dp).

Usage: python tools/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    print("== entry() smoke ==")
    df = e.entry(spark)
    n = df.count()
    print(f"entry rows={n} schema={[f.name for f in df.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = [f.name for f in sdf.schema.fields]
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:>20}: rows-only (no oracle) rows={len(srows)}")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_n = len(srows) == len(orows)
        ok_vals = ok_cols and ok_n and rows_key(scols, srows) == rows_key(ocols, orows)
        status = "OK" if (ok_cols and ok_n and ok_vals) else "MISMATCH"
        print(f"{name:>20}: {status} rows={len(srows)}/{len(orows)} cols={scols}/{ocols}")
        if status != "OK":
            failures.append(name)
            if ok_cols and ok_n:
                a, b = rows_key(scols, srows), rows_key(ocols, orows)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diff:
                    print(f"   spark: {x}\n   duck : {y}")
    spark.stop()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
