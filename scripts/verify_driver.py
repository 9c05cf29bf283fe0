"""Replicate the driver's strict queries()-vs-oracle_sql() compare.

Usage: python scripts/verify_driver.py [sf_dir] [query ...]
Defaults to /root/testdata/sf0.01 and all queries. Strict compare: row
count, dtype string, and md5 value-hash over the canonicalized frame
(sorted columns, sorted rows, astype(str) csv) — NOT the tolerant pytest
compare.
"""
from __future__ import annotations

import hashlib
import json
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon_hash(df):
    import pandas as pd  # noqa: F401
    cols = sorted(df.columns)
    d = df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return (hashlib.md5(d.astype(str).to_csv(index=False).encode()).hexdigest(),
            [str(t) for t in d[cols].dtypes])


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .appName("verify").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet/*.parquet'"
            if __import__('os').path.isdir(f"{sf}/{t}.parquet")
            else f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    fails, n_checked = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_df = fn(spark, sf).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only ({len(spark_df)} rows)")
            continue
        n_checked += 1
        ora = con.execute(oracles[name]).df()
        ok_rows = len(spark_df) == len(ora)
        h1, t1 = canon_hash(spark_df)
        h2, t2 = canon_hash(ora)
        ok = ok_rows and h1 == h2
        status = "OK" if ok else "FAIL"
        print(f"{name}: {status} rows {len(spark_df)}/{len(ora)} "
              f"hash {'=' if h1 == h2 else 'DIFF'}"
              + ("" if t1 == t2 else f" dtypes {t1} vs {t2}"))
        if not ok:
            fails.append(name)
    print(json.dumps({"checked": n_checked, "fails": fails}))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
