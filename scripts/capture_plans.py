#!/usr/bin/env python
"""Capture .explain('formatted') for the bench-timed queries into
plans/r07/<name>_<tag>.txt (tag=before/after). Plan capture only — no
timing claims; run bench_extra.py for numbers."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "exact_dup_groups", "ngram_jaccard_pairs", "minhash_lsh_dedup",
    "search_many", "lineitem_pricing_summary", "orders_per_nation",
    "top2_orders_per_customer", "cosine_to_query", "token_counts",
    "events_high_water", "semdedup", "dedup_cascade",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import __spark_entry__ as entrymod
    from fastdup_spark import get_spark

    spark = get_spark("fastdup-plans", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    qs = entrymod.queries()
    for name in NAMES:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
