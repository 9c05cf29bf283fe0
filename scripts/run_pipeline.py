#!/usr/bin/env python
"""spark-submit entry point: run the full dedup pipeline on a pages table.

    spark-submit --py-files dist/fastdup_spark.zip scripts/run_pipeline.py \
        --input /path/or/s3a/pages_parquet --work-dir /path/fd_run \
        [--threshold 0.85] [--cc-threshold 0.85] [--force]

On a cluster the master/executors come from spark-submit; locally it falls
back to local[*]. Prints the run summary JSON on completion.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet/iceberg path")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--cc-threshold", type=float, default=0.85)
    ap.add_argument("--shingle-k", type=int, default=9)
    ap.add_argument("--n-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--input-format", default="parquet",
                    help="parquet (default), iceberg, or warc")
    ap.add_argument("--store-shards", type=int, default=None,
                    help="hash-bucket count for the stage tables. Default "
                         "auto-scales with corpus size (~25k docs/shard, "
                         "pow2, capped 65536 — config.resolve_store_shards) "
                         "and persists in store_layout.json; override to "
                         "pin a layout")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fastdup_spark import FastdupSpark, PipelineConfig

    spark = SparkSession.builder.appName("fastdup-spark-pipeline").getOrCreate()
    cfg = PipelineConfig(
        threshold=args.threshold, cc_threshold=args.cc_threshold,
        shingle_k=args.shingle_k, n_perm=args.n_perm,
        lsh_bands=args.bands, lsh_rows=args.n_perm // args.bands,
        store_shards=args.store_shards,
    )
    fd = FastdupSpark(spark, args.work_dir, cfg)
    summary = fd.run(input_path=args.input, force=args.force,
                 input_format=args.input_format)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
