#!/usr/bin/env python
"""Incremental-update bench: quantify the shard-scoped write win.

Runs the pipeline on the first 90% of the bench corpus, then times
`fd.update()` of the remaining 10% — reporting update seconds, touched docs,
and how many shards of each derived table were actually rewritten — and
compares against a from-scratch run over the full corpus. Appends the block
to BENCH/BASELINE.md. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_incremental.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import CPUS, N_DOCS, SF_NAME, pages_path  # noqa: E402


def files_by_shard(store, stage):
    out = {}
    for x in store._parquet_lineage(store.table_path(stage)):
        shard, _, fn = x["file"].partition(os.sep)
        out.setdefault(shard, set()).add((fn, x["rows"]))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from fastdup_spark import FastdupSpark, get_spark

    n_docs = N_DOCS.get(SF_NAME, 100_000)
    pp = pages_path(n_docs)
    spark = get_spark("fastdup-bench-incr", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(pp).cache()
    # deterministic 90/10 split on url hash (the parquet fixture's warc_ts
    # is TIMESTAMP_NTZ, which ANSI mode refuses to cast to double)
    base = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) != 0)
    batch = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
    n_batch = batch.count()

    work = "/tmp/fd_bench_incr"
    shutil.rmtree(work, ignore_errors=True)
    fd = FastdupSpark(spark, work)
    t0 = time.time()
    fd.run(base, force=True)
    t_base = round(time.time() - t0, 2)

    stages = ["knn", "best_nn", "assignments", "component_info", "outliers"]
    before = {s: files_by_shard(fd.store, s) for s in stages}
    t0 = time.time()
    stats = fd.update(batch)
    t_update = round(time.time() - t0, 2)
    after = {s: files_by_shard(fd.store, s) for s in stages}
    total_shards = fd.n_shards  # config.store_shards may be None (auto-scale)
    rewritten = {}
    for s in stages:
        keys = set(before[s]) | set(after[s])
        rewritten[s] = sum(1 for k in keys
                           if before[s].get(k) != after[s].get(k))

    # tiny trickle batch (50 modified replicas of existing singleton-ish
    # pages): the regime where shard scoping shows — a handful of shards
    # rewritten out of store_shards
    tiny = (
        pages.orderBy("url").limit(50)
        .withColumn("url", F.concat(F.col("url"), F.lit("?trickle=1")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 90 days"))
    )
    before_t = {s: files_by_shard(fd.store, s) for s in stages}
    t0 = time.time()
    stats_t = fd.update(tiny)
    t_tiny = round(time.time() - t0, 2)
    after_t = {s: files_by_shard(fd.store, s) for s in stages}
    rewritten_t = {}
    for s in stages:
        keys = set(before_t[s]) | set(after_t[s])
        rewritten_t[s] = sum(1 for k in keys
                             if before_t[s].get(k) != after_t[s].get(k))

    # same trickle at production-style shard count (1024): rewritten shard
    # count collapses to ~|touched| — write volume is O(touched), not
    # O(corpus); the default 32 is sized for this sandbox's table sizes
    from fastdup_spark import PipelineConfig
    work_hs = "/tmp/fd_bench_incr_hs"
    shutil.rmtree(work_hs, ignore_errors=True)
    fd_hs = FastdupSpark(spark, work_hs, PipelineConfig(store_shards=1024))
    fd_hs.run(base, force=True)
    fd_hs.update(batch)
    before_h = {s: files_by_shard(fd_hs.store, s) for s in stages}
    t0 = time.time()
    stats_h = fd_hs.update(tiny)
    t_tiny_hs = round(time.time() - t0, 2)
    after_h = {s: files_by_shard(fd_hs.store, s) for s in stages}
    rewritten_h = {}
    for s in stages:
        keys = set(before_h[s]) | set(after_h[s])
        rewritten_h[s] = sum(1 for k in keys
                             if before_h[s].get(k) != after_h[s].get(k))

    # from-scratch comparison over the identical full corpus
    work2 = "/tmp/fd_bench_incr_full"
    shutil.rmtree(work2, ignore_errors=True)
    fd2 = FastdupSpark(spark, work2)
    t0 = time.time()
    fd2.run(pages, force=True)
    t_full = round(time.time() - t0, 2)

    lines = [
        f"incremental bench (n={n_docs}, local[{CPUS}]): base run (90%) "
        f"{t_base}s; update of {n_batch} docs {t_update}s "
        f"(touched {stats['touched_docs']} docs, {stats['new_pairs']} new "
        f"pairs); from-scratch over 100% {t_full}s "
        f"-> update = {t_update / t_full:.2f}x of a full rerun",
        f"10%-batch derived-table shards rewritten (of {total_shards}): "
        + ", ".join(f"{s}={rewritten[s]}" for s in stages)
        + " (a 10k-doc batch hashes into every shard — write volume is "
          "bounded by touched shards, which here is all of them)",
        f"50-doc trickle batch: {t_tiny}s, touched {stats_t['touched_docs']}"
        f" docs; shards rewritten (of {total_shards}): "
        + ", ".join(f"{s}={rewritten_t[s]}" for s in stages)
        + " — uniform hashing: |touched| docs cover ~N(1-(1-1/N)^|touched|)"
          " of N shards, so small N saturates",
        f"same trickle at store_shards=1024: {t_tiny_hs}s, touched "
        f"{stats_h['touched_docs']} docs; shards rewritten (of 1024): "
        + ", ".join(f"{s}={rewritten_h[s]}" for s in stages)
        + " — write volume is O(touched docs), not O(corpus)",
    ]
    for ln in lines:
        print(ln)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"\n## incremental-update bench (sf={SF_NAME})\n\n")
        for ln in lines:
            f.write(f"- {ln}\n")


if __name__ == "__main__":
    main()
