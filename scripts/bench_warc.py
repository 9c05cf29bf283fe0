#!/usr/bin/env python
"""WARC-ingest bench (round-3 verdict item #10): run the same n-page corpus
through the FULL pipeline from (a) parquet pages and (b) gzipped WARC
archives (the Common Crawl layout), and append the ingest-overhead delta to
BENCH/BASELINE.md. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_warc.py

Trials are min-of-2 (host noise ~2x, CLAUDE.md)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import CPUS, N_DOCS, SF_NAME, pages_path  # noqa: E402


def warc_path(n_docs: int) -> str:
    """The bench pages corpus re-materialized as sharded .warc.gz files
    (cached; delete the dir to regenerate)."""
    out = f"/tmp/fastdup_bench_warc_{n_docs}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        from fastdup_spark.fixtures.warc import write_warc_files
        pages = pq.read_table(pages_path(n_docs)).to_pandas()
        write_warc_files(pages, out, records_per_file=1000, gzip_members=True)
        open(marker, "w").close()
    return out


def timed_run(spark, work: str, **kwargs) -> float:
    import shutil

    from fastdup_spark import FastdupSpark
    shutil.rmtree(work, ignore_errors=True)
    fd = FastdupSpark(spark, work)
    t0 = time.time()
    fd.run(force=True, **kwargs)
    return round(time.time() - t0, 2)


def main() -> None:
    from fastdup_spark import get_spark

    n_docs = N_DOCS.get(SF_NAME, 100_000)
    pp = pages_path(n_docs)
    wp = warc_path(n_docs)

    spark = get_spark("fastdup-bench-warc", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    parquet_trials, warc_trials = [], []
    for i in range(2):
        pages = spark.read.parquet(pp)
        parquet_trials.append(timed_run(spark, f"/tmp/fd_warcbench_p{i}",
                                        pages=pages))
        warc_trials.append(timed_run(spark, f"/tmp/fd_warcbench_w{i}",
                                     input_path=wp, input_format="warc"))
    tp, tw = min(parquet_trials), min(warc_trials)
    line = (f"WARC-ingest bench (n={n_docs}, local[{CPUS}]): parquet input "
            f"{tp}s (trials {parquet_trials}), .warc.gz input {tw}s "
            f"(trials {warc_trials}), ingest overhead "
            f"{tw - tp:+.2f}s ({(tw / tp - 1) * 100:+.1f}%)")
    print(line)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"\n## WARC-ingest delta (sf={SF_NAME})\n\n- {line}\n")


if __name__ == "__main__":
    main()
