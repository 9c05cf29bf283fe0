"""SparkSession factory tuned for the dedup pipeline.

Single place where execution knobs live so tests, bench.py and spark-submit
jobs all agree. Designed for a multi-executor cluster (AQE, skew join,
arrow batching); tested on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fastdup_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the pipeline's standard config.

    On a real cluster ``master`` comes from spark-submit; locally defaults to
    ``local[$SPARK_GRAFT_CPUS]`` (falling back to all cores).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # At 100 TB this is set much higher (or left to AQE coalescing);
        # locally match core count so small stages don't over-schedule.
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-plan, partition coalescing and skew-join splitting —
        # load-bearing for the skewed LSH-bucket self-join.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF boundary (no per-row Python anywhere).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep timestamps deterministic across engines/oracles.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Prefer shuffled-hash over sort-merge when the planner's size
        # conditions are met, and let AQE rewrite SMJ->SHJ at runtime when
        # every post-shuffle partition is under the threshold: the
        # engine's hot joins (bucket self-join, stats inner join, shingle
        # verify joins) are equi-joins on well-spread keys where sorting
        # both sides is pure overhead (guide §3.1; measured r07: -0.8s
        # minhash_lsh_dedup, -1.6s search_many at sf1). OOM risk is
        # bounded: AQE only converts when the largest build partition is
        # below the per-partition threshold, so a skewed key falls back
        # to SMJ on its own.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "256m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
