"""Deterministic training-shard shuffle: the pipeline's LAST operator.

After cleaning/dedup/mixing, a training corpus must be (1) globally
shuffled — neighboring docs in crawl order are correlated (same host,
same template), and data-parallel training wants i.i.d.-looking streams —
and (2) written as N similarly-sized shards that loaders can assign to
workers. Both must be REPRODUCIBLE: re-running the pipeline on the same
corpus must emit byte-identical shards (Dolma/RedPajama release fixed
shard manifests for exactly this reason).

The reference has no training-output surface (image engine); this is
part of the beyond-the-reference LLM-data tier (SURVEY §2 addenda).

Design: shuffle key = md5(salt ':' doc_id) — a salt change is a fresh
permutation, the same salt is bit-stable across runs, partitionings and
cluster sizes (no Spark RNG, no partition-id dependence). The shard is
the key's top 60 bits mod n_shards (uniform, so shard sizes concentrate
at corpus/n ± O(sqrt)); pos is the row's rank inside its shard by (key,
doc_id). md5 (not xxhash64) so the DuckDB driver oracle (`training_shards`)
replays assignment AND order verbatim.

Scale shape: ONE hash shuffle on shard + a per-shard sort for pos — no
global sort, no single-partition window. Per-task memory is bounded by
the shard size: pick n_shards ≈ corpus_rows / target_rows_per_shard
(resolve_n_shards does this), exactly the device plans/store.py uses for
derived-table shards. The writer emits one directory per shard with rows
in pos order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def shuffle_key_expr(id_col: str = "doc_id", salt: str = "") -> Column:
    """Hex md5 shuffle key: deterministic in (salt, id), uniform, and
    replayable in any engine with md5 (the driver oracle relies on it)."""
    return F.md5(F.concat(F.lit(salt), F.lit(":"),
                          F.col(id_col).cast("string")))


def resolve_n_shards(n_rows: int, target_rows_per_shard: int = 250_000,
                     lo: int = 8, hi: int = 65536) -> int:
    """Shard count for a corpus: ~target rows per shard, clamped."""
    want = max(1, round(n_rows / max(1, target_rows_per_shard)))
    return max(lo, min(hi, want))


def assign_training_shards(df: DataFrame, n_shards: int, salt: str = "",
                           id_col: str = "doc_id",
                           num_partitions: int | None = None) -> DataFrame:
    """All input columns + (shard int, pos long): a deterministic global
    shuffle expressed as shard assignment + in-shard rank.

    Reading shards 0..n-1 each in pos order visits the corpus in one
    fixed pseudorandom permutation of md5-key order; a different salt
    yields an unrelated permutation. pos is 1-based and contiguous per
    shard. One shuffle (hash on shard) + one per-shard sort;
    ``num_partitions`` pins the exchange width (an explicit
    repartition(n, "shard") SATISFIES the rank window's clustering, so
    a caller that needs shard-aligned output partitions — the writer —
    pays no second exchange).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # top 60 bits of the key: 15 hex chars always fit a signed long, and
    # DuckDB parses the same digits via CAST('0x'||… AS BIGINT)
    key = shuffle_key_expr(id_col, salt)
    keyed = df.withColumn("_sk", key).withColumn(
        "shard",
        (F.conv(F.substring(F.col("_sk"), 1, 15), 16, 10).cast("long")
         % n_shards).cast("int"))
    if num_partitions is not None:
        keyed = keyed.repartition(num_partitions, "shard")
    w = Window.partitionBy("shard").orderBy("_sk", id_col)
    return keyed.withColumn("pos", F.row_number().over(w).cast("long")) \
        .drop("_sk")


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          salt: str = "", id_col: str = "doc_id",
                          format: str = "parquet") -> None:
    """Materialize the shuffled corpus as ``path/shard=K/`` directories,
    rows in pos order inside each shard (loaders stream shard files
    sequentially and rely on on-disk order). The corpus (its widest
    column is the text) crosses exactly ONE exchange: the pre-window
    repartition on shard doubles as the writer's output partitioning."""
    out = assign_training_shards(df, n_shards, salt, id_col,
                                 num_partitions=n_shards)
    (out.sortWithinPartitions("shard", "pos")
     .write.mode("overwrite").partitionBy("shard").format(format)
     .save(path))
