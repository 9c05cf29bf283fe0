"""LSH band-bucket candidate generation — the ANN index of this engine.

Replaces the reference's HNSW32/Flat nnf index (/root/reference/fastdup/
__init__.py:292-297,606-607; index file `nnf.index`, definitions.py:9) with
the scalable Spark-native equivalent: MinHash signatures are split into
``bands`` bands of ``rows`` values; each band is hashed to a bucket; docs
sharing any (band, bucket) become candidate pairs. The bucket table doubles
as the persisted, searchable index (≈ nnf.index, but a plain table — Iceberg/
parquet, resumable and queryable).

Scale design (SURVEY §4, §7 hard part 2):
  * candidate enumeration is a bucket self-join — shuffle on (band, bucket,
    salt); AQE skew-join enabled session-wide;
  * mega-buckets (boilerplate-heavy pages hashing together) are the skew
    killer: bucket sizes are counted first, buckets above ``max_bucket_size``
    are *salted* into sub-buckets of ~``salt_target`` docs (bounding the
    quadratic pair blowup per bucket to salt_target^2 * n_splits instead of
    size^2). True duplicates still meet in their other, unsalted bands — the
    recall cost is borne by non-dup boilerplate pairs, which verify would
    reject anyway. Counters (n_buckets, max size, n_salted, candidate count)
    are surfaced for the stage manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_buckets(sig_df: DataFrame, bands: int, rows: int,
                 id_col: str = "doc_id", sig_col: str = "minhash") -> DataFrame:
    """Explode signatures into (doc_id, band_id, bucket) — pure built-ins.

    bucket = xxhash64 of the band's signature slice (JVM-side, deterministic).
    """
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.xxhash64(F.slice(F.col(sig_col), i * rows + F.lit(1), F.lit(rows))),
    )
    return (
        sig_df.select(id_col, F.posexplode(band_hashes).alias("band_id", "bucket"))
        .select(F.col(id_col).alias("doc_id"), "band_id", "bucket")
    )


def bucket_stats(buckets: DataFrame) -> DataFrame:
    """Per-(band,bucket) sizes — the skew counters (≥2 only; singles pair with nobody)."""
    return (
        buckets.groupBy("band_id", "bucket")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") >= 2)
    )


def salt_buckets(buckets: DataFrame, stats: DataFrame,
                 max_bucket_size: int, salt_target: int) -> DataFrame:
    """Split mega-buckets into deterministic sub-buckets.

    Docs in a bucket of size s > max_bucket_size get salt =
    pmod(xxhash64(doc_id, band_id), ceil(s / salt_target)); everyone else
    salt = 0. The oversized-bucket list is tiny -> broadcast join.
    """
    oversized = stats.filter(F.col("bucket_size") > max_bucket_size).select(
        "band_id", "bucket",
        F.ceil(F.col("bucket_size") / F.lit(salt_target)).cast("int").alias("n_splits"),
    )
    return (
        buckets.join(F.broadcast(oversized), ["band_id", "bucket"], "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_splits").isNotNull(),
                F.pmod(F.xxhash64("doc_id", "band_id"), F.col("n_splits")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_splits")
    )


def candidate_pairs(salted_buckets: DataFrame) -> DataFrame:
    """Within-bucket self-join -> distinct candidate (src < dst) pairs.

    The join shuffles both sides on (band_id, bucket, salt); AQE splits any
    residual skew. dropDuplicates collapses pairs that met in several bands.
    """
    left = salted_buckets.select(
        "band_id", "bucket", "salt", F.col("doc_id").alias("src"))
    right = salted_buckets.select(
        "band_id", "bucket", "salt", F.col("doc_id").alias("dst"))
    return (
        left.join(right, ["band_id", "bucket", "salt"])
        .filter(F.col("src") < F.col("dst"))          # canonical orientation (T8)
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )


def lsh_candidates(sig_df: DataFrame, bands: int, rows: int,
                   max_bucket_size: int = 5000, salt_target: int = 500,
                   id_col: str = "doc_id", sig_col: str = "minhash",
                   ) -> tuple[DataFrame, DataFrame]:
    """Full candidate-generation stage. Returns (candidates, bucket_stats)."""
    buckets = band_buckets(sig_df, bands, rows, id_col=id_col, sig_col=sig_col)
    stats = bucket_stats(buckets)
    salted = salt_buckets(buckets, stats, max_bucket_size, salt_target)
    return candidate_pairs(salted), stats
