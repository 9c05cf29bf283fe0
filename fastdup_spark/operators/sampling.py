"""Deterministic corpus sampling for data mixing.

Training-data pipelines mix sources by quota ("200B tokens of web, 30B
of code, ...") and need the selection to be reproducible across reruns
and engines — `df.sample()` is seed-stable only per partitioning, so
production mixers key the decision on a content hash instead. Two
shapes:

* ``hash_rate_sample`` — stateless rate sampling: keep a row iff the
  first 8 hex chars of md5(salt || id) sort below a threshold derived
  from the rate. ZERO shuffle (a map-side filter that fuses into the
  scan), trivially reproducible, and composable: disjoint salts give
  independent samples, the same salt gives nested samples (rate 0.1 is
  a subset of rate 0.2). This is the 100-TB path.
* ``quota_sample`` — exact per-group quotas via one window over the
  group key (hash-ordered so it is a sample, not a head). One shuffle
  on the group column; use for bounded group counts (languages,
  sources), not per-host quotas at full scale (use
  operators/urls.py:cap_per_host's newest-first semantics there).

Cross-engine contract: md5 hex of the decimal-string id is identical
in Spark and DuckDB, and lexicographic comparison of fixed-width
lowercase hex equals numeric comparison — the driver oracles replay
both samplers verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(id_col: str, salt: str):
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def hash_rate_threshold(rate: float) -> str:
    """The 8-hex-char threshold: keep iff substr(md5,1,8) < this."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(rate * 0x1_0000_0000), "08x")[:8] if rate < 1.0 else "g"
    # 'g' sorts after every hex char, so rate=1.0 keeps all rows


def hash_rate_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                     salt: str = "") -> DataFrame:
    """Keep ~rate of rows, deterministically, with no shuffle."""
    key = F.substring(_hash_key(id_col, salt), 1, 8)
    return df.filter(key < F.lit(hash_rate_threshold(rate)))


def quota_sample(df: DataFrame, group_col: str, quota: int,
                 id_col: str = "doc_id", rank_col: str | None = None
                 ) -> DataFrame:
    """Keep exactly min(quota, |group|) rows per group, hash-ordered.

    Deterministic: the window orders by (md5 of id, id), so ties are
    impossible and the result is partitioning-independent. Returns the
    input columns plus ``rank_col`` (1-based position) when requested.
    """
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    w = Window.partitionBy(group_col).orderBy(
        _hash_key(id_col, ""), F.col(id_col))
    rk = F.row_number().over(w)
    out = df.withColumn("__rk", rk).filter(F.col("__rk") <= quota)
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")
