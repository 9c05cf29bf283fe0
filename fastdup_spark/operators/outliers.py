"""Outlier detection — bottom percentile of best-NN similarity.

Reference: `outliers.csv` keeps the bottom ``lower_threshold`` (default 5%)
percentile of nearest-neighbor distances (/root/reference/fastdup/__init__.py:482,567;
/root/reference/RUN.md:57-68). There every item has dense-embedding NNs; in the
sparse LSH world most docs have *no* candidate at all — those are the most
unique, so they rank before any doc with a weak neighbor. The cut is
rank-based (floor(pct * n) rows ordered by best similarity asc, doc_id as the
deterministic tie-break), which reproduces "bottom p% of NN distances"
without depending on interpolation details.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_neighbor(all_docs: DataFrame, scored_pairs: DataFrame,
                  sim_col: str = "jaccard") -> DataFrame:
    """(doc_id) x pairs(src,dst,sim) -> (doc_id, best_sim, best_nn).

    Docs absent from the pair table get best_sim = 0.0, best_nn = NULL.
    """
    sym = scored_pairs.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("nn"), F.col(sim_col).alias("sim")
    ).unionByName(scored_pairs.select(
        F.col("dst").alias("doc_id"), F.col("src").alias("nn"), F.col(sim_col).alias("sim")
    ))
    w = Window.partitionBy("doc_id").orderBy(F.desc("sim"), F.asc("nn"))
    best = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", F.col("sim").alias("best_sim"), F.col("nn").alias("best_nn"))
    )
    return (
        all_docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("best_sim", F.lit(0.0)).alias("best_sim"),
            "best_nn",
        )
    )


def exact_rank_head(df: DataFrame, k: int, n: int, sort_col: str,
                    id_col: str, ascending: bool = True,
                    margin: float = 1.5) -> DataFrame:
    """Deterministic exact top/bottom-k by (sort_col, id_col) without a
    global single-partition sort of all ``n`` rows.

    Phase 1: a distributed approx-percentile cutoff prunes to ~margin*k
    survivors; phase 2 runs the exact deterministic row_number rank on the
    pruned set only. If the approximate cutoff under-prunes (skewed or
    heavily-tied distributions can make percentile_approx land short of k
    survivors), fall back to ranking the full table — the exact bottom-k
    contract always wins over the shortcut.
    """
    if k <= 0:
        return df.limit(0)
    # NULL sort values never rank (the pruned path's cutoff filter and the
    # fallback's full sort would otherwise disagree on their placement)
    df = df.filter(F.col(sort_col).isNotNull())
    frac = min(1.0, (k / max(n, 1)) * margin)
    q = frac if ascending else 1.0 - frac
    cutoff = df.agg(
        F.percentile_approx(sort_col, q, 10000).alias("c")).collect()[0]["c"]
    if cutoff is None:
        return df.limit(0)
    pruned = df.filter(
        F.col(sort_col) <= F.lit(cutoff) if ascending
        else F.col(sort_col) >= F.lit(cutoff))
    if pruned.count() < k:
        pruned = df
    w = Window.orderBy(
        F.asc(sort_col) if ascending else F.desc(sort_col), F.asc(id_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def outliers_by_percentile(best_nn: DataFrame, pct: float,
                           n: int | None = None) -> DataFrame:
    """Bottom floor(pct*n) docs by (best_sim asc, doc_id asc) — deterministic.

    Pass ``n`` (total docs) when already known from a stage marker to save
    the count job.
    """
    if n is None:
        n = best_nn.count()
    return exact_rank_head(best_nn, int(n * pct), n, "best_sim", "doc_id",
                           ascending=True)
