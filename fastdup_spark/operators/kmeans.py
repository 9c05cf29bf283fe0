"""Deterministic distributed KMeans (Lloyd's) over embedding arrays — A14.

Reference contract: `kmeans_centroids.csv` + per-item `kmeans_assignments.csv`
(filename, cluster, distance) — /root/reference/fastdup/definitions.py:17,19,
galleries.py:944-967. The reference trains with faiss/sklearn; this is the
Spark-native equivalent:

  * assignment step: broadcast the k centroids as JVM literal arrays and
    compute the argmin of squared-euclidean distance with pure built-in
    expressions (zip_with + aggregate — whole-stage codegen, one scan, no
    shuffle);
  * update step: posexplode the assigned vectors and groupBy (cluster, pos)
    avg — one shuffle of k*dim tiny groups; the k x dim centroid matrix is
    collected to the driver between rounds (it is a few KB).

Determinism (what makes the oracle possible): init centroids = the k
vectors with the SMALLEST ids (cluster label = init rank), a FIXED number of
Lloyd rounds, argmin ties broken by lowest cluster label, and clusters that
go empty simply drop out of later rounds. DuckDB reproduces the exact same
trajectory with unrolled CTEs (__spark_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many k*dim expression leaves, the literal-array assignment plan
# (one F.array literal per centroid) stops being a plan and starts being a
# problem — switch to the Arrow path with a numpy centroid matrix riding in
# the UDF closure (serialized once per worker, not per plan node).
_ASSIGN_LITERAL_MAX = 65_536


def _sq_dist(vec, centroid_lits):
    """Squared euclidean between an array<double> column and a literal list."""
    c = F.array(*[F.lit(float(x)) for x in centroid_lits])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _assign_arrow(vecs: DataFrame, centroids: dict[int, list[float]],
                  id_col: str, vec_col: str) -> DataFrame:
    """Large-k assignment: centroid matrix in the UDF closure, one
    elementwise pass per centroid (no (n,k,dim) intermediate). Strict `<`
    update keeps the FIRST minimum — same ties-to-lowest-label rule as the
    literal path (labels iterate in sorted order). Roundoff order differs
    from the JVM expression path, so exact-replay oracles keep using the
    literal path (k*dim below _ASSIGN_LITERAL_MAX)."""
    from pyspark.sql.functions import pandas_udf

    labels = sorted(centroids)
    cmat = np.asarray([centroids[l] for l in labels], dtype=np.float64)
    lab = np.asarray(labels, dtype=np.int64)

    @pandas_udf("cluster bigint, dist double")
    def _arg(v: pd.Series) -> pd.DataFrame:
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        best_d = np.full(len(mat), np.inf)
        best_j = np.zeros(len(mat), dtype=np.int64)
        for j in range(cmat.shape[0]):
            dj = np.square(mat - cmat[j]).sum(axis=1)
            upd = dj < best_d
            best_d[upd] = dj[upd]
            best_j[upd] = j
        return pd.DataFrame({"cluster": lab[best_j], "dist": best_d})

    return (
        vecs.withColumn("_a", _arg(F.col(vec_col)))
        .select(id_col, vec_col,
                F.col("_a.cluster").alias("cluster"),
                F.col("_a.dist").alias("dist"))
    )


def _assign(vecs: DataFrame, centroids: dict[int, list[float]],
            id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cluster, dist): argmin over the broadcast centroids.

    Labels are sorted so array_position's first-match rule == "ties to the
    lowest cluster label" (the oracle's ORDER BY d, cluster)."""
    labels = sorted(centroids)
    dim = len(next(iter(centroids.values()))) if centroids else 0
    if len(labels) * dim > _ASSIGN_LITERAL_MAX:
        return _assign_arrow(vecs, centroids, id_col, vec_col)
    dists = F.array(*[_sq_dist(F.col(vec_col), centroids[l]) for l in labels])
    label_arr = F.array(*[F.lit(int(l)) for l in labels])
    return (
        vecs.withColumn("_d", dists)
        .select(
            id_col, vec_col,
            F.element_at(label_arr,
                         F.array_position("_d", F.array_min("_d")).cast("int")
                         ).cast("long").alias("cluster"),
            F.array_min("_d").alias("dist"),
        )
    )


def kmeans_fit(embeddings: DataFrame, k: int = 8, n_iter: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               ) -> dict[str, DataFrame]:
    """Run ``n_iter`` full Lloyd rounds from the deterministic init, then a
    final assignment against the last centroids.

    Returns {"assignments": (id, cluster, distance),
             "centroids":   (cluster, size, centroid array<double>)}.
    """
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    init_rows = (vecs.orderBy(id_col).limit(k).select(vec_col).collect())
    centroids = {i: list(r[vec_col]) for i, r in enumerate(init_rows)}
    if not centroids:
        # empty input (e.g. an all-quarantined corpus): empty typed results,
        # not an unresolvable zero-arm argmin plan
        spark = embeddings.sparkSession
        return {
            "assignments": spark.createDataFrame(
                [], f"{id_col} bigint, cluster bigint, distance double"),
            "centroids": spark.createDataFrame(
                [], "cluster bigint, size bigint, centroid array<double>"),
        }

    for _ in range(n_iter):
        asg = _assign(vecs, centroids, id_col, vec_col)
        upd = (
            asg.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select("cluster", F.transform("s", lambda x: x["m"]).alias("cv"))
            .collect()
        )
        # clusters that went empty drop out (same rule in the oracle SQL)
        centroids = {r["cluster"]: list(r["cv"]) for r in upd}

    final = _assign(vecs, centroids, id_col, vec_col).localCheckpoint(eager=True)
    assignments = final.select(
        id_col, "cluster", F.round("dist", 4).alias("distance"))
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        sorted(centroids.items()), "cluster long, centroid array<double>")
    sizes = final.groupBy("cluster").agg(F.count("*").alias("size"))
    centroids_out = (
        cent_df.join(sizes, "cluster", "left")
        .select("cluster", F.coalesce("size", F.lit(0)).alias("size"), "centroid")
    )
    return {"assignments": assignments, "centroids": centroids_out}
