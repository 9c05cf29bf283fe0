"""Deterministic Lloyd's KMeans (A14): full reference contract — centroids
table + per-item (id, cluster, distance) — and determinism invariants
(kmeans_centroids.csv / kmeans_assignments.csv,
/root/reference/fastdup/definitions.py:17,19)."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.kmeans import kmeans_fit

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def res(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    return kmeans_fit(e, k=8, n_iter=2)


def test_assignment_contract(spark, res):
    asg = res["assignments"]
    assert asg.columns == ["vec_id", "cluster", "distance"]
    assert asg.count() == 500
    assert asg.select("vec_id").distinct().count() == 500
    row = asg.agg(F.min("distance"), F.min("cluster"), F.max("cluster")).first()
    assert row[0] >= 0.0 and 0 <= row[1] and row[2] <= 7


def test_centroids_contract(spark, res):
    cent = res["centroids"].collect()
    assert len(cent) <= 8
    assert all(len(r["centroid"]) == 64 for r in cent)
    assert sum(r["size"] for r in cent) == 500


def test_deterministic_rerun(spark, res):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    again = kmeans_fit(e, k=8, n_iter=2)["assignments"]
    a = {(r["vec_id"], r["cluster"], r["distance"]) for r in res["assignments"].collect()}
    b = {(r["vec_id"], r["cluster"], r["distance"]) for r in again.collect()}
    assert a == b


def test_distance_is_to_own_centroid(spark, res):
    """Each item's distance equals the squared distance to its assigned
    centroid (joins assignments x centroids, recomputes JVM-side)."""
    asg = res["assignments"]
    cent = res["centroids"].select("cluster", "centroid")
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    j = (asg.join(cent, "cluster").join(e, "vec_id")
         .withColumn("d2", F.round(F.aggregate(
             F.zip_with("v", "centroid", lambda x, y: (x - y) * (x - y)),
             F.lit(0.0), lambda a, x: a + x), 4)))
    bad = j.filter(F.abs(F.col("d2") - F.col("distance")) > 1e-6).count()
    assert bad == 0


def test_arrow_assign_matches_literal_path(spark):
    """Large-k assignment (numpy matrix in the UDF closure) must agree with
    the literal-expression path on well-separated data — same clusters,
    same ties-to-lowest-label rule."""
    import numpy as np

    from fastdup_spark.operators.kmeans import _assign, _assign_arrow

    rng = np.random.Generator(np.random.PCG64(9))
    centers = {j: list(rng.standard_normal(6) * 10) for j in range(5)}
    rows = []
    for i in range(200):
        j = i % 5
        v = np.asarray(centers[j]) + 0.01 * rng.standard_normal(6)
        rows.append((i, [float(x) for x in v]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    lit = _assign(vecs, centers, "vec_id", "embedding") \
        .select("vec_id", "cluster").collect()
    arw = _assign_arrow(vecs, centers, "vec_id", "embedding") \
        .select("vec_id", "cluster").collect()
    assert {(r["vec_id"], r["cluster"]) for r in lit} == \
        {(r["vec_id"], r["cluster"]) for r in arw}
    # tie case: equidistant point goes to the LOWEST label on both paths
    tie = spark.createDataFrame([(0, [0.0, 0.0])],
                                "vec_id long, embedding array<double>")
    tc = {3: [1.0, 0.0], 7: [-1.0, 0.0]}
    assert _assign(tie, tc, "vec_id", "embedding").first()["cluster"] == 3
    assert _assign_arrow(tie, tc, "vec_id", "embedding").first()["cluster"] == 3
