"""PageRank over the similarity graph (A15).

The reference's connected_components.csv carries a turi-style `pagerank`
column with a `delta` convergence value per node
(/root/reference/RUN.md:95-111; toggled by turi_param 'run_pagerank=1',
/root/reference/fastdup/__init__.py:552). Here: the classic iterative
DataFrame formulation — contributions join + groupBy sum per round, damping
0.85, eager localCheckpoint per round (same lineage discipline as the CC
loop). Undirected similarity edges are treated as two directed edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, vertices: DataFrame | None = None,
             damping: float = 0.85, max_iter: int = 20,
             tol: float = 1e-4) -> DataFrame:
    """edges(src,dst) undirected -> (doc_id, pagerank, delta).

    Converges when the max per-node |rank - prev| drops below tol.
    Dangling nodes (no out-edges) only exist if `vertices` adds isolated
    docs; their rank stays at the teleport mass — matching the per-node
    semantics of the reference contract (every doc gets a rank row).
    """
    eb = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).filter("u != v")
    eb = eb.union(eb.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    nodes = eb.select(F.col("u").alias("doc_id")).distinct()
    if vertices is not None:
        nodes = nodes.unionByName(vertices.select("doc_id")).distinct()
    nodes = nodes.localCheckpoint(eager=True)

    degrees = eb.groupBy("u").agg(F.count("*").alias("deg"))
    ranks = nodes.select("doc_id", F.lit(1.0).alias("rank"))
    delta = None
    for _ in range(max_iter):
        contribs = (
            eb.join(ranks.withColumnRenamed("doc_id", "u"), "u")
            .join(degrees, "u")
            .select(F.col("v").alias("doc_id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contribs, "doc_id", "left")
            .select("doc_id",
                    (F.lit(1 - damping) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)))
                    .alias("rank"))
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "doc_id")
            .select(F.abs(F.col("rank") - F.col("prev")).alias("d"))
            .agg(F.max("d")).collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("doc_id", F.round("rank", 6).alias("pagerank"),
                        F.lit(float(delta or 0.0)).alias("delta"))
