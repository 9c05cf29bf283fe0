"""SemDeDup-style semantic deduplication over embedding vectors.

Public-knowledge method (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means cluster the
embedding space, compare pairs ONLY within a cluster (the cluster bounds
the quadratic), connect pairs whose cosine similarity clears a threshold,
and keep ONE representative per duplicate group — the paper keeps the
example with the LOWEST cosine similarity to its cluster centroid (the
most peripheral point of the group carries the most information).

Reference parity: the reference resolves duplicate groups over visual
embeddings with connected components and keeps one representative
(/root/reference/fastdup/fastdup_controller.py:440 component resolution);
this is the LLM-corpus/semantic form of that operator, complementing the
exact (content-hash), MinHash/LSH and SimHash tiers.

Spark shape (the 100-TB view):

* `kmeans_fit` (operators/kmeans.py): broadcast-centroid argmin — one scan
  per round, no shuffle in the assignment step;
* within-cluster pair generation: ONE shuffle keyed on ``cluster``; the
  per-cluster nested loop is bounded by cluster size, which is SemDeDup's
  design point — k scales with the corpus so clusters stay roughly
  constant-sized. A pathologically skewed cluster is the same hazard as an
  LSH mega-bucket: raise ``k`` (or pre-split the cluster key with a salt);
  this operator does not silently sample;
* duplicate groups: large-star/small-star connected components
  (operators/cc.py), O(log n) driver rounds;
* keep-one: a single window over ``component_id`` — rank by distance to
  the cluster centroid DESC (rounded to 4dp), ties to the smallest id.

Determinism (what makes the DuckDB oracle possible): kmeans_fit's
deterministic init/tie/empty-cluster rules, cosine rounded to 3dp BEFORE
the threshold in both engines, centroid distance rounded to 4dp before the
keep-one ordering, and min-id component labels. The driver query
``semdedup`` is fully oracle-checked end to end (unrolled Lloyd's +
brute-force within-cluster cosine edges + recursive label-flood CC + the
same keep-one window).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastdup_spark.functions.similarity import cosine_expr
from fastdup_spark.operators.cc import connected_components
from fastdup_spark.operators.kmeans import kmeans_fit

# composite pair-join key for split clusters: cluster * _SUB_BASE + sub.
# sub < _SUB_BASE always (sub-k is capped below it), so the key is unique.
_SUB_BASE = 65536


def semdedup_edges(assigned: DataFrame, threshold: float,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   ) -> DataFrame:
    """Within-cluster near-duplicate edges over an assigned embedding table.

    ``assigned``: (id_col, cluster, vec_col) — e.g. kmeans assignments
    joined back to the vectors. Returns (cluster, src, dst, cosine) with
    src < dst and cosine rounded to 3dp (the cross-engine contract; +0.0
    normalizes IEEE -0.0 so the rounded value hashes identically).

    The join is an equi-join on ``cluster`` (one shuffle); Spark evaluates
    the src<dst and threshold predicates inside the per-cluster match loop,
    so cost is sum(cluster_size^2), never corpus^2.
    """
    av = assigned.select(
        F.col(id_col), F.col("cluster"),
        F.col(vec_col).cast("array<double>").alias("_v"))
    a = av.select(F.col(id_col).alias("src"), "cluster",
                  F.col("_v").alias("_va"))
    b = av.select(F.col(id_col).alias("dst"), "cluster",
                  F.col("_v").alias("_vb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("src") < F.col("dst"))
        .withColumn("cosine",
                    F.round(cosine_expr(F.col("_va"), F.col("_vb")), 3)
                    + F.lit(0.0))
        .filter(F.col("cosine") >= float(threshold))
        .select("cluster", "src", "dst", "cosine")
    )


def split_oversized_clusters(assignments: DataFrame, embeddings: DataFrame,
                             max_cluster_size: int,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Skew guard: re-cluster clusters above ``max_cluster_size`` with a
    one-level sub-kmeans so no pair-join partition exceeds the bound.

    Returns assignments with the SAME columns but a composite ``cluster``
    key (orig * 65536 + sub) for split clusters; ``distance`` stays the
    distance to the TOP-LEVEL centroid (the keep-one rule's reference
    point is unchanged by the split).

    Why kmeans and not a salt: a salt scatters near-identical vectors
    across sub-cells (killing recall inside the split cluster); kmeans
    assigns by distance, so tight duplicate groups co-locate and the only
    pairs lost are the same boundary-straddling trade the TOP-LEVEL
    clustering already makes. The one split kmeans can't perform: a
    megagroup of IDENTICAL vectors (every copy equidistant from every
    sub-centroid, argmin ties to one label) — that is the exact-dedup
    tier's job and should run first (operators/cascade.py ordering).

    Driver cost: one kmeans_fit per oversized cluster — bounded by the
    number of skew pathologies, not by k (at a well-chosen k there are
    few or none)."""
    big = {r["cluster"]: r["count"]
           for r in assignments.groupBy("cluster").count()
           .filter(F.col("count") > max_cluster_size).collect()}
    if not big:
        return assignments
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    out = (assignments.filter(~F.col("cluster").isin(list(big)))
           .select(id_col, "cluster", "distance"))
    for cid in sorted(big):
        kk = min(int(math.ceil(big[cid] / max_cluster_size)), _SUB_BASE - 1)
        members = assignments.filter(F.col("cluster") == cid) \
            .select(id_col, "distance")
        sub = kmeans_fit(vecs.join(members.select(id_col), id_col),
                         k=kk, n_iter=1, id_col=id_col, vec_col=vec_col)
        subbed = (members
                  .join(sub["assignments"]
                        .select(id_col, F.col("cluster").alias("_sub")),
                        id_col)
                  .select(id_col,
                          (F.lit(int(cid) * _SUB_BASE) + F.col("_sub"))
                          .alias("cluster"),
                          "distance"))
        out = out.unionByName(subbed)
    return out


def semdedup_decisions(assignments: DataFrame, embeddings: DataFrame,
                       threshold: float,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       max_cluster_size: int | None = None,
                       ) -> dict[str, DataFrame]:
    """Edges + keep-one decisions from an existing kmeans fit.

    ``assignments``: kmeans_fit output (id, cluster, distance — squared
    euclidean to the final centroid, rounded 4dp). Returns

    * ``edges`` — (cluster, src, dst, cosine): within-cluster pairs at or
      above ``threshold`` (cosine rounded 3dp; when ``max_cluster_size``
      splits a cluster, ``cluster`` here is the composite sub-key);
    * ``decisions`` — (id, cluster, component_id, distance, is_survivor):
      one row per input vector with the ORIGINAL cluster label;
      ``component_id`` = min id of the duplicate group (own id for
      singletons); ``is_survivor`` = True for exactly one row per
      component — the member FARTHEST from its cluster centroid
      (SemDeDup's keep-lowest-centroid-similarity rule), ties to the
      smallest id. Singletons always survive.

    ``max_cluster_size``: skew guard — clusters above this bound are
    sub-split with :func:`split_oversized_clusters` before the pair join.
    """
    key_asg = assignments
    if max_cluster_size is not None:
        key_asg = split_oversized_clusters(
            assignments, embeddings, max_cluster_size,
            id_col=id_col, vec_col=vec_col)
    assigned = key_asg.join(
        embeddings.select(F.col(id_col), F.col(vec_col)), id_col)
    edges = semdedup_edges(assigned, threshold,
                           id_col=id_col, vec_col=vec_col)
    comp = connected_components(
        edges.select("src", "dst"),
        vertices=assignments.select(F.col(id_col).alias("doc_id")))
    # component_id is never NULL (every vertex gets its own id as a
    # singleton label), so the keep-one window needs no NULL-key guard.
    w = Window.partitionBy("component_id") \
        .orderBy(F.desc("distance"), F.col(id_col))
    decisions = (
        assignments.join(comp.withColumnRenamed("doc_id", id_col), id_col)
        .withColumn("_rk", F.row_number().over(w))
        .select(id_col, "cluster", "component_id", "distance",
                (F.col("_rk") == 1).alias("is_survivor"))
    )
    return {"edges": edges, "decisions": decisions}


def semdedup(embeddings: DataFrame, k: int = 8, n_iter: int = 2,
             threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_cluster_size: int | None = None,
             ) -> dict[str, DataFrame]:
    """Cluster -> within-cluster cosine edges -> CC -> keep-one.

    Returns {"assignments", "edges", "decisions"} — see
    :func:`semdedup_decisions` for the edge/decision contracts;
    ``assignments`` is the kmeans_fit output the decisions derive from.
    ``max_cluster_size`` bounds the per-cluster pair join under skew
    (see :func:`split_oversized_clusters`).
    """
    fit = kmeans_fit(embeddings, k=k, n_iter=n_iter,
                     id_col=id_col, vec_col=vec_col)
    out = semdedup_decisions(fit["assignments"], embeddings, threshold,
                             id_col=id_col, vec_col=vec_col,
                             max_cluster_size=max_cluster_size)
    return {"assignments": fit["assignments"], **out}
