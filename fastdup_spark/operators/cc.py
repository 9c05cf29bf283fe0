"""Connected components via alternating large-star / small-star.

The reference computes components in one opaque C++ call whose output contract
is `connected_components.csv` (__id, component_id, ... — /root/reference/
RUN.md:95-115, definitions.py:15) with singleton filtering downstream
(/root/reference/fastdup/fastdup_controller.py:440). Here it is the iterative
DataFrame algorithm of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14) — the standard O(log n)-round formulation that scales to
trillion-edge graphs:

  large-star(u): connect every strictly-larger neighbor of u to
                 m = min(Γ(u) ∪ {u})
  small-star(u): connect every neighbor ≤ u (and u itself) to
                 m = min(Γ≤(u) ∪ {u})

Each round is two shuffles (groupBy min + join); iteration stops when the
edge multiset is stable (checked with a cheap count+hash aggregate).
Lineage is cut with localCheckpoint every ``checkpoint_every`` rounds
(SURVEY §7 hard part 3); the driver loop is the idiomatic place for this —
no Catalyst extension needed.

Determinism: component id == min doc_id of the component (stable across
partitionings and cluster sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidir(edges: DataFrame) -> DataFrame:
    """(src,dst) undirected edge list -> both directions (u,v), self-loops dropped."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter("u != v")


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (v, m_u) for every neighbor v > u, where m_u = min(Γ(u) ∪ {u})."""
    eb = _bidir(edges)
    m = eb.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", "u").alias("m"))
    return (
        eb.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter("src != dst")
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each u over its ≤-neighbors N = {v ∈ Γ(u): v < u}: m = min(N ∪ {u});
    emit (v, m) for v ∈ N ∪ {u}, v ≠ m."""
    lower = _bidir(edges).filter(F.col("v") < F.col("u"))
    m = lower.groupBy("u").agg(F.min("v").alias("m"))  # v<u ⇒ min(N∪{u}) = min(N)
    nbr_edges = (
        lower.join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter("src != dst")
    )
    self_edges = m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return nbr_edges.union(self_edges)


def _edge_digest(edges: DataFrame) -> tuple[int, int]:
    """Cheap stability check: (count, xor-ish hash sum) of the canonical edge set."""
    row = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .agg(F.count("*").alias("n"),
             F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"))
        .collect()[0]
    )
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, vertices: DataFrame | None = None,
                         max_iter: int = 50, checkpoint_every: int = 3) -> DataFrame:
    """edges(src,dst) -> assignments(doc_id, component_id).

    ``vertices`` (one ``doc_id`` column) adds isolated docs as singleton
    components (component_id = own id) — matching the reference where every
    item gets a component row and singletons are filtered later
    (fastdup_controller.py:440).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter("src != dst").distinct()
    if e.isEmpty():
        if vertices is None:
            schema = "doc_id bigint, component_id bigint"
            return spark.createDataFrame([], schema)
        return vertices.select(
            F.col("doc_id"), F.col("doc_id").alias("component_id"))

    # Eagerly checkpoint every round: truncates lineage AND materializes the
    # edge set once, so the digest (and the next round) read cached blocks
    # instead of recomputing the whole iterative plan. checkpoint_every is
    # kept for API compatibility but 1 is strictly better here because the
    # digest already forces a full evaluation each round.
    del checkpoint_every
    e = e.localCheckpoint(eager=True)
    prev = _edge_digest(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).distinct().localCheckpoint(eager=True)
        cur = _edge_digest(e)
        if cur == prev:
            break
        prev = cur

    # converged: star graphs — every node points (in some direction) at its min
    eb = _bidir(e)
    comp = (
        eb.groupBy("u").agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("doc_id"), F.least("mn", "u").alias("component_id"))
    )
    if vertices is not None:
        singles = vertices.select("doc_id").join(comp.select("doc_id"), "doc_id", "left_anti")
        comp = comp.unionByName(
            singles.select("doc_id", F.col("doc_id").alias("component_id")))
    return comp
