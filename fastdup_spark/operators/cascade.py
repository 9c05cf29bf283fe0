"""Tiered dedup cascade: URL -> exact hash -> MinHash/LSH near-dup.

Production webtext dedup (CCNet, RefinedWeb, Dolma) is a CASCADE, not a
single operator: each tier removes what it can at its own price point so
the next, more expensive tier sees a smaller corpus —

  tier "url"      canonical-URL revisit dedup: one string projection +
                  one window shuffle; no content reads beyond the url/ts
                  columns. Removes refetch noise (case, ports, tracking
                  params, snapshots of the same page).
  tier "exact"    content-hash dedup: one md5 projection + one window
                  shuffle. Removes byte-identical bodies mirrored under
                  different urls.
  tier "near_dup" full MinHash -> LSH -> exact-Jaccard verify -> CC
                  (plans/pipeline.near_dup_pipeline). The expensive
                  signature pass runs ONLY over the survivors of the two
                  cheap tiers.

The reference's single-shot flow (similarity graph -> components -> keep
one, /root/reference/fastdup/__init__.py:2893-2920 `remove_duplicates`)
corresponds to the last tier; the cascade is the beyond-the-reference
LLM-data-pipeline form (SURVEY §2 addenda). Like operators/dedup.py this
is side-effect-free: it returns DECISION tables, it never deletes rows.

At 100-TB scale: the url tier's window and the exact tier's window each
cost one hash exchange on their own key (canonical_url, content md5) —
unavoidable and disjoint by nature. Everything between the exchanges is
map-side, and tiers shrink the data monotonically, so total cost is
bounded by tier-1 input size; the near-dup tier inherits all the scale
devices of near_dup_pipeline (banded LSH, salted buckets, no all-pairs).

Determinism contract: within a tie the smallest ``id_col`` survives
(url tier: newest ``ts_col`` first, then smallest id; near-dup tier:
component_id == min member id, operators/cc.py contract), so the whole
decision table is reproducible and SQL-replayable — the driver query
``dedup_cascade`` is oracle-checked end-to-end against DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from .urls import canonical_url_expr

TIER_URL = "url"
TIER_EXACT = "exact"
TIER_NEAR_DUP = "near_dup"


def _window_tier(d: DataFrame, key, tier: str, id_col: str,
                 order_cols) -> tuple[DataFrame, DataFrame]:
    """Keep rank-1 per key; return (survivors, drops(doc_id, tier, kept_by)).

    NULL keys are EXEMPT, not a group: a NULL url / NULL text carries no
    dedup evidence, and Window.partitionBy would otherwise pool every
    such row into one partition and "dedup" unrelated docs against each
    other. NULL-key rows pass through as survivors (a plain run()
    quarantines them at extraction instead).

    PHYSICAL spread (r07, verdict #4): the rank guard below fixes the
    semantics but a bare partitionBy("_key") still sends every NULL-key
    row to ONE window task (Spark pools NULLs) — a straggler sort on
    NULL-heavy corpora whose result is discarded. Partitioning on
    (isnull, coalesce(key, per-row id)) gives each NULL-key row its own
    singleton partition (the isnull flag keeps the surrogate namespace
    disjoint from real keys); the when() guard still pins rank 1 even
    if surrogates collide (e.g. NULL ids)."""
    w = Window.partitionBy(
        F.col("_key").isNull(),
        F.coalesce(F.col("_key"), F.col(id_col).cast("string"))
    ).orderBy(*order_cols, F.asc(id_col))
    ranked = (
        d.withColumn("_key", key)
        .withColumn(
            "_rn",
            F.when(F.col("_key").isNull(), F.lit(1))
            .otherwise(F.row_number().over(w)))
        .withColumn("_kept", F.first(id_col).over(w))
    )
    drops = (
        ranked.filter(F.col("_rn") > 1)
        .select(F.col(id_col).alias("doc_id"), F.lit(tier).alias("tier"),
                F.col("_kept").alias("kept_by"))
    )
    survivors = ranked.filter(F.col("_rn") == 1).drop("_key", "_rn", "_kept")
    return survivors, drops


def dedup_cascade(docs: DataFrame, cfg: PipelineConfig | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  url_col: str | None = None, ts_col: str | None = None,
                  run_exact: bool = True,
                  run_near_dup: bool = True) -> dict[str, DataFrame]:
    """Run the url -> exact -> near_dup cascade over ``docs``.

    ``url_col=None`` skips the url tier (no url surface on the input);
    ``ts_col=None`` makes the url tier keep the smallest id instead of the
    newest fetch. ``run_exact=False`` skips the content-hash tier.
    ``run_near_dup=False`` stops after the cheap JVM-only
    tiers (their plans contain no Python eval — pinned in tests).

    Returns ``{"survivors", "decisions", "tier_counts"}``:
      survivors   — input rows that survived every tier (input columns);
      decisions   — (doc_id, tier, kept_by): one row per DROPPED doc,
                    tier = the first tier that claimed it, kept_by = the
                    id of the doc it was deduped against;
      tier_counts — (tier, n_dropped) convenience aggregate.
    Input rows == survivors + decisions, exactly (each doc is dropped by
    at most one tier because later tiers only see earlier survivors).
    """
    cfg = cfg or PipelineConfig()
    d = docs
    all_drops: list[DataFrame] = []

    if url_col is not None:
        order = [F.desc(ts_col)] if ts_col is not None else []
        d, drops = _window_tier(
            d, canonical_url_expr(F.col(url_col)), TIER_URL, id_col, order)
        all_drops.append(drops)

    if run_exact:
        d, drops = _window_tier(d, F.md5(F.col(text_col)), TIER_EXACT,
                                id_col, [])
        all_drops.append(drops)

    if run_near_dup:
        from ..plans.pipeline import near_dup_pipeline
        res = near_dup_pipeline(d, cfg, id_col=id_col, text_col=text_col)
        asg = res["assignments"]  # (doc_id, component_id); comp = min member
        nd_drops = (
            asg.filter(F.col("doc_id") != F.col("component_id"))
            .select("doc_id", F.lit(TIER_NEAR_DUP).alias("tier"),
                    F.col("component_id").alias("kept_by"))
        )
        all_drops.append(nd_drops)
        d = d.join(nd_drops.select(F.col("doc_id").alias(id_col)),
                   on=id_col, how="left_anti")

    if not all_drops:  # every tier disabled: empty decision table
        decisions = docs.sparkSession.createDataFrame(
            [], "doc_id bigint, tier string, kept_by bigint")
    else:
        decisions = reduce(lambda a, b: a.unionByName(b), all_drops)
    tier_counts = decisions.groupBy("tier").agg(
        F.count("*").alias("n_dropped"))
    return {"survivors": d, "decisions": decisions,
            "tier_counts": tier_counts}
