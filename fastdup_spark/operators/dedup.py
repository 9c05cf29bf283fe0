"""Dedup policies and exact-duplicate detection.

Reference analogs:
  * exact duplicates — the degenerate case of similarity 1.0 clusters;
  * keep-one-per-component — `delete_components` keeps files[0], drops the
    rest (/root/reference/fastdup/__init__.py:1666-1675, W4 in SURVEY §2.5);
  * majority-label survivor — `delete_or_retag_stats_outliers`-style policy:
    keep one doc of the dominant label iff it holds ≥ half the component,
    else drop the whole component (/root/reference/fastdup/__init__.py:1709-1732, W5);
  * `remove_duplicates` e2e (/root/reference/fastdup/__init__.py:2893-2920) —
    here a side-effect-free *decision table* (doc_id, component_id, keep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cross_doc_duplicated(df: DataFrame, key_col: str,
                         min_docs: int = 2,
                         id_col: str = "doc_id") -> DataFrame:
    """Rows whose ``key_col`` value appears in >= ``min_docs`` DISTINCT
    docs — THE shared flag pass of every rewrite-dedup operator
    (lines/passages/exactsubstr); never fork a copy (the NULL-key and
    collision lessons must land in one place).

    Shape: a hash AGGREGATE on the key (default min_docs=2 needs only
    min(doc_id) != max(doc_id) — ">= 2 distinct docs" with no per-key
    set even for a boilerplate key in millions of docs; generic
    min_docs counts distinct ids) + a semi join back. The aggregate
    partial-combines map-side and never sorts; the equivalent
    min!=max WINDOW form sort-shuffles the ENTIRE key stream — the
    asymptotic hazard at corpus scale (same-session min-of-2 e2e at 1M
    pages: window 65.9s vs agg+semi 60.4s for ExactSubstr, identical
    output; round-6 continuation). NULL keys are never
    flagged (Spark pools NULLs into one key group — the round-6
    NULL-key-window lesson)."""
    # ONE explicit repartition on the key, shared by BOTH consumers: the
    # aggregate (partitioning satisfies its grouping — no second
    # exchange) and the semi join (both sides co-partitioned). Without
    # it, the agg side exchanges partial-agg rows and the join side
    # exchanges the raw stream separately, so the (possibly expensive —
    # exactsubstr's window-hash mapInPandas) input subtree runs twice
    # and its rows cross the network twice (r07: ~1s off the 24M-window
    # flag pass at 100k pages; bytes can only shrink, the hot-key skew
    # profile is unchanged — the join side always shuffled raw rows).
    keyed = df.filter(F.col(key_col).isNotNull()).repartition(F.col(key_col))
    if min_docs == 2:
        cond = F.min(id_col) != F.max(id_col)
    else:
        cond = F.count_distinct(id_col) >= min_docs
    dup = keyed.groupBy(key_col).agg(cond.alias("__d"))         .filter(F.col("__d")).select(key_col)
    return keyed.join(dup, key_col, "left_semi")


def integer_fraction(frac: float) -> tuple[int, int]:
    """(num, den) for integer-exact '<= frac' comparisons (the kill-rule
    contract: dropped * den <= num * total, never floats)."""
    from fractions import Fraction

    f = Fraction(frac).limit_denominator(10**6)
    return f.numerator, f.denominator


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash (distributed groupBy, no pairs).

    Returns (doc_id, group_key, group_size, keep) for docs in groups of ≥ 2;
    keep = True for the smallest doc_id (deterministic survivor).
    """
    hashed = docs.select(F.col(id_col).alias("doc_id"),
                         F.md5(F.col(text_col)).alias("group_key"))
    w = Window.partitionBy("group_key")
    wr = Window.partitionBy("group_key").orderBy("doc_id")
    return (
        hashed.withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") >= 2)
        .withColumn("keep", F.row_number().over(wr) == 1)
        .select("doc_id", "group_key", "group_size", "keep")
    )


def keep_first_policy(assignments: DataFrame,
                      order_col: str = "doc_id") -> DataFrame:
    """W4: one survivor per component (min order_col), everyone else dropped.

    Input: assignments(doc_id, component_id). Output adds keep BOOLEAN.
    Singleton components keep their only member.
    """
    w = Window.partitionBy("component_id").orderBy(F.asc(order_col))
    return assignments.withColumn("keep", F.row_number().over(w) == 1)


def keep_best_policy(assignments_with_score: DataFrame,
                     score_col: str) -> DataFrame:
    """One survivor per component: the member with the MAX score_col
    (ties -> min doc_id, so the cut is total and partitioning-free).
    The production-pipeline policy ("keep the longest / highest-quality
    copy" — CCNet keeps first, RefinedWeb random, many LLM pipelines
    keep longest); keep_first_policy is the min-id special case.

    Input: (doc_id, component_id, <score_col>). Output adds keep BOOLEAN.
    """
    w = Window.partitionBy("component_id") \
        .orderBy(F.desc(score_col), F.asc("doc_id"))
    return assignments_with_score.withColumn(
        "keep", F.row_number().over(w) == 1)


def majority_label_policy(assignments_with_label: DataFrame) -> DataFrame:
    """W5: per component, if the dominant label covers ≥ half the members keep
    exactly one doc of that label (min doc_id), else drop all members.

    Input: (doc_id, component_id, label). Output adds keep BOOLEAN.
    """
    w_comp = Window.partitionBy("component_id")
    w_lab = Window.partitionBy("component_id", "label")
    df = (
        assignments_with_label
        .withColumn("comp_size", F.count("*").over(w_comp))
        .withColumn("label_cnt", F.count("*").over(w_lab))
        .withColumn("max_cnt", F.max("label_cnt").over(w_comp))
        # deterministic dominant label: among max-count labels take the min
        .withColumn(
            "dom_label",
            F.min(F.when(F.col("label_cnt") == F.col("max_cnt"), F.col("label"))).over(w_comp),
        )
    )
    w_surv = Window.partitionBy("component_id").orderBy("doc_id")
    survivor = (
        (F.col("max_cnt") * 2 >= F.col("comp_size"))
        & (F.col("label") == F.col("dom_label"))
        & (F.row_number().over(
            Window.partitionBy("component_id")
            .orderBy(F.when(F.col("label") == F.col("dom_label"), 0).otherwise(1), "doc_id")
        ) == 1)
    )
    return df.withColumn("keep", survivor).select(
        "doc_id", "component_id", "label", "keep")


def duplicates_to_drop(assignments: DataFrame, min_size: int = 2,
                       scores: DataFrame | None = None) -> DataFrame:
    """`remove_duplicates` decision table: non-survivors of components
    ≥ min_size. Default survivor = min doc_id; pass ``scores`` (doc_id,
    score) to keep the best-scoring member instead (keep_best_policy —
    e.g. text length for the keep-longest production policy; docs
    missing from ``scores`` compete with score NULL, ranked last)."""
    sized = assignments.join(
        assignments.groupBy("component_id").agg(F.count("*").alias("comp_size")),
        "component_id",
    ).filter(F.col("comp_size") >= min_size)
    members = sized.select("doc_id", "component_id")
    if scores is None:
        decided = keep_first_policy(members)
    else:
        decided = keep_best_policy(
            members.join(scores.select("doc_id", "score"), "doc_id",
                         "left"),
            "score")
    return decided.filter(~F.col("keep")).select("doc_id", "component_id")
