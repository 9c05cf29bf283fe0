"""Label/annotation operators: enrichment joins, label scoring, majority
vote, classification report.

Reference analogs:
  * annotation enrich left-joins with per-side suffixes (J4,
    fastdup_controller.py:937-1046) and the outer-join row classifier
    VALID / MISSING_ANNOTATION / MISSING_IMAGE (J5, :1110-1224);
  * label_score: % of top-k neighbors sharing the query's label
    (A4, galleries.py:1866-1884);
  * top_k_label majority vote with min_count/threshold/unknown rules
    (A5, __init__.py:2490-2539);
  * classification report precision/recall/F1/support per class
    (A13, confusion_matrix.py:298-728 — vendored sklearn there; a pure
    DataFrame aggregation here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID = "VALID"
MISSING_ANNOTATION = "MISSING_ANNOTATION"
MISSING_DOC = "MISSING_DOC"


def expand_with_annotations(docs: DataFrame, annot: DataFrame,
                            on: str = "url") -> DataFrame:
    """J5: full outer join docs x annotations + row classification column."""
    d = docs.withColumn("_has_doc", F.lit(True))
    a = annot.withColumn("_has_annot", F.lit(True))
    out = d.join(a, on, "full_outer").withColumn(
        "status",
        F.when(F.col("_has_doc").isNotNull() & F.col("_has_annot").isNotNull(), VALID)
        .when(F.col("_has_doc").isNotNull(), MISSING_ANNOTATION)
        .otherwise(MISSING_DOC),
    )
    return out.drop("_has_doc", "_has_annot")


def enrich_pairs_with_labels(pairs: DataFrame, labels: DataFrame,
                             id_col: str = "doc_id",
                             label_col: str = "label") -> DataFrame:
    """J4: resolve both edge endpoints to labels (suffix per side)."""
    l1 = labels.select(F.col(id_col).alias("src"), F.col(label_col).alias("label"))
    l2 = labels.select(F.col(id_col).alias("dst"), F.col(label_col).alias("label2"))
    return pairs.join(l1, "src", "left").join(l2, "dst", "left")


def diff_label_pairs(pairs_with_labels: DataFrame) -> DataFrame:
    """F7: cross-class duplicates — likely labeling errors."""
    return pairs_with_labels.filter(F.col("label") != F.col("label2"))


def label_score(pairs_with_labels: DataFrame, k: int = 2,
                sim_col: str = "jaccard") -> DataFrame:
    """A4: per query doc, % of its top-k neighbors sharing its label (0-100)."""
    w = Window.partitionBy("src").orderBy(F.desc(sim_col), F.asc("dst"))
    return (
        pairs_with_labels.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("src", "label")
        .agg(F.round(F.avg(F.when(F.col("label") == F.col("label2"), 1.0)
                           .otherwise(0.0)) * 100, 4).alias("score"),
             F.count("*").alias("n_neighbors"))
    )


def top_k_label(pairs_with_labels: DataFrame, min_count: int = 1,
                threshold: float | None = None,
                unknown_class: str = "Unknown") -> DataFrame:
    """A5 majority vote: dominant neighbor label per query with min_count /
    threshold / unknown fallbacks (deterministic tie-break on label)."""
    counts = (
        pairs_with_labels.groupBy("src", "label2")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("label2"))
    totals = counts.groupBy("src").agg(F.sum("cnt").alias("total"))
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(totals, "src")
    )
    cond = F.col("cnt") >= min_count
    if threshold is not None:
        cond = cond & ((F.col("cnt") / F.col("total")) >= threshold)
    return top.select(
        "src",
        F.when(cond, F.col("label2")).otherwise(F.lit(unknown_class)).alias("predicted"),
        "cnt", "total",
    )


def slice_by_label(df: DataFrame, value: str, label_col: str = "label") -> DataFrame:
    """F6 label slice: equality with substring fallback (galleries.py:118-161).

    Works on scalar label columns and on list-of-label columns (post group-by)."""
    dt = dict(df.dtypes).get(label_col, "string")
    if dt.startswith("array"):
        exact = F.array_contains(F.col(label_col), value)
        fuzzy = F.exists(F.col(label_col), lambda x: F.lower(x).contains(value.lower()))
    else:
        exact = F.col(label_col) == value
        fuzzy = F.lower(F.col(label_col)).contains(value.lower())
    # lazy fallback: a broadcast 1-row aggregate decides exact-vs-fuzzy inside
    # the plan (the old .isEmpty() ran an eager job per operator composition)
    has_exact = df.agg(
        (F.coalesce(F.max(exact.cast("int")), F.lit(0)) == 1).alias("_has_exact"))
    return (
        df.crossJoin(F.broadcast(has_exact))
        .filter((F.col("_has_exact") & exact) | (~F.col("_has_exact") & fuzzy))
        .drop("_has_exact")
    )


def slice_components_by_keyword(grouped: DataFrame, keyword: str,
                                labels_col: str = "labels") -> DataFrame:
    """F8 keyword filter: keep components where ANY member label contains the
    keyword (galleries.py:1283-1287)."""
    return grouped.filter(
        F.exists(F.col(labels_col), lambda x: F.lower(x).contains(keyword.lower())))


def mixed_label_components(grouped: DataFrame, labels_col: str = "labels") -> DataFrame:
    """F7 component variant: clusters spanning more than one label — likely
    labeling errors (galleries.py:1182-1186)."""
    return grouped.filter(F.size(F.array_distinct(F.col(labels_col))) > 1)


def classification_report(pred: DataFrame, label_col: str = "label",
                          pred_col: str = "prediction") -> DataFrame:
    """A13: precision/recall/F1/support per class, pure DataFrame aggregation."""
    tp = (
        pred.filter(F.col(label_col) == F.col(pred_col))
        .groupBy(F.col(label_col).alias("class"))
        .agg(F.count("*").alias("tp"))
    )
    support = pred.groupBy(F.col(label_col).alias("class")).agg(
        F.count("*").alias("support"))
    predicted = pred.groupBy(F.col(pred_col).alias("class")).agg(
        F.count("*").alias("predicted"))
    rep = (
        support.join(predicted, "class", "full_outer")
        .join(tp, "class", "left")
        .na.fill(0, ["tp", "support", "predicted"])
        .withColumn("precision",
                    F.when(F.col("predicted") == 0, 0.0)
                    .otherwise(F.round(F.col("tp") / F.col("predicted"), 6)))
        .withColumn("recall",
                    F.when(F.col("support") == 0, 0.0)
                    .otherwise(F.round(F.col("tp") / F.col("support"), 6)))
    )
    return rep.withColumn(
        "f1",
        F.when((F.col("precision") + F.col("recall")) == 0, 0.0)
        .otherwise(F.round(2 * F.col("precision") * F.col("recall")
                           / (F.col("precision") + F.col("recall")), 6)),
    ).select("class", "tp", "support", "predicted", "precision", "recall", "f1")
