"""Per-document stats + run summary — text analogs of the reference's
`atrain_stats.csv` (21 image metrics: width/height/unique/blur/mean/...,
/root/reference/fastdup/definitions.py:28-30,110; /root/reference/RUN.md:320-329)
and `summary()` (/root/reference/fastdup/fastdup_controller.py:660-756).

All pure built-in expressions (WholeStageCodegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdup_spark.operators.textql import ws_tokens_expr


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "url") -> DataFrame:
    """Per-doc stats. Image-metric analogs:
    n_chars≈file_size, distinct_token_ratio≈unique, repeated_line_ratio≈blur
    (boilerplate density), digit/punct ratios≈contrast-style intensity stats."""
    t = F.col(text_col)
    tokens = ws_tokens_expr(t)
    lines = F.split(t, "\n")
    nonblank = F.filter(lines, lambda l: F.trim(l) != "")
    n_chars = F.length(t)
    stripped_digits = F.length(F.regexp_replace(t, r"[0-9]", ""))
    stripped_punct = F.length(F.regexp_replace(t, r"[\.,!\?;:]", ""))
    stripped_space = F.length(F.regexp_replace(t, r"\s", ""))
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        F.size(tokens).alias("n_tokens"),
        F.size(lines).alias("n_lines"),
        F.size(nonblank).alias("n_nonblank_lines"),
        (F.size(F.array_distinct(tokens)) / F.size(tokens)).alias("distinct_token_ratio"),
        F.when(F.size(nonblank) == 0, 0.0)
         .otherwise(1.0 - F.size(F.array_distinct(nonblank)) / F.size(nonblank))
         .alias("repeated_line_ratio"),
        ((n_chars - stripped_digits) / n_chars).alias("digit_ratio"),
        ((n_chars - stripped_punct) / n_chars).alias("punct_ratio"),
        ((n_chars - stripped_space) / n_chars).alias("space_ratio"),
        (stripped_space / F.size(tokens)).alias("avg_token_len"),
        F.array_max(F.transform(lines, F.length)).alias("max_line_len"),
    )


def summary_stats(n_pages: int, n_valid: int, n_quarantined: int,
                  component_info: DataFrame, n_pairs: int,
                  n_outliers: int) -> dict:
    """Run summary dict (≈ fd.summary()). Scalar counts come from the stage
    markers (no re-scans); only the component histogram needs one aggregate
    over the (small) component_info table."""
    comp_row = component_info.filter("count >= 2").agg(
        F.count("*").alias("n_components"),
        F.coalesce(F.max("count"), F.lit(0)).alias("largest_component"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("docs_in_components"),
    ).collect()[0]
    docs_in_comp = int(comp_row["docs_in_components"])
    return {
        "total_pages": n_pages,
        "valid_docs": n_valid,
        "quarantined": n_quarantined,
        "similarity_pairs": n_pairs,
        "components_ge2": int(comp_row["n_components"]),
        "largest_component": int(comp_row["largest_component"]),
        "docs_in_components": docs_in_comp,
        "pct_in_components": (100.0 * docs_in_comp / n_valid) if n_valid else 0.0,
        "outliers": n_outliers,
        "pct_outliers": (100.0 * n_outliers / n_valid) if n_valid else 0.0,
    }
