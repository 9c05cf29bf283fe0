"""Line-level dedup: remove cross-doc duplicated lines, kill gutted docs.

RefinedWeb (Penedo et al. 2023, "line-wise corrections") and FineWeb
dedup at LINE granularity: navigation menus, cookie banners, share
buttons and footer boilerplate repeat verbatim across pages even when
the documents are otherwise unique, so whole-doc and passage dedup miss
them. The production rule is two-part: (1) a line whose exact content
appears in >= ``min_docs`` distinct docs is dropped from EVERY doc
(drop-everywhere, matching `operators/passages.py` semantics); (2) a doc
that loses more than ``max_drop_frac`` of its characters to rule (1) is
killed outright — what remains after that much boilerplate removal is
usually incoherent (FineWeb drops docs losing >30% by chars).

The reference has no line surface (image engine); this is part of the
beyond-the-reference LLM-data tier (SURVEY §2 addenda).

Scale shape (default min_docs=2): ONE window shuffle on the line hash
(is_dup = min(doc_id) != max(doc_id) over the hash — exactly ">= 2
distinct docs" with no per-key set materialization even for a banner
line occurring in millions of docs) and one groupBy(doc) to reassemble.
Generic min_docs falls back to a count-distinct aggregate + left join.
No collect, no Python UDFs — everything is built-in expressions in
WholeStageCodegen, and the DuckDB driver oracle (`line_dedup`) replays
the whole thing verbatim.

Determinism: clean_text is the newline-join of the doc's surviving
trimmed lines in original order (array_sort on (idx, line) structs —
no collect_list order reliance); the kept verdict compares integer char
counts (chars_dropped * denom <= num * chars_total), never floats.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# trim spaces, tabs and CRs (Windows line endings leave \r before \n)
_TRIM = "trim(BOTH ' \t\r' FROM {})"


def doc_lines(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, idx, line): the doc's non-blank trimmed lines, 1-based idx
    over the raw newline split (blank lines keep their slots out of the
    output but idx stays stable for the survivors' relative order)."""
    raw = F.posexplode(F.split(F.col(text_col), "\n", -1))
    out = (
        docs.select(F.col(id_col).alias("doc_id"),
                    raw.alias("idx0", "raw"))
        .select("doc_id", (F.col("idx0") + 1).alias("idx"),
                F.expr(_TRIM.format("raw")).alias("line"))
        .filter(F.col("line") != "")
    )
    return out


def remove_duplicated_lines(docs: DataFrame, min_docs: int = 2,
                            max_drop_frac: float = 0.3,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Rewrite the corpus with cross-doc duplicated lines removed.

    Returns one row per input doc:
      (doc_id, clean_text, n_lines, n_dropped, chars_total, chars_dropped,
       kept)
    where n_lines counts the doc's non-blank trimmed lines, n_dropped the
    lines removed because their exact content appeared in >= ``min_docs``
    distinct docs, chars_* the trimmed-line character totals, clean_text
    the surviving lines newline-joined in order, and kept is False when
    chars_dropped / chars_total > ``max_drop_frac`` (integer-exact
    comparison; a doc with no non-blank lines is kept with empty text).
    Downstream keeps ``filter(kept)`` docs and trains on clean_text.
    """
    frac = Fraction(max_drop_frac).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator

    ln = doc_lines(docs, id_col, text_col).withColumn("lk", F.md5("line"))
    if min_docs == 2:
        # fast path: ">= 2 distinct docs" == min != max over the line hash
        wlk = Window.partitionBy("lk")
        flagged = ln.withColumn(
            "is_dup",
            F.min("doc_id").over(wlk) != F.max("doc_id").over(wlk))
    else:
        dup = (
            ln.groupBy("lk")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("lk", F.lit(True).alias("is_dup"))
        )
        flagged = ln.join(dup, "lk", "left") \
            .withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))
    per_doc = (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("long").alias("n_dropped"),
            F.sum(F.length("line")).cast("long").alias("chars_total"),
            F.sum(F.when(F.col("is_dup"), F.length("line")).otherwise(0))
            .cast("long").alias("chars_dropped"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(
                            F.struct("idx", "line", "is_dup"))),
                        lambda s: ~s["is_dup"]),
                    lambda s: s["line"]),
                "\n").alias("clean_text"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines"), zero).alias("n_lines"),
            F.coalesce(F.col("n_dropped"), zero).alias("n_dropped"),
            F.coalesce(F.col("chars_total"), zero).alias("chars_total"),
            F.coalesce(F.col("chars_dropped"), zero).alias("chars_dropped"),
            (F.coalesce(F.col("chars_dropped"), zero) * den
             <= F.coalesce(F.col("chars_total"), zero) * num).alias("kept"),
        )
    )
