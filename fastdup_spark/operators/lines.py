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

Scale shape (default min_docs=2): the flag pass shuffles (doc_id, idx,
xxhash64(line)) ONLY — 20 bytes/line, never the line text (is_dup =
min(doc_id) != max(doc_id) window over the hash — exactly ">= 2
distinct docs" with no per-key set materialization even for a banner
line occurring in millions of docs; generic min_docs falls back to a
count-distinct aggregate + semi join). The DROPPED (doc_id, idx) rows —
the duplicated minority — aggregate into one small per-doc index array,
and the doc is rewritten DOC-LOCALLY: the raw text re-splits in place
and an indexed higher-order filter removes the dropped slots, so the
corpus text crosses exactly one doc-keyed join shuffle instead of the
window + collect_list round trip (2 full-text shuffles) of the naive
form. Same pattern as operators/exactsubstr.py. No collect, no Python
UDFs — everything is built-in expressions in WholeStageCodegen, and the
DuckDB driver oracle (`line_dedup`) replays the semantics verbatim
(the hash only marks equality; the oracle re-derives equality from the
text itself).

Determinism: clean_text is the newline-join of the doc's surviving
trimmed lines in original order by construction (in-place rebuild — no
collect_list order reliance); the kept verdict compares integer char
counts (chars_dropped * denom <= num * chars_total), never floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# trim spaces, tabs and CRs (Windows line endings leave \r before \n)
_TRIM = "trim(BOTH ' \t\r' FROM {})"


def doc_lines(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, idx, line): the doc's non-blank trimmed lines, 1-based idx
    over the raw newline split (blank lines keep their slots out of the
    output but idx stays stable for the survivors' relative order)."""
    # NULL text coalesces to '' so a NULL doc behaves like a blank one
    # (no lines) instead of 3VL-poisoning downstream verdicts
    raw = F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                               "\n", -1))
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
    from .dedup import cross_doc_duplicated, integer_fraction

    num, den = integer_fraction(max_drop_frac)

    # flag pass: hash-only shuffle (the line text never leaves its doc)
    ln = doc_lines(docs, id_col, text_col) \
        .select("doc_id", "idx", F.xxhash64("line").alias("lk"))
    dropped = cross_doc_duplicated(ln, "lk", min_docs) \
        .select("doc_id", "idx")
    per_doc = dropped.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("idx")).alias("didx"))

    # doc-local rebuild: re-split in place, drop flagged slots by index.
    # NULL text -> '' (one blank line): the doc is kept with empty
    # clean_text and zero counts rather than a NULL kept verdict that
    # filter(kept) AND filter(~kept) both silently drop (3VL).
    trimmed = F.transform(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1),
        lambda s: F.btrim(s, F.lit(" \t\r")))
    base = docs.select(F.col(id_col).alias("doc_id"), trimmed.alias("ls"))
    no_idx = F.array().cast("array<int>")
    zero = F.lit(0).cast("long")
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id", "ls", F.coalesce(F.col("didx"), no_idx).alias("didx"))
    chars_dropped = F.aggregate(
        F.col("didx"), zero,
        lambda acc, i: acc + F.length(F.element_at(F.col("ls"), i)))
    clean = F.array_join(
        F.filter(
            F.col("ls"),
            lambda x, i: (x != "") & ~F.array_contains(F.col("didx"),
                                                       i + 1)),
        "\n")
    chars_total = F.aggregate(F.col("ls"), zero,
                              lambda acc, x: acc + F.length(x))
    return joined.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.filter(F.col("ls"), lambda x: x != ""))
        .cast("long").alias("n_lines"),
        F.size("didx").cast("long").alias("n_dropped"),
        chars_total.alias("chars_total"),
        chars_dropped.alias("chars_dropped"),
        (chars_dropped * den <= chars_total * num).alias("kept"),
    )
