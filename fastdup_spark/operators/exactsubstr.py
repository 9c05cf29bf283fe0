"""Exact duplicated-SPAN removal at arbitrary offsets (ExactSubstr form).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499) show that training corpora contain verbatim
duplicated substrings at ARBITRARY offsets — quoted articles, license
headers pasted mid-page, syndicated paragraphs with different lead-ins —
which fixed-boundary passage hashing (`operators/passages.py`) misses
whenever the copy is shifted relative to the chunk grid. Their
ExactSubstr tool removes every duplicated token run of length >= k
(k=50 BPE tokens in the paper) using a monolithic suffix array — a
single-machine design that cannot shard.

This module is the Spark-native reformulation: a duplicated run of
length L >= k is exactly the union of its L-k+1 overlapping k-token
windows, so flagging every k-gram window whose hash appears in >=
``min_docs`` distinct docs and erasing the tokens covered by flagged
windows removes precisely the maximal cross-doc duplicated runs of
length >= k — no suffix array, no global structure, every stage a
shuffle-partitioned DataFrame op. Runs shorter than k are untouched
(the paper's guarantee). Semantics are drop-everywhere (CCNet-style,
like passages.py/lines.py) rather than the paper's keep-one: keep-one
over PARTIALLY overlapping shifted copies has no well-defined SQL
replay, while drop-everywhere is exactly reproducible by the DuckDB
driver oracle (`exact_substring_removal`).

The reference has no substring surface (image engine); this is part of
the beyond-the-reference LLM-data tier (SURVEY §2 addenda).

Scale shape: the window explode is n-k+1 rows per doc — the same row
count (and the same cost class) as the MinHash shingle stage, and the
k-word gram text is hashed to 16 bytes BEFORE the shuffle so the flag
pass moves (doc_id, start, md5) only. Default min_docs=2 flags with ONE
window shuffle on the gram hash (min(doc_id) != max(doc_id) — ">= 2
distinct docs" with no per-key set even for a license header in
millions of docs); generic min_docs falls back to a count-distinct
aggregate + hash join. Covered-token expansion explodes k rows per
FLAGGED window only (the duplicated minority), then one (doc_id, idx)
distinct + one co-partitioned join against the token stream and one
groupBy(doc) reassembly. No collect, no Python UDFs — built-in
expressions end to end.

Determinism: clean_text is the single-space join of surviving tokens in
original order (array_sort over (idx, tok) structs — no collect_list
order reliance); the kept verdict compares integer token counts
(n_dropped * denom <= num * n_tokens), never floats.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textql import ws_tokens_expr as _tokens


def kgram_windows(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, start, gram): every OVERLAPPING k-token window over the
    shared ws-token stream, 1-based start; docs shorter than k tokens
    contribute none."""
    w = _tokens(F.col(text_col))
    n = F.size(w)
    empty = F.array().cast("array<struct<start:int,gram:string>>")
    grams = F.when(n < k, empty).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.struct(
                i.cast("int").alias("start"),
                F.concat_ws(" ", F.slice(w, i, k)).alias("gram")),
        ))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.start").alias("start"),
                F.col("g.gram").alias("gram"))
    )


def remove_duplicated_spans(docs: DataFrame, k: int = 8, min_docs: int = 2,
                            max_drop_frac: float = 0.3,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Rewrite the corpus with cross-doc duplicated >=k-token runs removed.

    Returns one row per input doc:
      (doc_id, clean_text, n_tokens, n_dropped, n_spans, kept)
    where n_tokens counts the doc's ws-tokens, n_dropped the tokens
    erased because they sit inside a k-token window whose exact content
    appears in >= ``min_docs`` distinct docs, n_spans the number of
    MERGED erased intervals (two flagged windows overlap/abut into one
    span when their starts differ by <= k-1), clean_text the surviving
    tokens single-space-joined in order, and kept is False when
    n_dropped / n_tokens > ``max_drop_frac`` (integer-exact comparison;
    a doc with no tokens is kept with empty text). Downstream keeps
    ``filter(kept)`` docs and trains on clean_text.
    """
    frac = Fraction(max_drop_frac).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator

    # hash the k-word gram to 16 bytes BEFORE the flag shuffle
    g = kgram_windows(docs, k, id_col, text_col) \
        .select("doc_id", "start", F.md5("gram").alias("gk"))
    if min_docs == 2:
        # fast path: ">= 2 distinct docs" == min != max over the gram hash
        wgk = Window.partitionBy("gk")
        flagged = g.withColumn(
            "is_dup",
            F.min("doc_id").over(wgk) != F.max("doc_id").over(wgk))
    else:
        dup = (
            g.groupBy("gk")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("gk", F.lit(True).alias("is_dup"))
        )
        flagged = g.join(dup, "gk", "left") \
            .withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))
    starts = flagged.filter(F.col("is_dup")).select("doc_id", "start")

    # merged-interval count from the sorted start stream: a flagged
    # window opens a NEW span iff it starts past the previous window's
    # coverage (prev + k - 1)
    wd = Window.partitionBy("doc_id").orderBy("start")
    spans = (
        starts.withColumn("prev", F.lag("start").over(wd))
        .withColumn(
            "new_span",
            (F.col("prev").isNull()
             | (F.col("start") > F.col("prev") + (k - 1))).cast("int"))
        .groupBy("doc_id")
        .agg(F.sum("new_span").cast("long").alias("n_spans"))
    )

    # covered token positions: k rows per flagged window, deduped
    dropped = (
        starts.select(
            "doc_id",
            F.explode(F.sequence(F.col("start"),
                                 F.col("start") + (k - 1))).alias("idx"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )

    # the token stream (empty-token rows exist only for blank docs,
    # which produce no windows — filtering them cannot shift any idx)
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.posexplode(_tokens(F.col(text_col)))
                    .alias("idx0", "tok"))
        .select("doc_id", (F.col("idx0") + 1).alias("idx"), "tok")
        .filter(F.col("tok") != "")
    )
    marked = toks.join(dropped, ["doc_id", "idx"], "left") \
        .withColumn("is_dup", F.coalesce(F.col("hit"), F.lit(False)))
    per_doc = (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("long").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(
                            F.struct("idx", "tok", "is_dup"))),
                        lambda s: ~s["is_dup"]),
                    lambda s: s["tok"]),
                " ").alias("clean_text"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_tokens"), zero).alias("n_tokens"),
            F.coalesce(F.col("n_dropped"), zero).alias("n_dropped"),
            F.coalesce(F.col("n_spans"), zero).alias("n_spans"),
            (F.coalesce(F.col("n_dropped"), zero) * den
             <= F.coalesce(F.col("n_tokens"), zero) * num).alias("kept"),
        )
    )
