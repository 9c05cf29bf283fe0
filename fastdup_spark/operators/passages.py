"""Passage-level dedup: identify AND remove cross-doc repeated passages.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") shows duplicated SUBSTRINGS — boilerplate paragraphs, license
headers, navigation text repeated across pages — matter as much as
whole-document duplicates. CCNet removes duplicated paragraphs by hash.
This module is the corpus-rewriting form of the identification query the
driver already oracle-checks (`passage_dedup`): fixed non-overlapping
``chunk_words``-word chunks, a chunk dropped from EVERY doc when its
hash appears in >= ``min_docs`` distinct docs (CCNet drop-everywhere
semantics — simpler and SQL-replayable, vs. Lee et al.'s keep-one),
remaining chunks reassembled in order with the sub-chunk tail preserved.

The reference has no passage surface (image engine); this is part of the
beyond-the-reference LLM-data tier (SURVEY §2 addenda).

Scale shape (default min_docs=2): the flag pass shuffles (doc_id, idx,
xxhash64(chunk)) ONLY — 20 bytes/chunk, never the chunk text (is_rep =
min(doc_id) != max(doc_id) window over the hash — exactly ">= 2
distinct docs", with no per-key set materialization even when a
boilerplate chunk occurs in millions of docs; generic min_docs falls
back to a count-distinct aggregate + semi join). The DROPPED (doc_id,
idx) rows — the repeated minority — aggregate into one small per-doc
index array, and the doc is rewritten DOC-LOCALLY: chunks re-derive in
place and an indexed filter removes the dropped slots, so corpus text
crosses exactly one doc-keyed join shuffle instead of the window +
collect_list round trip (2 full-text shuffles) of the naive form. Same
pattern as operators/exactsubstr.py and operators/lines.py. No collect,
no Python UDFs — everything is built-in expressions in
WholeStageCodegen, and the DuckDB driver oracle (`passage_removal`)
replays the semantics verbatim (the hash only marks equality; the
oracle re-derives equality from the text itself).

Determinism: output text is the single-space join of the doc's surviving
normalized tokens, in order by construction (in-place rebuild — no
collect_list order reliance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textql import ws_tokens_expr as _tokens


def passage_chunks(docs: DataFrame, chunk_words: int = 20,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, idx, passage): non-overlapping ``chunk_words``-word chunks
    per doc, 1-based idx; docs shorter than one chunk contribute none."""
    w = _tokens(F.col(text_col))
    k = chunk_words
    chunks = F.when(
        F.size(w) < k, F.array().cast("array<struct<idx:int,passage:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), (F.size(w) / k).cast("int")),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.concat_ws(" ", F.slice(w, (i - 1) * k + 1, k))
                .alias("passage")),
        ))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(chunks).alias("c"))
        .select("doc_id", F.col("c.idx").alias("idx"),
                F.col("c.passage").alias("passage"))
    )


def remove_repeated_passages(docs: DataFrame, chunk_words: int = 20,
                             min_docs: int = 2, id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Rewrite the corpus with cross-doc repeated passages removed.

    Returns (doc_id, clean_text, n_chunks, n_dropped): clean_text = the
    doc's surviving chunks in order plus the sub-chunk tail, single-space
    joined (whitespace-normalized); n_chunks = full chunks in the doc;
    n_dropped = chunks removed because their hash appeared in >=
    ``min_docs`` distinct docs. Every input doc gets exactly one row.
    """
    from .dedup import cross_doc_duplicated

    k = chunk_words
    # flag pass: hash-only shuffle (the chunk text never leaves its doc)
    ch = passage_chunks(docs, k, id_col, text_col) \
        .select("doc_id", "idx", F.xxhash64("passage").alias("pk"))
    dropped = cross_doc_duplicated(ch, "pk", min_docs) \
        .select("doc_id", "idx")
    per_doc = dropped.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("idx")).alias("didx"))

    # doc-local rebuild: chunks re-derive in place, dropped slots skipped
    w = _tokens(F.col(text_col))
    n_full = (F.size(w) / k).cast("int")
    tail = F.when(
        F.size(w) > n_full * k,
        F.concat_ws(" ", F.slice(w, n_full * k + 1, F.size(w) - n_full * k))
    ).otherwise(F.lit(""))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       w.alias("w"),
                       n_full.cast("long").alias("n_chunks"),
                       tail.alias("tail"))
    no_idx = F.array().cast("array<int>")
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id", "w", "n_chunks", "tail",
        F.coalesce(F.col("didx"), no_idx).alias("didx"))
    # guard: sequence(1, 0) DESCENDS in Spark — chunkless docs get []
    slots = F.when(F.col("n_chunks") < 1, F.array().cast("array<int>")) \
        .otherwise(F.sequence(F.lit(1), joined["n_chunks"].cast("int")))
    body = F.array_join(
        F.transform(
            F.filter(slots,
                     lambda i: ~F.array_contains(F.col("didx"), i)),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("w"), (i - 1) * k + 1, k))),
        " ")
    return joined.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.when(body != "", body),  # NULL (skipped), never ""
            F.when(F.col("tail") != "", F.col("tail")),
        ).alias("clean_text"),
        "n_chunks",
        F.size("didx").cast("long").alias("n_dropped"),
    )
