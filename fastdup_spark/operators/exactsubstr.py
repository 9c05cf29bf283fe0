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

Scale shape (measured on the 10k-page bench corpus, 2.4M tokens):
  * window hashing is the cost center. ``hash_mode="fast"`` (default)
    hashes TOKENS once on the JVM (xxhash64) and composes the m = n-k+1
    positional window hashes with the same numpy rolling k-gram combiner
    the MinHash stage uses (functions/signatures.py — k cache-resident
    passes, one Arrow transfer), ~k x less string bandwidth than
    hashing every k-word concat; hash + position explode are fused in
    one mapInPandas (a scalar UDF + posexplode double-evaluates under
    the generator's implicit filter). ``hash_mode="oracle"`` keeps the
    pure built-in md5(concat_ws) form the DuckDB driver oracle replays
    verbatim. Measured end-to-end at k=50: 60-72s oracle, 4-8s fast —
    identical outputs.
  * the flag pass shuffles (doc_id, start, hash) ONLY, as a hash
    AGGREGATE (min(doc_id) != max(doc_id) per key — ">= 2 distinct
    docs" with no per-key set even for a license header in millions of
    docs) + a semi join back: partial map-side combine, never a
    sort-based window over the full window stream (same-session
    min-of-2 e2e at 1M pages/235M windows: 60.4s vs 65.9s window form —
    ~3.9M tokens/s warm; the sort is the asymptotic hazard). The semi
    join recomputes the cheap hash mapper on its build side rather
    than materializing 1e8+ rows.
  * flagged window starts are merged into DISJOINT spans FIRST (lag
    window per doc: new-span flag, running span id, min/max per span) —
    never the naive k-rows-per-window coverage explode, which emits
    ~k x the flagged count (28M rows on the bench corpus) before
    deduplication.
  * documents are NEVER tokenized-exploded: the surviving text is
    rebuilt doc-locally with an indexed higher-order filter of the
    token array against the doc's few merged spans.
Shuffle inventory: hash-flag window, doc-keyed span merge, one
doc-keyed join of the tiny span table back to the corpus.

Determinism: clean_text keeps surviving tokens in original order by
construction (no collect_list order reliance); the kept verdict
compares integer token counts (n_dropped * denom <= num * n_tokens),
never floats. Both hash modes produce identical decisions up to hash
collisions (~2^-64/pair; parity-tested).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textql import ws_tokens_expr

_ESUB_SEED = 2_000_003  # fixed -> fixed combiner constants (determinism)


def _tokens(text_col) -> "F.Column":
    """Non-empty ws-tokens: identical to ws_tokens_expr except that a
    blank doc yields [] instead of [''] (blank docs produce no windows
    either way; this keeps indices aligned with the token filter the
    reassembly applies). NULL text coalesces to '' first — without it a
    NULL row ships a NULL token array into the fast-path Arrow kernel
    (np.asarray(None) -> crash) and 3VL-poisons n_tokens/kept in the
    rebuild (a NULL doc must be kept with empty text, like a blank one)."""
    return F.filter(ws_tokens_expr(F.coalesce(text_col, F.lit(""))),
                    lambda t: t != "")


def kgram_windows(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, start, gram): every OVERLAPPING k-token window over the
    shared ws-token stream as a string, 1-based start; docs shorter than
    k tokens contribute none. The oracle-replayable form (md5 of these
    grams is what the DuckDB driver oracle recomputes)."""
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


def make_window_hash_mapper(k: int, seed: int = _ESUB_SEED):
    """mapInPandas fn: (doc_id, th: array<bigint> token hashes) batches ->
    EXPLODED (doc_id, start, gk) rows, one per k-gram window (1-based
    start; docs shorter than k tokens emit nothing). Same
    position-weighted rolling combiner as the signature stage
    (functions/signatures.py::combine_shingles_numpy) but keeping every
    position instead of the distinct set — hash + explode fused in ONE
    Arrow pass (a scalar array-returning UDF + posexplode would make
    Catalyst evaluate the UDF twice: once under the generator's implicit
    non-empty filter, once for the project)."""
    from ..functions.signatures import shingle_combine_params

    c = shingle_combine_params(k, seed)

    def _wh(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, starts, hashes = [], [], []
            for doc_id, th in zip(pdf["doc_id"].to_numpy(),
                                  pdf["th"].to_numpy()):
                if th is None:  # NULL token array (defense in depth;
                    continue    # _tokens() coalesces NULL text upstream)
                th = np.asarray(th, dtype=np.int64).astype(np.uint64)
                n = th.size
                if n < k:
                    continue
                m = n - k + 1
                s = np.zeros(m, dtype=np.uint64)
                for j in range(k):  # k cache-resident passes
                    s += c[j] * th[j:j + m]
                ids.append(np.full(m, doc_id, dtype=np.int64))
                starts.append(np.arange(1, m + 1, dtype=np.int32))
                hashes.append(s.view(np.int64))
            if not ids:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                    "start": pd.Series([], dtype="int32"),
                                    "gk": pd.Series([], dtype="int64")})
                continue
            yield pd.DataFrame({"doc_id": np.concatenate(ids),
                                "start": np.concatenate(starts),
                                "gk": np.concatenate(hashes)})

    return _wh


def require_numeric_id(df: DataFrame, id_col: str, ctx: str) -> None:
    """The fused Arrow fast paths ship ids as int64 — a string id would
    either crash the ANSI cast or, worse, silently collapse distinct ids
    that normalize to the same long ('0012' vs '12'), merging docs.
    Raise early with guidance instead."""
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType)

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"{ctx} requires an integer id column; {id_col!r} is "
            f"{dt.simpleString()}. Pre-hash string ids (e.g. "
            f"F.xxhash64({id_col!r})) or use hash_mode='oracle' where "
            f"available.")


def _flagged_starts(docs: DataFrame, k: int, min_docs: int, id_col: str,
                    text_col: str, hash_mode: str) -> DataFrame:
    """(doc_id, start) of every window whose content appears in >=
    min_docs distinct docs."""
    if hash_mode == "oracle":
        g = kgram_windows(docs, k, id_col, text_col) \
            .select("doc_id", "start", F.md5("gram").alias("gk"))
    elif hash_mode == "fast":
        from ..functions.signatures import token_hashes_expr

        require_numeric_id(docs, id_col, "hash_mode='fast'")
        g = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            token_hashes_expr(_tokens(F.col(text_col))).alias("th"),
        ).mapInPandas(make_window_hash_mapper(k),
                      "doc_id long, start int, gk long")
    else:
        raise ValueError(f"hash_mode must be 'fast' or 'oracle', "
                         f"got {hash_mode!r}")
    from .dedup import cross_doc_duplicated

    return cross_doc_duplicated(g, "gk", min_docs) \
        .select("doc_id", "start")


def merged_spans(starts: DataFrame, k: int) -> DataFrame:
    """Flagged window starts -> disjoint merged token intervals:
    (doc_id, spans array<struct<s,e>>, n_spans, n_dropped). Two windows
    merge only when their coverages OVERLAP (start <= prev + k - 1, i.e.
    they share at least one token); windows whose coverage exactly abuts
    (start == prev + k, contiguous but non-overlapping) stay separate
    spans — n_dropped is unaffected (spans stay disjoint) but n_spans
    counts such a contiguous erased run as two. This is the contract the
    DuckDB driver oracle replays; keep both engines on the same rule."""
    wd = Window.partitionBy("doc_id").orderBy("start")
    wrun = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = (
        starts.withColumn("prev", F.lag("start").over(wd))
        .withColumn(
            "new_span",
            (F.col("prev").isNull()
             | (F.col("start") > F.col("prev") + (k - 1))).cast("int"))
        .withColumn("span_id", F.sum("new_span").over(wrun))
    )
    per_span = (
        numbered.groupBy("doc_id", "span_id")
        .agg(F.min("start").alias("s"),
             (F.max("start") + (k - 1)).alias("e"))
    )
    return (
        per_span.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "e"))).alias("spans"),
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("long")
            .alias("n_dropped"),
        )
    )


def remove_duplicated_spans(docs: DataFrame, k: int = 8, min_docs: int = 2,
                            max_drop_frac: float = 0.3,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            hash_mode: str = "fast") -> DataFrame:
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

    ``hash_mode``: "fast" (default) = JVM token xxhash64 + numpy rolling
    window combine; "oracle" = built-in md5(k-word concat), the form the
    DuckDB driver oracle replays end-to-end. Identical decisions up to
    ~2^-64 hash collisions.
    """
    starts = _flagged_starts(docs, k, min_docs, id_col, text_col, hash_mode)
    return rewrite_without_spans(docs, starts, k, max_drop_frac,
                                 id_col, text_col)


def rewrite_without_spans(docs: DataFrame, starts: DataFrame, k: int,
                          max_drop_frac: float = 0.3,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Erase the k-token windows named by ``starts`` (doc_id, start)
    from the corpus: span merge + doc-local rebuild + the kill rule —
    the shared tail of remove_duplicated_spans, also driven by the
    history-Bloom scrub (operators/bloom.py::span_bloom_scrub), which
    supplies starts flagged against a compressed history instead of a
    corpus self-window. Output schema matches remove_duplicated_spans."""
    from .dedup import integer_fraction

    num, den = integer_fraction(max_drop_frac)
    spans = merged_spans(starts, k)

    toks = _tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    zero = F.lit(0).cast("long")
    no_spans = F.array().cast("array<struct<s:int,e:int>>")
    joined = base.join(spans, "doc_id", "left").select(
        "doc_id", "toks",
        F.coalesce(F.col("spans"), no_spans).alias("spans"),
        F.coalesce(F.col("n_spans"), zero).alias("n_spans"),
        F.coalesce(F.col("n_dropped"), zero).alias("n_dropped"),
    )
    # doc-local rebuild: token i+1 survives unless a merged span covers
    # it. exists() is O(n_spans) per token and spans are few per doc;
    # docs with no spans skip straight through (exists over [] = false).
    clean = F.array_join(
        F.filter(
            F.col("toks"),
            lambda t, i: ~F.exists(
                F.col("spans"),
                lambda sp: (sp["s"] <= i + 1) & (i + 1 <= sp["e"]))),
        " ")
    return joined.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size("toks").cast("long").alias("n_tokens"),
        "n_dropped",
        "n_spans",
        (F.col("n_dropped") * den
         <= F.size("toks").cast("long") * num).alias("kept"),
    )
