"""Deterministic sequence packing: docs -> fixed-capacity training bins.

LM training consumes fixed-length context windows; feeding one (padded)
document per window wastes most of the batch on short web pages, so
production pipelines PACK documents into windows (T5's "packing",
GPT-style concat-and-chop, Krell et al. 2022 "Efficient Sequence Packing
without Cross-contamination"). This operator is the no-split form: each
doc lands wholly inside one bin (so attention masks can isolate docs and
no doc is truncated), bins are filled NEXT-FIT in a deterministic
pseudorandom order, and the result is reproducible bit-for-bit across
runs, partitionings and cluster sizes — the same contract as
`operators/shards.py`, whose md5 shard/pos permutation this builds on.

The reference has no training-output surface (image engine); this is
part of the beyond-the-reference LLM-data tier (SURVEY §2 addenda).

Why next-fit (not first-fit-decreasing): FFD needs the global multiset
of open bins — inherently sequential state that cannot shard. Next-fit
state is ONE (bin, fill) pair carried along a fixed walk order, so each
shard packs independently and in parallel, and the walk order inside a
shard is the md5-rank order — deterministic. Next-fit wastes at most one
doc's worth of tail per bin (2-approx worst case; on web-page length
mixes utilization is high because the order is hash-randomized, not
length-sorted). Oversize docs (n_tokens > capacity) get a bin of their
own and are flagged rather than silently truncated.

Scale shape: one hash shuffle to shards (reusing assign_training_shards)
plus ONE applyInPandas pass per shard. The per-shard walk is a
sequential recurrence (fill carries across rows), which no built-in
Spark expression expresses — Spark 4's recursive CTE would need one
distributed iteration per doc in the longest shard, so the grouped
pandas kernel (O(rows) integer loop over ~target_rows_per_shard rows,
Arrow in/out) is the honest distributed design. The DuckDB driver
oracle (`sequence_packing`) replays the recurrence exactly with a
recursive CTE walking all shards in lockstep.

Determinism: the recurrence depends only on (salt, doc_id, n_tokens);
groups arrive whole per shard, sorted inside the kernel by pos — no
partition-order reliance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shards import assign_training_shards
from .textql import ws_tokens_expr as _tokens

_OUT_SCHEMA = ("doc_id long, shard int, pos long, n_tokens long, "
               "bin long, bin_offset long, oversize boolean")


def token_count_expr(text_col) -> "F.Column":
    """ws-token count under the shared tokenizer contract; whitespace-only
    docs count 0 (the lone empty token is excluded, matching every other
    consumer and the DuckDB replay len(list_filter(w, x -> x <> '')))."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.filter(_tokens(col), lambda t: t != "")).cast("long")


def pack_sequences(docs: DataFrame, capacity: int, n_shards: int,
                   salt: str = "", id_col: str = "doc_id",
                   text_col: str = "text",
                   count_col: str | None = None) -> DataFrame:
    """Assign every doc to a (shard, bin, bin_offset) training slot.

    Returns one row per input doc:
      (doc_id, shard, pos, n_tokens, bin, bin_offset, oversize)
    where (shard, pos) is the deterministic shuffle slot
    (operators/shards.py), bin is the 1-based next-fit bin inside the
    shard walking pos order, bin_offset the token offset of the doc
    inside its bin, and oversize flags docs with n_tokens > capacity
    (they occupy a bin alone; nothing is truncated). A doc with zero
    tokens occupies a zero-width slot in the current bin.

    ``count_col`` names a precomputed token-count column (e.g. real BPE
    counts); by default counts come from the shared ws-token contract so
    the driver oracle can replay them.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    from .exactsubstr import require_numeric_id

    require_numeric_id(docs, id_col, "pack_sequences")
    n = (F.col(count_col).cast("long") if count_col
         else token_count_expr(text_col))
    # NULL text / NULL count rows pack as zero-width slots — a NaN
    # reaching the grouped kernel would kill the whole job
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.coalesce(n, F.lit(0).cast("long"))
                       .alias("n_tokens"))
    sharded = assign_training_shards(base, n_shards, salt, "doc_id") \
        .select("doc_id", "shard", "pos", "n_tokens")
    cap = int(capacity)

    def _pack(pdf):
        pdf = pdf.sort_values("pos", ignore_index=True)
        counts = pdf["n_tokens"].to_numpy()
        bins = [0] * len(pdf)
        offs = [0] * len(pdf)
        b, fill = 0, cap + 1  # sentinel: nothing fits -> first row opens bin 1
        for j, nt in enumerate(counts):
            nt = int(nt)
            if fill + nt <= cap:
                offs[j] = fill
                fill += nt
            else:
                b += 1
                offs[j] = 0
                fill = nt
            bins[j] = b
        pdf = pdf.assign(bin=bins, bin_offset=offs,
                         oversize=counts > cap)
        return pdf[["doc_id", "shard", "pos", "n_tokens",
                    "bin", "bin_offset", "oversize"]]

    return sharded.groupBy("shard").applyInPandas(_pack, _OUT_SCHEMA)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-(shard, bin) utilization: (shard, bin, n_docs, fill, util).
    util is fill/capacity; oversize bins report util > 1."""
    return (
        packed.groupBy("shard", "bin")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("fill"))
        .withColumn("util", F.col("fill") / F.lit(float(capacity)))
    )


def chop_sequences(docs: DataFrame, capacity: int, n_shards: int,
                   salt: str = "", id_col: str = "doc_id",
                   text_col: str = "text",
                   count_col: str | None = None) -> DataFrame:
    """GPT-style concat-and-chop packing: the complement of
    ``pack_sequences``. Each shard's docs concatenate in the
    deterministic (shard, pos) walk order into one token stream, chopped
    into fixed ``capacity``-token windows — documents MAY straddle a
    window boundary (zero padding waste; the attention mask isolates
    docs downstream). Returns one row per (doc, window) slice:

      (doc_id, shard, pos, n_tokens, window, win_offset, tok_start,
       tok_len)

    window is the 0-based window inside the shard, win_offset the
    slice's token offset inside that window, tok_start the 1-based
    first doc token of the slice, tok_len its length. Slices of one doc
    are contiguous across consecutive windows; zero-token docs emit no
    slices. Everything is integer arithmetic over a per-shard running
    sum — one hash shuffle + one window cumsum, no Python, and the
    DuckDB driver oracle (`sequence_chopping`) replays it exactly."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    from pyspark.sql import Window as W

    from .exactsubstr import require_numeric_id

    require_numeric_id(docs, id_col, "chop_sequences")
    n = (F.col(count_col).cast("long") if count_col
         else token_count_expr(text_col))
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.coalesce(n, F.lit(0).cast("long"))
                       .alias("n_tokens"))
    sharded = assign_training_shards(base, n_shards, salt, "doc_id") \
        .select("doc_id", "shard", "pos", "n_tokens")
    cap = int(capacity)
    w = W.partitionBy("shard").orderBy("pos") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    g = sharded.withColumn("g_end", F.sum("n_tokens").over(w)) \
        .withColumn("g_start", F.col("g_end") - F.col("n_tokens")) \
        .filter(F.col("n_tokens") > 0)
    # windows touched: floor(g_start/cap) .. floor((g_end-1)/cap)
    w_lo = (F.col("g_start") / cap).cast("long")
    w_hi = ((F.col("g_end") - 1) / cap).cast("long")
    sliced = g.select(
        "doc_id", "shard", "pos", "n_tokens", "g_start", "g_end",
        F.explode(F.sequence(w_lo, w_hi)).alias("window"))
    s_start = F.greatest(F.col("g_start"), F.col("window") * cap)
    s_end = F.least(F.col("g_end"), (F.col("window") + 1) * cap)
    return sliced.select(
        "doc_id", "shard", "pos", "n_tokens",
        "window",
        (s_start - F.col("window") * cap).cast("long").alias("win_offset"),
        (s_start - F.col("g_start") + 1).cast("long").alias("tok_start"),
        (s_end - s_start).cast("long").alias("tok_len"),
    )
