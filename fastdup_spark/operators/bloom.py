"""Bloom-filter novelty check against a historical corpus (Dolma-style).

Dolma's dedupe tool (Soldaini et al. 2024, public method) streams new
documents/paragraphs against a Bloom filter of everything already in the
corpus. The history never joins and never shuffles: it is compressed
ONCE into a bitmap that broadcasts to every executor, and each incoming
row is a map-side bit probe. This is the pattern for deduplicating an
incoming crawl batch against 100 TB of history — the alternatives
(anti-join / semi-join on the key) reshuffle the full historical key set
on every batch. The reference repo has no analog (its dedup is
intra-corpus); first-class here per the training-data-pipeline brief.

Spark-first build, no native bloom library:

* probe positions — ``n_hashes`` independent JVM ``xxhash64(key, i)``
  probes pmod ``n_bits``: whole-stage-codegen expressions, no Python.
* bitmap build — one distinct-positions shuffle, then per-block numpy
  bitset assembly in ``applyInPandas`` (a block is a contiguous
  position range, so blocks are disjoint byte ranges by construction);
  the ≤``n_bits/8``-byte blocks concatenate driver-side into one bytes
  object. 10^9 historical keys at 1% fpp ≈ 10^10 bits = 1.2 GiB — the
  documented broadcast budget, far under what any anti-join moves.
* probe — Arrow-batched pandas UDF testing all k bits per key against
  the TorrentBroadcast bitmap (vectorized numpy gather, no per-row
  Python, no shuffle: the flag fuses into the scan projection).

Guarantees: NO false negatives ever (an inserted key always reports
``maybe_seen``); false positives at rate ≈ (1 - e^{-kn/m})^k — i.e. a
novelty filter silently drops ~fpp of genuinely-new rows, the standard
Dolma trade. Deterministic end to end: same keys → same bits → same
verdicts under any partitioning (the driver oracle replays the position
sets in DuckDB).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^23 bits = 1 MiB per assembly block: big enough that the block table
# stays tiny, small enough that one group's numpy buffer is cache-friendly.
_BLOCK_BITS = 1 << 23


def resolve_bloom_shape(n_bits: int | None, n_hashes: int | None,
                        n_keys: int, fpp: float) -> tuple[int, int]:
    """Fill in the missing half of (n_bits, n_hashes). A caller-pinned
    n_bits gets the k OPTIMAL FOR THAT BITMAP (m/n*ln2), never the k
    sized for the fpp-auto bitmap — pairing a small user bitmap with a
    large-bitmap k multiplies the realized false-positive rate."""
    import math as _math

    if n_bits is None:
        auto_bits, auto_hashes = bloom_params(n_keys, fpp)
        return auto_bits, (n_hashes if n_hashes is not None
                           else auto_hashes)
    if n_hashes is None:
        n_hashes = max(1, int(round(n_bits / max(n_keys, 1)
                                    * _math.log(2))))
    return n_bits, n_hashes


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = ceil(-n·ln p / ln²2), k = round(m/n·ln 2)."""
    if n_keys < 1:
        raise ValueError(f"n_keys must be >= 1, got {n_keys}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    n_bits = max(64, int(math.ceil(-n_keys * math.log(fpp)
                                   / (math.log(2) ** 2))))
    n_hashes = max(1, int(round(n_bits / n_keys * math.log(2))))
    return n_bits, n_hashes


def positions_expr(key_col, n_bits: int, n_hashes: int) -> Column:
    """The k probe positions for a key, as array<long> — pure JVM
    (xxhash64 seeded by probe index, pmod keeps it non-negative)."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.array(*[
        F.pmod(F.xxhash64(k, F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ])


@dataclass(frozen=True)
class BloomFilterModel:
    bits: bytes          # little bitmap: bit p = bits[p >> 3] >> (p & 7)
    n_bits: int
    n_hashes: int
    n_set: int           # distinct bits set (load-factor telemetry)


def assemble_bitmap(pos_df: DataFrame, n_bits: int) -> tuple[bytes, int]:
    """Distributed bitset assembly from a single LONG column ``p`` of set
    positions (duplicates fine — bit OR is idempotent, so no distinct
    pass is needed; one shuffle keyed on the block). Returns
    ``(bitmap_bytes, n_set_bits)``. Deterministic under any input
    partitioning: blocks are disjoint byte ranges by construction."""

    blk = (F.col("p") / _BLOCK_BITS).cast("long").alias("blk")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["blk"].iloc[0])
        lo = b * _BLOCK_BITS
        hi = min(lo + _BLOCK_BITS, n_bits)
        buf = np.zeros((hi - lo + 7) >> 3, dtype=np.uint8)
        idx = pdf["p"].to_numpy(dtype=np.int64) - lo
        # bitwise_or.at: several positions can share a byte
        np.bitwise_or.at(buf, idx >> 3,
                         np.left_shift(1, (idx & 7)).astype(np.uint8))
        return pd.DataFrame({"blk": [b], "bits": [buf.tobytes()]})

    rows = (
        pos_df.select("p", blk)
        .groupBy("blk")
        .applyInPandas(_pack, "blk long, bits binary")
        .collect()
    )
    out = bytearray((n_bits + 7) >> 3)
    n_set = 0
    for r in rows:
        lo_byte = r["blk"] * (_BLOCK_BITS >> 3)
        out[lo_byte:lo_byte + len(r["bits"])] = r["bits"]
        n_set += int(np.unpackbits(
            np.frombuffer(r["bits"], dtype=np.uint8)).sum())
    return bytes(out), n_set


def build_bloom(df: DataFrame, key_col: str = "text",
                n_bits: int | None = None, n_hashes: int | None = None,
                n_keys_hint: int | None = None,
                fpp: float = 0.01) -> BloomFilterModel:
    """Compress a historical key column into a Bloom bitmap.

    Pass explicit (n_bits, n_hashes), or let ``bloom_params`` size them
    from ``n_keys_hint`` (one count job when the hint is absent). NULL
    keys are skipped — a NULL never 'was seen'.
    """
    if n_bits is None or n_hashes is None:
        n = n_keys_hint if n_keys_hint is not None \
            else df.filter(F.col(key_col).isNotNull()).count()
        n_bits, n_hashes = resolve_bloom_shape(n_bits, n_hashes,
                                               max(int(n), 1), fpp)

    pos = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(positions_expr(key_col, n_bits, n_hashes))
                .alias("p"))
    )
    bits, n_set = assemble_bitmap(pos, n_bits)
    return BloomFilterModel(bits=bits, n_bits=n_bits,
                            n_hashes=n_hashes, n_set=n_set)


def probe_bloom(df: DataFrame, model: BloomFilterModel,
                key_col: str = "text",
                flag_col: str = "maybe_seen") -> DataFrame:
    """Add ``flag_col``: True = the key MAY be in the history (always
    True for inserted keys; false positives at the sized fpp), False =
    DEFINITELY novel. NULL key → NULL flag. Map-side: the bitmap rides
    a Spark broadcast; the probe is one vectorized numpy gather per
    Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model.bits)
    n_hashes = model.n_hashes

    @F.pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if len(pos) == 0:
            return pd.Series([], dtype="boolean")
        mat = np.vstack(pos.to_numpy()).astype(np.int64)  # (rows, k)
        hit = (bits[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
        return pd.Series(hit.sum(axis=1) == n_hashes)

    k = F.col(key_col)
    return df.withColumn(
        flag_col,
        F.when(k.isNull(), F.lit(None).cast("boolean")).otherwise(
            _probe(positions_expr(key_col, model.n_bits, model.n_hashes))))


def bloom_novel(df: DataFrame, model: BloomFilterModel,
                key_col: str = "text") -> DataFrame:
    """Rows definitely NOT in the history (drops ~fpp of genuine
    novelty — the Dolma trade; NULL keys pass through as novel, the
    builder never inserted them)."""
    flagged = probe_bloom(df, model, key_col)
    return flagged.filter(~F.coalesce(F.col("maybe_seen"), F.lit(False))) \
                  .drop("maybe_seen")


def _paragraphs(df: DataFrame, text_col: str, id_col: str,
                sep: str) -> DataFrame:
    """(id, pos, para) — empty/whitespace-only paragraphs dropped (blank
    lines between paragraphs must not become bloom keys)."""
    return (
        df.select(id_col,
                  F.posexplode(F.split(F.col(text_col), sep))
                  .alias("pos", "para"))
        .filter(F.trim(F.col("para")) != "")
    )


def build_paragraph_bloom(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", sep: str = "\n",
                          n_bits: int | None = None,
                          n_hashes: int | None = None,
                          n_keys_hint: int | None = None,
                          fpp: float = 0.01) -> BloomFilterModel:
    """Bloom bitmap over a history's PARAGRAPHS (Dolma's dedupe tool runs
    at exactly this granularity: boilerplate paragraphs repeat across the
    whole web and survive document-level dedup)."""
    return build_bloom(_paragraphs(df, text_col, id_col, sep), "para",
                       n_bits=n_bits, n_hashes=n_hashes,
                       n_keys_hint=n_keys_hint, fpp=fpp)


def paragraph_bloom_scrub(df: DataFrame, model: BloomFilterModel,
                          text_col: str = "text", id_col: str = "doc_id",
                          sep: str = "\n") -> DataFrame:
    """REWRITE each document with history-seen paragraphs removed — the
    corpus-rewriting form of :func:`bloom_novel` (Dolma paragraph mode).

    One paragraph explode (map-side), one map-side bitmap probe, ONE
    shuffle on the doc id for ordered reassembly; the history itself is
    never joined. A paragraph inserted into the history is ALWAYS
    dropped (no false negatives); ~fpp of genuinely-novel paragraphs are
    collateral (the standard trade). Documents whose every paragraph was
    seen survive with ``clean_text = ''``. Returns (id, clean_text,
    n_paras, n_dropped)."""
    paras = _paragraphs(df, text_col, id_col, sep)
    flagged = probe_bloom(paras, model, key_col="para", flag_col="seen")
    per_doc = (
        flagged.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(~F.col("seen"),
                               F.struct("pos", "para")))),
                    lambda s: s["para"]),
                sep).alias("clean_text"),
            F.count("*").alias("n_paras"),
            F.count(F.when(F.col("seen"), 1)).alias("n_dropped"),
        )
    )
    # docs with no non-blank paragraphs at all still come back (empty)
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(id_col,
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
                F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"))
    )


# --------------------------------------------------------------------------
# span mode: ExactSubstr against a compressed history (no join)
# --------------------------------------------------------------------------

def _kgram_hashes(df: DataFrame, k: int, text_col: str,
                  id_col: str) -> DataFrame:
    """(doc_id, start, gk): every overlapping k-token window hash — the
    exactsubstr fast path (JVM token xxhash64 + numpy rolling combine,
    fused with the explode in one mapInPandas). Numeric ids required."""
    from ..functions.signatures import token_hashes_expr
    from .exactsubstr import _tokens as _es_tokens
    from .exactsubstr import make_window_hash_mapper, require_numeric_id

    require_numeric_id(df, id_col, "k-gram window hashing")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        token_hashes_expr(_es_tokens(F.col(text_col))).alias("th"),
    ).mapInPandas(make_window_hash_mapper(k),
                  "doc_id long, start int, gk long")


def build_kgram_bloom(df: DataFrame, k: int = 50, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_bits: int | None = None,
                      n_hashes: int | None = None,
                      n_keys_hint: int | None = None,
                      fpp: float = 0.01) -> BloomFilterModel:
    """Compress a history corpus's k-token WINDOW set into a Bloom
    bitmap — the index `span_bloom_scrub` probes. Sizing defaults to
    `bloom_params` over the window count (estimated with one cheap
    expression aggregate — the windows themselves are never counted by
    materializing them twice)."""
    if n_bits is None or n_hashes is None:
        if n_keys_hint is None:
            from .exactsubstr import _tokens as _es_tokens
            n_win = F.greatest(
                F.lit(0),
                F.size(_es_tokens(F.col(text_col))) - (k - 1))
            n_keys_hint = int(
                df.agg(F.sum(n_win.cast("long"))).first()[0] or 0)
        n_bits, n_hashes = resolve_bloom_shape(n_bits, n_hashes,
                                               max(n_keys_hint, 1), fpp)
    pos = _kgram_hashes(df, k, text_col, id_col).select(
        F.explode(positions_expr("gk", n_bits, n_hashes)).alias("p"))
    bits, n_set = assemble_bitmap(pos, n_bits)
    return BloomFilterModel(bits=bits, n_bits=n_bits,
                            n_hashes=n_hashes, n_set=n_set)


def span_bloom_scrub(df: DataFrame, model: BloomFilterModel, k: int = 50,
                     max_drop_frac: float = 0.3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """REWRITE each incoming document with history-seen >=k-token runs
    erased — ExactSubstr (operators/exactsubstr.py) where the duplicate
    decision comes from a compressed HISTORY instead of a corpus
    self-join: Dolma's Bloom trick at Lee et al.'s span granularity.
    The history is never joined; the probe is one map-side vectorized
    bitmap gather over the window hashes. A window whose hash was
    inserted is ALWAYS erased (no false negatives); ~fpp of genuinely
    novel windows are collateral (the standard trade — each erases at
    most k tokens). Span merge, doc-local rebuild and the integer-exact
    kill rule are shared with remove_duplicated_spans; output schema
    matches it: (doc_id, clean_text, n_tokens, n_dropped, n_spans,
    kept)."""
    from .exactsubstr import rewrite_without_spans

    g = _kgram_hashes(df, k, text_col, id_col)
    flagged = probe_bloom(g, model, key_col="gk", flag_col="seen")
    starts = flagged.filter(F.col("seen")).select("doc_id", "start")
    return rewrite_without_spans(df, starts, k, max_drop_frac,
                                 id_col, text_col)
