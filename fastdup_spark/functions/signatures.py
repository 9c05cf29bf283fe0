"""Signature extraction: k-shingles (pure JVM), MinHash and SimHash (numpy
pandas UDFs).

Analog of the reference's feature matrix (`atrain_features.dat`, n x d float32,
d=576 default / 960 high-accuracy — /root/reference/fastdup/definitions.py:46-47,109,
reader /root/reference/fastdup/__init__.py:864-872). Here the "features" are:

  * ``shingles``  — distinct xxhash64 values of k-word-gram strings, computed
    entirely with built-in SQL expressions (WholeStageCodegen, no Python);
  * ``minhash``   — n_perm-wide signature, one uint32-ish value per fixed
    random permutation h_i(x) = (a_i*x + b_i) mod P, row-min over shingles;
  * ``simhash``   — 64-bit fingerprint (sign of per-bit vote over shingle
    hashes), for Hamming-distance near-dup checks (the "high accuracy"
    secondary signature analog).

Determinism discipline (SURVEY §7 hard part 1): permutation constants derive
from a fixed seed via PCG64; all arithmetic is integer; results are invariant
to partitioning (tests/test_signatures.py asserts repartition(1) ==
repartition(8)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# Multiply-shift universal hashing (Dietzfelbinger et al.): h_i(x) =
# (a_i * x + b_i) >> 32 over uint64 with a_i odd — 2-universal on 32-bit
# outputs, and pure mul/add/shift (SIMD-fast; numpy's uint64 modulo hits a
# pathologically slow scalar path on large arrays).
HASH_SHIFT = np.uint64(32)
EMPTY_SENTINEL = 1 << 32  # above any 32-bit hash; marks empty shingle sets


def normalize_tokens_expr(text_col: Column) -> Column:
    """text -> array<string> tokens: strip sentence punctuation, collapse
    whitespace, split. Pure built-ins (analog of the reference's fixed
    preprocessing, /root/reference/fastdup/__init__.py:2197-2205)."""
    cleaned = F.regexp_replace(text_col, r"[.,!?;:]", "")
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(F.split(cleaned, " "))


def shingles_expr(tokens_col: Column, k: int) -> Column:
    """array<string> tokens -> array<bigint> DISTINCT k-gram xxhash64 shingles.

    Matches the fixture oracle's semantics (fixtures/pages.py:_shingle_set):
    docs shorter than k tokens yield a single whole-doc shingle. All JVM-side.
    """
    whole = F.array(F.xxhash64(F.concat_ws(" ", tokens_col)))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens_col, i + F.lit(1), F.lit(k)))),
    )
    return F.array_distinct(
        F.when(F.size(tokens_col) == 0, F.array().cast(ArrayType(LongType())))
        .when(F.size(tokens_col) < k, whole)
        .otherwise(grams)
    )


def token_hashes_expr(tokens_col: Column) -> Column:
    """array<string> tokens -> array<bigint> per-token xxhash64 (JVM).

    The fast signature path hashes TOKENS once on the JVM (streaming each
    byte of text once) and composes k-gram shingle hashes numerically in
    numpy — ~k x less string bandwidth than hashing every k-gram concat."""
    return F.transform(tokens_col, lambda t: F.xxhash64(t))


def shingle_combine_params(k: int, seed: int) -> np.ndarray:
    """Fixed odd positional constants c_j for the rolling k-gram combiner."""
    rng = np.random.Generator(np.random.PCG64(seed ^ (k * 0x9E3779B9)))
    return rng.integers(1, 1 << 63, size=k, dtype=np.uint64) | np.uint64(1)


def combine_shingles_numpy(token_hashes: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ONE doc: token xxhash64s -> DISTINCT k-gram shingle hashes.

    shingle[i] = sum_j c_j * th[i+j]  (uint64 wraparound) — position-weighted,
    so order matters like string concat; docs shorter than k tokens yield a
    single whole-doc shingle (same shape as shingles_expr/_shingle_set)."""
    k = c.shape[0]
    th = np.asarray(token_hashes, dtype=np.int64).astype(np.uint64)
    n = th.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n < k:
        return np.unique((c[:n] * th).sum(dtype=np.uint64).reshape(1).view(np.int64))
    m = n - k + 1
    s = np.zeros(m, dtype=np.uint64)
    for j in range(k):          # k cache-resident passes over a small array
        s += c[j] * th[j:j + m]
    return np.unique(s.view(np.int64))


def make_signature_udf(k: int, n_perm: int, seed: int):
    """The fast path: ONE scalar-iter pandas UDF
    array<bigint> token hashes -> struct(shingles, minhash, simhash).

    One Arrow transfer, one numpy pass; all buffers cache-sized and reused."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StructField, StructType

    a, b = minhash_params(n_perm, seed)
    c = shingle_combine_params(k, seed)
    schema = StructType([
        StructField("shingles", ArrayType(LongType()), False),
        StructField("minhash", ArrayType(LongType()), False),
        StructField("simhash", LongType(), False),
    ])

    @pandas_udf(schema)
    def _sig(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        scratch = np.empty((n_perm, _MINHASH_CHUNK_SHINGLES), dtype=np.uint64)
        for batch in it:
            shingle_lists = [combine_shingles_numpy(th, c) for th in batch.to_numpy()]
            mins = minhash_batch(shingle_lists, a, b, scratch=scratch)
            sims = simhash_batch(shingle_lists)
            yield pd.DataFrame({
                "shingles": shingle_lists,
                "minhash": mins,
                "simhash": pd.Series(sims, dtype=np.int64),
            })

    return _sig


def with_signatures(df, cfg, text_col: str = "text"):
    """Attach (shingles, minhash, simhash, n_shingles) columns — the shared
    signature computation used by the pipeline, search() and incremental."""
    th = token_hashes_expr(normalize_tokens_expr(F.col(text_col)))
    sig_udf = make_signature_udf(cfg.shingle_k, cfg.n_perm, cfg.minhash_seed)
    return (
        df.withColumn("_sig", sig_udf(th))
        .withColumn("shingles", F.col("_sig.shingles"))
        .withColumn("minhash", F.col("_sig.minhash"))
        .withColumn("simhash", F.col("_sig.simhash"))
        .withColumn("n_shingles", F.size("shingles"))
        .drop("_sig")
    )


def minhash_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed (a, b) permutation constants — pure function of (n_perm, seed)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 63, size=n_perm, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)
    return a, b


def _fold32(x: np.ndarray) -> np.ndarray:
    """xxhash64 int64 -> uint32 domain (xor-fold) so a*x+b stays in uint64."""
    u = x.astype(np.uint64)
    return (u ^ (u >> np.uint64(32))) & np.uint64(0xFFFFFFFF)


def minhash_numpy(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature for ONE doc: row-min of ((a_i*x + b_i) >> 32) over shingles."""
    if shingles.size == 0:
        return np.full(a.shape[0], EMPTY_SENTINEL, dtype=np.int64)
    x = _fold32(np.asarray(shingles, dtype=np.int64))          # (s,)
    h = (a[:, None] * x[None, :] + b[:, None]) >> HASH_SHIFT   # (p, s)
    return h.min(axis=1).astype(np.int64)


# bound the (n_perm x shingles) scratch matrix per chunk (16 MB at n_perm=128
# — small enough to stay cache/TLB-friendly; the buffer is allocated ONCE per
# worker and reused, because fresh large allocations pay heavy first-touch
# page-fault costs under virtualized kernels)
_MINHASH_CHUNK_SHINGLES = 1 << 14


def _chunk_rows(lens: np.ndarray, nonempty: np.ndarray, pos: int, cap: int) -> int:
    """How many rows starting at pos fit within cap total shingles (>=1)."""
    take, total = 0, 0
    while pos + take < nonempty.size and (
            total == 0 or total + lens[nonempty[pos + take]] <= cap):
        total += lens[nonempty[pos + take]]
        take += 1
    return take


def minhash_batch(shingle_lists, a: np.ndarray, b: np.ndarray,
                  scratch: np.ndarray | None = None) -> list[np.ndarray]:
    """Signatures for a WHOLE Arrow batch with zero per-row Python:
    concatenate all shingles, hash once, segment-min via
    np.minimum.reduceat. Chunked over rows; all heavy ops write into a
    reusable scratch buffer (no large temporaries)."""
    n_perm = a.shape[0]
    lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64,
                       count=len(shingle_lists))
    out: list[np.ndarray] = [None] * len(lens)  # type: ignore[list-item]
    empty_sig = np.full(n_perm, EMPTY_SENTINEL, dtype=np.int64)
    nonempty = np.nonzero(lens > 0)[0]
    for i in np.nonzero(lens == 0)[0]:
        out[i] = empty_sig
    a_col = a[:, None]
    b_col = b[:, None]
    pos = 0
    while pos < nonempty.size:
        take = _chunk_rows(lens, nonempty, pos, _MINHASH_CHUNK_SHINGLES)
        rows = nonempty[pos:pos + take]
        x = _fold32(np.concatenate([np.asarray(shingle_lists[i], dtype=np.int64) for i in rows]))
        m = x.size
        if scratch is None or scratch.shape[1] < m:
            scratch = np.empty((n_perm, max(m, _MINHASH_CHUNK_SHINGLES)), dtype=np.uint64)
        h = scratch[:, :m]
        np.multiply(a_col, x[None, :], out=h)
        np.add(h, b_col, out=h)
        np.right_shift(h, HASH_SHIFT, out=h)                    # (p, m)
        starts = np.zeros(take, dtype=np.int64)
        np.cumsum(lens[rows][:-1], out=starts[1:])
        mins = np.minimum.reduceat(h, starts, axis=1)           # (p, take)
        sigs = mins.T.astype(np.int64)
        for j, i in enumerate(rows):
            out[i] = sigs[j]
        pos += take
    return out


def make_minhash_udf(n_perm: int, seed: int):
    """Scalar-iter pandas UDF: array<bigint> shingles -> array<bigint> sig."""
    from pyspark.sql.functions import pandas_udf

    a, b = minhash_params(n_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def _minhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scratch = np.empty((n_perm, _MINHASH_CHUNK_SHINGLES), dtype=np.uint64)
        for batch in it:
            yield pd.Series(minhash_batch(batch.to_numpy(), a, b, scratch=scratch))

    return _minhash


def simhash_numpy(shingles: np.ndarray) -> int:
    """64-bit SimHash of ONE doc's shingle hashes: per-bit majority vote."""
    if shingles.size == 0:
        return 0
    u = np.asarray(shingles, dtype=np.int64).astype(np.uint64)
    bits = ((u[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))  # (s, 64)
    votes = bits.sum(axis=0)
    fp = 0
    majority = votes * 2 > u.size  # ties -> 0 (deterministic)
    for j in np.nonzero(majority)[0]:
        fp |= 1 << int(j)
    return fp - (1 << 64) if fp >= (1 << 63) else fp  # reinterpret as signed int64


def simhash_batch(shingle_lists) -> np.ndarray:
    """SimHash for a WHOLE Arrow batch: unpack bits of the concatenated
    shingle hashes, segment-sum per row via np.add.reduceat."""
    n = len(shingle_lists)
    lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.int64)
    nonempty = np.nonzero(lens > 0)[0]
    if nonempty.size == 0:
        return out
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    pos = 0
    while pos < nonempty.size:  # chunk rows to bound the (S, 64) bit matrix
        take = _chunk_rows(lens, nonempty, pos, _MINHASH_CHUNK_SHINGLES)
        rows = nonempty[pos:pos + take]
        x = np.concatenate([np.asarray(shingle_lists[i], dtype=np.int64) for i in rows]) \
            .astype("<u8")  # explicit little-endian: byte j = bits 8j..8j+7
        m = x.size
        # unpackbits on the byte view writes a (m, 64) uint8 bit matrix in
        # one C pass — 8x narrower than the previous int64 shift/and matrix
        # (measured 4.15x on the kernel microbench; the DRAM-bound vote was
        # the single hottest piece of the signature stage at 1M pages).
        # reduceat(dtype=int64) casts per element on the fly (no big copy)
        # and cannot overflow at any realistic shingle count.
        bview = np.unpackbits(x.view(np.uint8).reshape(m, 8), axis=1,
                              bitorder="little")                # (m, 64) u8
        starts = np.zeros(take, dtype=np.int64)
        np.cumsum(lens[rows][:-1], out=starts[1:])
        votes = np.add.reduceat(bview, starts, axis=0, dtype=np.int64)
        majority = votes * 2 > lens[rows][:, None]              # ties -> 0
        fps = (majority.astype(np.uint64) * weights[None, :]).sum(axis=1,
                                                                  dtype=np.uint64)
        out[rows] = fps.view(np.int64)
        pos += take
    return out


def make_simhash_udf():
    """Scalar-iter pandas UDF: array<bigint> shingles -> bigint fingerprint."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _simhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield pd.Series(simhash_batch(batch.to_numpy()), dtype=np.int64)

    return _simhash
