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

# Prime just above 2^32: (a*x+b) % P with a,b,x < 2^32 fits in uint64.
MERSENNE_P = 4294967311
EMPTY_SENTINEL = MERSENNE_P  # unreachable by `% P`; marks empty shingle sets


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


def minhash_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed (a, b) permutation constants — pure function of (n_perm, seed)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = (rng.integers(1, 1 << 32, size=n_perm, dtype=np.uint64) | 1)  # odd, non-zero
    b = rng.integers(0, 1 << 32, size=n_perm, dtype=np.uint64)
    return a, b


def _fold32(x: np.ndarray) -> np.ndarray:
    """xxhash64 int64 -> uint32 domain (xor-fold) so a*x+b stays in uint64."""
    u = x.astype(np.uint64)
    return (u ^ (u >> np.uint64(32))) & np.uint64(0xFFFFFFFF)


def minhash_numpy(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature for ONE doc: row-min of (a_i*x + b_i) mod P over shingles."""
    if shingles.size == 0:
        return np.full(a.shape[0], EMPTY_SENTINEL, dtype=np.int64)
    x = _fold32(np.asarray(shingles, dtype=np.int64))          # (s,)
    h = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(MERSENNE_P)  # (p, s)
    return h.min(axis=1).astype(np.int64)


def make_minhash_udf(n_perm: int, seed: int):
    """Scalar-iter pandas UDF: array<bigint> shingles -> array<bigint> sig."""
    from pyspark.sql.functions import pandas_udf

    a, b = minhash_params(n_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def _minhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            out = [minhash_numpy(np.asarray(sh, dtype=np.int64), a, b) for sh in batch]
            yield pd.Series(out)

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


def make_simhash_udf():
    """Scalar-iter pandas UDF: array<bigint> shingles -> bigint fingerprint."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _simhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield pd.Series(
                [simhash_numpy(np.asarray(sh, dtype=np.int64)) for sh in batch],
                dtype=np.int64,
            )

    return _simhash
