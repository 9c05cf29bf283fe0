"""Similarity expressions — all pure built-in SQL (WholeStageCodegen).

The reference emits cosine similarity over CNN embeddings
(`distance='cosine'`, /root/reference/fastdup/__init__.py:163); webtext uses
set similarity over shingles:

  * ``exact_jaccard_expr``  — |A∩B| / |A∪B| over distinct-shingle arrays; the
    verify-stage filter that plays the role of the 0.9 similarity threshold
    (/root/reference/fastdup/__init__.py:481,565).
  * ``sig_jaccard_expr``    — MinHash-estimated Jaccard (fraction of equal
    signature positions): an unbiased estimator used as a cheap prefilter so
    the expensive exact verify only touches plausible pairs.
  * ``hamming_expr``        — SimHash fingerprint Hamming distance.
  * ``cosine_expr``         — cosine over ARRAY<FLOAT> embeddings (for the
    precomputed-embedding mode, ref fastdup_controller.py:149-155).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard of two DISTINCT-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def sig_jaccard_expr(sig_a: Column, sig_b: Column) -> Column:
    """MinHash-estimated Jaccard: mean positionwise equality of signatures."""
    eq = F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size(sig_a)


def hamming_expr(fp_a: Column, fp_b: Column) -> Column:
    """Hamming distance between two 64-bit SimHash fingerprints."""
    return F.bit_count(fp_a.bitwiseXOR(fp_b))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<FLOAT/DOUBLE> columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))
