"""SimHash near-dup detection — the Hamming-space counterpart of MinHash LSH.

Charikar'02 / Manku et al. WWW'07 ("Detecting near-duplicates for web
crawling"): split the 64-bit fingerprint into ``bands`` disjoint bit blocks;
by pigeonhole, any pair within Hamming distance < bands shares at least one
exact block — so an equi-join per block finds every such pair. Same plan
shape as the MinHash path: band explode -> bucket self-join (shuffle on
(band, block), AQE skew) -> exact Hamming verify with bit_count. All pure
built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdup_spark.functions.similarity import hamming_expr
from fastdup_spark.operators.cc import connected_components


def simhash_blocks(sigs: DataFrame, bands: int = 4,
                   id_col: str = "doc_id", fp_col: str = "simhash") -> DataFrame:
    """(doc_id, band_id, block): the band_id-th 64/bands-bit slice of the
    fingerprint. Pigeonhole: hamming(a,b) < bands ⇒ some block matches."""
    width = 64 // bands
    mask = F.lit((1 << width) - 1)
    blocks = F.array(*[
        F.shiftrightunsigned(F.col(fp_col), i * width).bitwiseAND(mask)
        for i in range(bands)
    ])
    return sigs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(blocks).alias("band_id", "block"),
    )


def simhash_near_dup(sigs: DataFrame, max_hamming: int = 3, bands: int = 4,
                     id_col: str = "doc_id", fp_col: str = "simhash",
                     ) -> dict[str, DataFrame]:
    """Full SimHash dedup: block join -> hamming <= max_hamming -> CC.

    ``max_hamming`` must be < ``bands`` for the pigeonhole guarantee
    (default 3 < 4: catches every pair within distance 3 exactly).
    """
    if max_hamming >= bands:
        raise ValueError("pigeonhole guarantee needs max_hamming < bands")
    b = simhash_blocks(sigs, bands, id_col, fp_col)
    fps = sigs.select(F.col(id_col).alias("doc_id"), F.col(fp_col).alias("fp"))
    cand = (
        b.alias("l").join(b.alias("r"), ["band_id", "block"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("src"), F.col("r.doc_id").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    pairs = (
        cand
        .join(fps.select(F.col("doc_id").alias("src"), F.col("fp").alias("fp_a")), "src")
        .join(fps.select(F.col("doc_id").alias("dst"), F.col("fp").alias("fp_b")), "dst")
        .withColumn("hamming", hamming_expr(F.col("fp_a"), F.col("fp_b")))
        .select("src", "dst", "hamming")
    )
    edges = pairs.filter(F.col("hamming") <= max_hamming)
    asg = connected_components(
        edges.select("src", "dst"),
        vertices=sigs.select(F.col(id_col).alias("doc_id")))
    return {"candidates": cand, "pairs": pairs, "edges": edges, "assignments": asg}
