"""k-NN style operators: truncation windows, similarity search, and
embedding ANN (brute-force cosine baseline + LSH-bucketed scale path).

Reference analogs: the C++ engine keeps ``nearest_neighbors_k`` (default 2)
neighbors per item (/root/reference/fastdup/__init__.py:486,574 — W2);
galleries keep the best neighbor per outlier row
(/root/reference/fastdup/fastdup_controller.py:309 — W1); `search()` probes a
prebuilt index with a query item (/root/reference/fastdup/__init__.py:2063-2303);
`vector_search` does the same with a raw embedding.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastdup_spark.functions.similarity import cosine_expr


def knn_truncate(scored_pairs: DataFrame, k: int,
                 sim_col: str = "jaccard") -> DataFrame:
    """W2: symmetrize pairs and keep the top-k neighbors per doc.

    Output: (doc_id, nn, sim, rank) — ≤ k rows per doc_id. Ties broken by
    neighbor id for determinism.
    """
    sym = scored_pairs.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("nn"), F.col(sim_col).alias("sim")
    ).unionByName(scored_pairs.select(
        F.col("dst").alias("doc_id"), F.col("src").alias("nn"), F.col(sim_col).alias("sim")
    ))
    w = Window.partitionBy("doc_id").orderBy(F.desc("sim"), F.asc("nn"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def best_nn_per_query(scored_pairs: DataFrame, sim_col: str = "jaccard") -> DataFrame:
    """W1: nearest neighbor row per query (k=1 truncation)."""
    return knn_truncate(scored_pairs, 1, sim_col).drop("rank")


def cosine_topk_bruteforce(embeddings: DataFrame, query: list[float] | np.ndarray,
                           k: int = 10, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine over ARRAY<FLOAT> — the correctness baseline.

    One scan + JVM-side arithmetic (zip_with/aggregate); top-k via
    orderBy+limit (Spark plans TakeOrderedAndProject — no global sort
    materialization). Scale path: `cosine_topk_lsh`.
    """
    q = F.array(*[F.lit(float(x)) for x in np.asarray(query, dtype=float)])
    return (
        embeddings.select(
            F.col(id_col),
            cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 16, seed: int = 7,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int | None = None) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket per vector — the IVF-style index.

    Bucket = sign-bit pattern of dot products with ``n_planes`` fixed random
    hyperplanes. Vectorized numpy inside a pandas UDF (Arrow batches).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, n_planes))

    @pandas_udf(LongType())
    def _bucket(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch])
            signs = (mat @ planes) > 0                      # (n, planes)
            weights = (1 << np.arange(n_planes)).astype(np.int64)
            yield pd.Series(signs @ weights, dtype=np.int64)

    return embeddings.withColumn("bucket", _bucket(F.col(vec_col)))


def cosine_topk_lsh(bucketed: DataFrame, query: list[float] | np.ndarray,
                    n_planes: int = 16, seed: int = 7, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.

    ``bucketed`` is the persisted output of `hyperplane_buckets` (the index
    table — partition/cluster by bucket at scale so the probe prunes files).
    """
    qv = np.asarray(query, dtype=np.float64)
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((qv.shape[0], n_planes))
    signs = (qv @ planes) > 0
    qbucket = int((signs @ (1 << np.arange(n_planes))).astype(np.int64))
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(F.col(id_col),
                cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
