"""Train/test cross-set restriction and embedding-cosine near-dup.

Reference analogs:
  * `test_dir` mode computes ONLY test<->train edges, never intra-set pairs
    (J9, /root/reference/RUN.md:189-192, __init__.py:529-534) — the
    decontamination query of a training pipeline: is any eval doc a
    near-duplicate of a training doc?
  * embeddings-given mode (`run(embeddings=...)`,
    fastdup_controller.py:149-155): near-dup over dense vectors instead of
    shingles — here hyperplane-LSH buckets + in-bucket cosine + CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdup_spark.functions.similarity import cosine_expr
from fastdup_spark.operators.cc import connected_components
from fastdup_spark.operators.knn import hyperplane_buckets


def restrict_cross_set(pairs: DataFrame, tags: DataFrame,
                       id_col: str = "doc_id", tag_col: str = "split") -> DataFrame:
    """J9: keep only pairs whose endpoints belong to different splits."""
    t1 = tags.select(F.col(id_col).alias("src"), F.col(tag_col).alias("split_src"))
    t2 = tags.select(F.col(id_col).alias("dst"), F.col(tag_col).alias("split_dst"))
    return (
        pairs.join(t1, "src").join(t2, "dst")
        .filter(F.col("split_src") != F.col("split_dst"))
    )


def word_ngrams_expr(text, n: int):
    """All word n-grams of a text column as an array<string> (space-joined),
    over THE whitespace tokenizer (operators/textql.py:ws_tokens_expr
    boundary — the cross-engine contract every oracle replays). Docs with
    fewer than n words contribute an empty array (ANSI-safe guard, same
    device as the passage chunker)."""
    from fastdup_spark.operators.textql import ws_tokens_expr

    w = ws_tokens_expr(text)
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ))


def ngram_overlap_contamination(train: DataFrame, eval_grams: DataFrame,
                                n: int = 13, text_col: str = "text",
                                id_col: str = "doc_id",
                                gram_col: str = "gram") -> DataFrame:
    """GPT-3-style n-gram decontamination (Brown et al. 2020 App. C; also
    PaLM / Llama eval-overlap checks — public knowledge): a training doc
    is contaminated if it shares ANY word n-gram with the eval set.
    Complements `restrict_cross_set` (exact/near-dup decontamination) with
    the PARTIAL-overlap form: a single quoted benchmark sentence inside an
    otherwise-novel page is caught here and nowhere else.

    ``eval_grams`` is the distinct eval-side n-gram table (one string col
    ``gram_col``) — tiny relative to the corpus, so the join broadcasts;
    the train side explodes its n-grams map-side and never shuffles on
    doc_id. Returns (id_col, n_matched_ngrams) for contaminated docs only.

    At 100-TB scale: explode is a flatMap over the scan; the broadcast
    semi-join keeps the plan shuffle-free on the corpus side. For eval
    sets too big to broadcast, hash-partition both sides on gram (the
    standard fallback; same semantics).
    """
    grams = train.select(
        F.col(id_col),
        F.explode(word_ngrams_expr(F.col(text_col), n)).alias("__g"),
    )
    ev = F.broadcast(eval_grams.select(F.col(gram_col).alias("__g")).distinct())
    return (
        grams.join(ev, "__g")
        .groupBy(id_col)
        .agg(F.count_distinct("__g").alias("n_matched_ngrams"))
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95,
                       n_planes: int = 12, n_bands: int = 4, seed: int = 7,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       ) -> dict[str, DataFrame]:
    """Embedding-cosine near-dup: hyperplane-LSH bucket self-join -> cosine
    verify >= threshold -> connected components.

    Same plan shape as the MinHash pipeline: bucket (index) -> candidate
    self-join (shuffle on (band, bucket), AQE skew) -> verify -> CC.
    ``n_bands`` independent plane sets multiply recall exactly like MinHash
    banding: single-band collision prob p -> 1-(1-p)^B.
    """
    b = hyperplane_buckets(embeddings, n_planes=n_planes, n_bands=n_bands,
                           seed=seed, id_col=id_col, vec_col=vec_col)
    left = b.select("band", "bucket", F.col(id_col).alias("src"),
                    F.col(vec_col).alias("va"))
    right = b.select("band", "bucket", F.col(id_col).alias("dst"),
                     F.col(vec_col).alias("vb"))
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("src") < F.col("dst"))
        # dedupe BEFORE the cosine: a near-dup pair collides in most bands,
        # so verifying pre-dedup would recompute the expensive expression
        # once per colliding band (va/vb are identical across duplicates)
        .dropDuplicates(["src", "dst"])
        .withColumn("cosine", cosine_expr(F.col("va").cast("array<double>"),
                                          F.col("vb").cast("array<double>")))
        .select("src", "dst", "cosine")
    )
    edges = pairs.filter(F.col("cosine") >= threshold)
    asg = connected_components(
        edges.select("src", "dst"),
        vertices=embeddings.select(F.col(id_col).alias("doc_id")))
    return {"buckets": b, "pairs": pairs, "edges": edges, "assignments": asg}
