"""DSIR-style data selection: importance weights between two LMs.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") selects pretraining data that LOOKS LIKE a
target distribution: fit cheap bag-of-features LMs on the target set
and on the raw pool, weight every raw doc by the log-likelihood ratio
log p_target(x) - log p_raw(x), and resample by those weights. The
original implementation is a single-machine n-gram hashing pipeline;
here both model fits, the scoring pass and the selection are Spark
jobs, reusing the unigram-LM machinery of `operators/lm.py` (CCNet
perplexity) — the feature model is the same class DSIR's ablations use.

Scale shape:
  * two LM fits = two token groupBys (one over the target corpus —
    usually tiny — one over the raw pool) + distributed top-V cuts.
  * scoring = ONE explode over the raw pool + two BROADCAST joins
    (each vocab ≤ V rows, a model constant) + one doc-keyed groupBy.
  * `dsir_select` (deterministic head-cut) = TakeOrderedAndProject
    (per-partition top-n, single merge — never a global sort); ties
    break by md5(doc_id), so the cut is total and partitioning-free.
  * `dsir_resample` (the paper's Gumbel-top-k importance resampling)
    = the same top-n shape over perturbed keys.

Cross-engine determinism: scores are integer micro-nat sums (exact,
partitioning-independent — the lm.py contract), so `dsir_scores` and
`dsir_select` replay verbatim in the DuckDB driver oracle
(`dsir_selection`). `dsir_resample` adds Gumbel noise -ln(-ln(u)) with
u drawn deterministically from md5(salt:doc_id); float libm rounding
is not bit-identical across engines, so the resampler is pinned by a
pure-Python reference test instead of a SQL oracle (documented
trade-off, same class as kmeans/CC).

The reference repo has no data-selection surface (image engine); this
is part of the beyond-the-reference LLM-data tier (SURVEY §2 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import MICRO, UnigramLM, train_unigram_lm, lm_tokens_expr

__all__ = ["dsir_scores", "dsir_select", "dsir_resample", "fit_dsir"]


def fit_dsir(target_df: DataFrame, raw_df: DataFrame,
             text_col: str = "text",
             vocab_size: int = 65_536) -> tuple[UnigramLM, UnigramLM]:
    """Fit the (target, raw) model pair."""
    return (train_unigram_lm(target_df, text_col, vocab_size),
            train_unigram_lm(raw_df, text_col, vocab_size))


def dsir_scores(df: DataFrame, target_lm: UnigramLM, raw_lm: UnigramLM,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, score_micro): per-doc importance weight
    log p_target(x) - log p_raw(x) in integer micro-nats (sum over
    tokens; zero-token docs score 0). Higher = more target-like."""
    toks = df.select(id_col,
                     F.explode(lm_tokens_expr(text_col)).alias("token"))
    tv = target_lm.vocab.select(
        "token", F.col("logp_micro").alias("lp_t"))
    rv = raw_lm.vocab.select(
        "token", F.col("logp_micro").alias("lp_r"))
    scored = (
        toks.join(F.broadcast(tv), "token", "left")
        .join(F.broadcast(rv), "token", "left")
        .select(
            id_col,
            (F.coalesce(F.col("lp_t"), F.lit(target_lm.oov_logp_micro))
             - F.coalesce(F.col("lp_r"), F.lit(raw_lm.oov_logp_micro))
             ).alias("d"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("d").alias("score_micro"))
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("score_micro", F.lit(0)).cast("long")
         .alias("score_micro"),
    )


def dsir_select(df: DataFrame, target_lm: UnigramLM, raw_lm: UnigramLM,
                n: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic head-cut: the ``n`` most target-like docs by
    (score_micro desc, md5(id) asc) — the greedy form of DSIR (the
    paper's ablation "top-k" selector). Returns (id, n_tokens,
    score_micro, rank) with rank 1..n."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    scored = dsir_scores(df, target_lm, raw_lm, text_col, id_col) \
        .withColumn("tie", F.md5(F.col(id_col).cast("string")))
    top = scored.orderBy(F.col("score_micro").desc(), "tie").limit(n)
    # n rows: a single-partition rank over the already-cut head is fine
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score_micro").desc(), "tie")
    return top.withColumn("rank", F.row_number().over(w).cast("long")) \
        .drop("tie")


def dsir_resample(df: DataFrame, target_lm: UnigramLM, raw_lm: UnigramLM,
                  n: int, salt: str = "", text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Gumbel-top-k importance resampling — the paper's sampler: take
    the n largest (score + g_i) where g_i = -ln(-ln(u_i)) and u_i is a
    deterministic uniform from md5(salt:id). Equivalent to sampling n
    docs without replacement with probability ∝ exp(score) (softmax
    weights). A different salt is a fresh resample; the same salt is
    bit-stable for a fixed engine (float keys — pytest-pinned, not
    SQL-oracle-replayable; see module docstring)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    scored = dsir_scores(df, target_lm, raw_lm, text_col, id_col)
    # u in (0, 1): 12 hex digits -> 48-bit integer, +0.5 to dodge 0
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 12), 16, 10)
        .cast("double") + 0.5) / F.lit(float(1 << 48)))
    key = F.col("score_micro") / F.lit(float(MICRO)) - F.log(-F.log(u))
    return (scored.withColumn("gumbel_key", key)
            .orderBy(F.col("gumbel_key").desc(),
                     F.md5(F.col(id_col).cast("string")))
            .limit(n))
