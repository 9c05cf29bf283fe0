"""Statistical LM perplexity scoring for webtext quality filtering.

CCNet (Wenzek et al. 2020) scores every Common Crawl document with the
perplexity of a small n-gram LM trained on a trusted reference corpus
(Wikipedia) and keeps the low-perplexity head — the standard
"does this read like real language?" filter that RefinedWeb/RedPajama
inherit. The reference repo has no text analog (its quality axis is
image stats, fastdup/definitions.py:28-30); first-class here because a
100 TB webtext engine feeds training-data pipelines.

Spark-first re-expression of the statistical core (KenLM itself is a
native library; the method is public):

* ``train_unigram_lm`` — one explode + one token groupBy (map-side
  partial agg) + a distributed top-V cut (TakeOrderedAndProject, no
  global sort materialization). All out-of-vocab mass folds into a
  single UNK type with add-one smoothing so no token ever scores
  log(0). Two scalar aggregates (total count, in-vocab count) are the
  only driver touches.
* ``score_perplexity`` — explode + BROADCAST join against the ≤V-row
  vocab + one groupBy on the doc id (map-side partial agg). One
  shuffle total; the vocab stays broadcastable at any corpus scale
  because V is a model constant, not data-sized.

Cross-engine determinism contract: per-token log-probs are quantized
to integer micro-nats (round(ln(p)·1e6) as BIGINT) so the per-doc sum
is integer-exact and independent of Spark partitioning / DuckDB scan
order. p itself is an exact integer ratio evaluated identically in
both engines; only the final display perplexity re-enters float land,
rounded to 2dp. The driver oracle replays the full train+score path.

Tokens are the canonical whitespace contract (`textql.ws_tokens_expr`)
lowercased — never fork a copy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdup_spark.operators.textql import ws_tokens_expr

MICRO = 1_000_000


def lm_tokens_expr(text_col) -> F.Column:
    """Lowercased canonical whitespace tokens, empty strings dropped
    (ws_tokens_expr of '' yields [''] — a phantom token the LM must
    never count)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(ws_tokens_expr(F.lower(t)), lambda x: x != "")


@dataclass(frozen=True)
class UnigramLM:
    """A trained unigram model: the vocab table (token, logp_micro) and
    the scalar UNK log-prob every out-of-vocab token receives."""

    vocab: DataFrame          # columns: token (string), logp_micro (bigint)
    oov_logp_micro: int
    total_tokens: int
    vocab_size: int           # actual |vocab| (≤ requested)


def train_unigram_lm(ref_df: DataFrame, text_col: str = "text",
                     vocab_size: int = 65_536) -> UnigramLM:
    """Fit an add-one-smoothed unigram LM on a reference corpus.

    Top-``vocab_size`` tokens by (count desc, token asc — deterministic
    ties) form the vocab; everything else maps to one UNK type:

        denom     = T + 1                      (T = total token count)
        p(w∈V)    = c(w) / denom
        p(UNK)    = (T - Σ_V c(w) + 1) / denom (+1 ⇒ never zero)

    log-probs are stored as integer micro-nats (see module docstring).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    toks = (
        ref_df.select(F.explode(lm_tokens_expr(text_col)).alias("token"))
        .groupBy("token").agg(F.count("*").alias("cnt"))
    )
    total = toks.agg(F.sum("cnt")).first()[0]
    if not total:
        raise ValueError("reference corpus has no tokens")
    # TakeOrderedAndProject: per-partition top-V then a single merge —
    # never a global sort of the token-count table.
    vocab_counts = toks.orderBy(F.desc("cnt"), F.asc("token")) \
                       .limit(vocab_size)
    denom = int(total) + 1
    vocab = vocab_counts.select(
        "token",
        F.round(F.log(F.col("cnt") / F.lit(denom)) * MICRO, 0)
         .cast("long").alias("logp_micro"),
        "cnt",
    )
    in_vocab = vocab.agg(F.sum("cnt"), F.count("*")).first()
    import math
    oov = int(round(math.log((int(total) - int(in_vocab[0]) + 1) / denom)
                    * MICRO))
    return UnigramLM(vocab=vocab.drop("cnt"), oov_logp_micro=oov,
                     total_tokens=int(total), vocab_size=int(in_vocab[1]))


def score_perplexity(df: DataFrame, lm: UnigramLM, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document LM score: (id, n_tokens, logprob_micro, ppl).

    ppl = exp(-avg token log-prob); lower = more natural text. Docs
    with zero tokens keep a row with n_tokens=0 and NULL ppl (the
    filter stage decides their fate explicitly; silently dropping them
    would make the survivors table lie about corpus membership).
    """
    toks = df.select(id_col,
                     F.explode(lm_tokens_expr(text_col)).alias("token"))
    scored_toks = toks.join(F.broadcast(lm.vocab), "token", "left").select(
        id_col,
        F.coalesce(F.col("logp_micro"),
                   F.lit(lm.oov_logp_micro)).alias("lp"),
    )
    per_doc = scored_toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("lp").alias("logprob_micro"),
    )
    out = df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("logprob_micro", F.lit(0)).cast("long")
         .alias("logprob_micro"),
    )
    ce = (-F.col("logprob_micro") / F.lit(float(MICRO))) / F.col("n_tokens")
    return out.withColumn(
        "ppl", F.when(F.col("n_tokens") > 0, F.round(F.exp(ce), 2)))


def perplexity_filter(df: DataFrame, lm: UnigramLM, max_ppl: float,
                      text_col: str = "text", id_col: str = "doc_id",
                      keep_empty: bool = False) -> DataFrame:
    """CCNet head-cut: keep docs whose perplexity is <= ``max_ppl``.

    Zero-token docs are dropped unless ``keep_empty`` (their ppl is
    undefined; CCNet discards them). Returns the input columns — the
    score is a decision, not a payload; call score_perplexity directly
    when the number itself is wanted.
    """
    scored = score_perplexity(df, lm, text_col, id_col) \
        .select(id_col, "ppl")
    keep = F.col("ppl") <= max_ppl
    if keep_empty:
        keep = keep | F.col("ppl").isNull()
    return df.join(scored.filter(keep).select(id_col), id_col, "semi")
