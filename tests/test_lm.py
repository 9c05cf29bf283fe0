"""LM perplexity scoring (operators/lm.py — CCNet-style quality filter).

Verification strategy: a pure-Python reference model recomputes every
number on a hand-sized corpus (gold test), plus edge cases (OOV-only
docs, empty docs, vocab truncation ties) and a plan pin that the
scoring join broadcasts the vocab.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.lm import (
    MICRO,
    perplexity_filter,
    score_perplexity,
    train_unigram_lm,
)

REF_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]


def _py_lm(texts, vocab_size):
    """Reference implementation, straight from the docstring math."""
    from collections import Counter

    counts = Counter(w for t in texts for w in t.lower().split())
    total = sum(counts.values())
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    denom = total + 1
    logp = {w: int(round(math.log(c / denom) * MICRO)) for w, c in vocab}
    oov = int(round(math.log((total - sum(c for _, c in vocab) + 1) / denom)
                    * MICRO))
    return logp, oov, total


def _py_score(text, logp, oov):
    toks = text.lower().split()
    s = sum(logp.get(w, oov) for w in toks)
    n = len(toks)
    ppl = round(math.exp((-s / MICRO) / n), 2) if n else None
    return n, s, ppl


@pytest.fixture(scope="module")
def ref_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF_TEXTS)], "doc_id long, text string")


def test_matches_python_reference_full_vocab(spark, ref_df):
    lm = train_unigram_lm(ref_df, vocab_size=100)
    logp, oov, total = _py_lm(REF_TEXTS, 100)
    assert lm.total_tokens == total
    assert lm.oov_logp_micro == oov
    got = {r["token"]: r["logp_micro"] for r in lm.vocab.collect()}
    assert got == logp

    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "unseen words only"), (12, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            score_perplexity(docs, lm).collect()}
    for did, text in [(10, "the cat sat"), (11, "unseen words only")]:
        n, s, ppl = _py_score(text, logp, oov)
        r = rows[did]
        assert (r["n_tokens"], r["logprob_micro"]) == (n, s)
        assert r["ppl"] == pytest.approx(ppl, abs=1e-9)
    # empty doc keeps its row: n_tokens 0, NULL ppl
    assert rows[12]["n_tokens"] == 0 and rows[12]["ppl"] is None


def test_vocab_truncation_deterministic_ties(spark, ref_df):
    # vocab_size=3: counts are the=4,a=2,cat=2,dog=2,on=2,sat=2,...
    # ties at cnt=2 break by token asc -> {the, a, cat}
    lm = train_unigram_lm(ref_df, vocab_size=3)
    toks = {r["token"] for r in lm.vocab.collect()}
    assert toks == {"the", "a", "cat"}
    assert lm.vocab_size == 3


def test_oov_doc_scores_pure_unk(spark, ref_df):
    lm = train_unigram_lm(ref_df, vocab_size=100)
    docs = spark.createDataFrame([(1, "zz qq ww")], "doc_id long, text string")
    r = score_perplexity(docs, lm).first()
    assert r["logprob_micro"] == 3 * lm.oov_logp_micro
    assert r["ppl"] == pytest.approx(
        round(math.exp(-lm.oov_logp_micro / MICRO), 2), abs=1e-9)


def test_filter_keeps_natural_text(spark, ref_df):
    lm = train_unigram_lm(ref_df, vocab_size=100)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),   # in-distribution -> low ppl
         (2, "zz qq ww ee rr tt"),        # OOV gibberish -> high ppl
         (3, "")],                        # empty -> NULL ppl
        "doc_id long, text string")
    scored = {r["doc_id"]: r["ppl"] for r in
              score_perplexity(docs, lm).collect()}
    assert scored[1] < scored[2]
    cut = (scored[1] + scored[2]) / 2
    kept = {r["doc_id"]
            for r in perplexity_filter(docs, lm, cut).collect()}
    assert kept == {1}
    kept_e = {r["doc_id"]
              for r in perplexity_filter(docs, lm, cut,
                                         keep_empty=True).collect()}
    assert kept_e == {1, 3}


def test_whitespace_runs_and_case_fold(spark, ref_df):
    """Tokenizer contract: runs of \\t/\\n collapse, case folds, and the
    ''-token phantom from ws_tokens_expr never reaches the LM."""
    lm = train_unigram_lm(ref_df, vocab_size=100)
    docs = spark.createDataFrame(
        [(1, "THE\t\tCat\n sat "), (2, "   \n\t ")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in score_perplexity(docs, lm).collect()}
    logp, oov, _ = _py_lm(REF_TEXTS, 100)
    n, s, ppl = _py_score("the cat sat", logp, oov)
    assert (rows[1]["n_tokens"], rows[1]["logprob_micro"]) == (n, s)
    assert rows[2]["n_tokens"] == 0 and rows[2]["ppl"] is None


def test_scoring_join_broadcasts_vocab(spark, ref_df):
    lm = train_unigram_lm(ref_df, vocab_size=100)
    docs = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    plan = score_perplexity(docs, lm)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_engine_surface_self_perplexity(fd):
    """fd.perplexity(): self-trained LM over the 1k corpus — every doc
    scored, schema stable, boilerplate-heavy pages are NOT outliers
    (they share vocab with everything)."""
    scored = fd.perplexity(vocab_size=2000)
    assert scored.columns == ["doc_id", "url", "n_tokens",
                              "logprob_micro", "ppl"]
    n_docs = fd.docs().count()
    assert scored.count() == n_docs
    ok = scored.filter(F.col("ppl").isNotNull() & (F.col("ppl") > 1))
    assert ok.count() == scored.filter(F.col("n_tokens") > 0).count()


def test_empty_reference_raises(spark):
    empty = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        train_unigram_lm(empty)
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_lm(empty, vocab_size=0)
