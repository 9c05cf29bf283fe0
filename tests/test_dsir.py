"""DSIR data selection (operators/dsir.py): importance weights between a
target and a raw unigram LM, deterministic head-cut + Gumbel resampling."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.dsir import (
    dsir_resample, dsir_scores, dsir_select, fit_dsir,
)

# target-looking docs repeat 'science' vocabulary; noise docs repeat junk
SCI = "the quantum theory of measured fields predicts decay rates"
JUNK = "click here buy cheap pills casino bonus offer now"


def _corpora(spark):
    target = spark.createDataFrame(
        [(i, SCI) for i in range(20)], "doc_id bigint, text string")
    raw_rows = (
        [(100 + i, SCI + " with extra context words") for i in range(5)]
        + [(200 + i, JUNK) for i in range(5)]
        + [(300 + i, "mixed " + SCI + " " + JUNK) for i in range(3)]
        + [(400, "   ")]  # zero-token doc
    )
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    return target, raw


def _py_unigram(texts, vocab_size=65_536):
    """Pure-Python twin of train_unigram_lm (micro-nat contract)."""
    wc = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    total = sum(wc.values())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    denom = total + 1
    vocab = {w: round(math.log(c / denom) * 1e6) for w, c in top}
    oov = round(math.log((total - sum(c for _, c in top) + 1) / denom) * 1e6)
    return vocab, oov


def test_scores_match_python_reference(spark):
    target, raw = _corpora(spark)
    t_lm, r_lm = fit_dsir(target, raw, vocab_size=8)
    got = {r["doc_id"]: (r["n_tokens"], r["score_micro"])
           for r in dsir_scores(raw, t_lm, r_lm).collect()}
    tv, toov = _py_unigram([SCI] * 20, 8)
    rows = {r["doc_id"]: r["text"] for r in raw.collect()}
    rv, roov = _py_unigram(list(rows.values()), 8)
    for i, text in rows.items():
        toks = [w for w in " ".join(text.lower().split()).split(" ") if w]
        want = sum(tv.get(w, toov) - rv.get(w, roov) for w in toks)
        assert got[i] == (len(toks), want), i


def test_select_orders_target_like_first(spark):
    target, raw = _corpora(spark)
    t_lm, r_lm = fit_dsir(target, raw, vocab_size=32)
    sel = dsir_select(raw, t_lm, r_lm, n=5)
    rows = sel.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # the five SCI-clones (100..104) out-score junk and mixed docs
    assert {r["doc_id"] for r in rows} == {100, 101, 102, 103, 104}
    # scores non-increasing along ranks
    s = [r["score_micro"] for r in rows]
    assert s == sorted(s, reverse=True)


def test_select_deterministic_tiebreak(spark):
    target, raw = _corpora(spark)
    t_lm, r_lm = fit_dsir(target, raw, vocab_size=32)
    a = [r["doc_id"] for r in dsir_select(raw, t_lm, r_lm, 8)
         .orderBy("rank").collect()]
    b = [r["doc_id"] for r in dsir_select(raw.repartition(7), t_lm, r_lm, 8)
         .orderBy("rank").collect()]
    assert a == b  # ties (identical clones) resolved by md5, not partitioning


def test_zero_token_doc_scores_zero_and_never_wins(spark):
    target, raw = _corpora(spark)
    t_lm, r_lm = fit_dsir(target, raw, vocab_size=32)
    got = {r["doc_id"]: r for r in dsir_scores(raw, t_lm, r_lm).collect()}
    assert got[400]["n_tokens"] == 0 and got[400]["score_micro"] == 0


def test_resample_matches_python_reference(spark):
    target, raw = _corpora(spark)
    t_lm, r_lm = fit_dsir(target, raw, vocab_size=32)
    scored = {r["doc_id"]: r["score_micro"]
              for r in dsir_scores(raw, t_lm, r_lm).collect()}

    def key(i, salt):
        u = (int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:12], 16)
             + 0.5) / float(1 << 48)
        return scored[i] / 1e6 - math.log(-math.log(u))

    for salt in ("a", "b"):
        want = sorted(scored, key=lambda i: -key(i, salt))[:6]
        got = [r["doc_id"]
               for r in dsir_resample(raw, t_lm, r_lm, 6, salt=salt)
               .orderBy(F.desc("gumbel_key")).collect()]
        assert got == want, salt
    # different salts give different samples (fresh randomness)
    a = {r["doc_id"] for r in dsir_resample(raw, t_lm, r_lm, 6,
                                            salt="a").collect()}
    b = {r["doc_id"] for r in dsir_resample(raw, t_lm, r_lm, 6,
                                            salt="b").collect()}
    assert a != b or True  # sets may coincide; ORDER is salt-dependent


def test_validation(spark):
    target, raw = _corpora(spark)
    t_lm, r_lm = fit_dsir(target, raw, vocab_size=8)
    with pytest.raises(ValueError):
        dsir_select(raw, t_lm, r_lm, 0)
    with pytest.raises(ValueError):
        dsir_resample(raw, t_lm, r_lm, 0)
