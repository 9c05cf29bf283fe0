"""Distributed BPE merge learning (operators/bpe.py) vs a pure-Python
Sennrich-reference trainer (same pre-tokenization, same tie-break, same
left-to-right non-overlapping merge application)."""

import re

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.bpe import (
    BpeMerge, learn_bpe, merge_pattern, segment_expr, vocab, word_counts,
)

GPT2_RE = (r"'(?:s|t|re|ve|m|ll|d)|"
           r" ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+")  # python twin (no \p classes)


def _py_pretokens(text):
    out = []
    for t in re.findall(GPT2_RE, text):
        if re.sub(r"\s+", "", t) == "":
            continue
        out.append(re.sub(r"^ ", "Ġ", t))
    return out


def _py_word_counts(texts):
    wc = {}
    for t in texts:
        for w in _py_pretokens(t):
            wc[w] = wc.get(w, 0) + 1
    return wc


def _py_apply(symbols, left, right):
    """Left-to-right non-overlapping merge, Sennrich semantics."""
    out, i = [], 0
    while i < len(symbols):
        if (i + 1 < len(symbols) and symbols[i] == left
                and symbols[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _py_learn(texts, n_merges, min_count=2):
    wc = _py_word_counts(texts)
    words = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rank in range(n_merges):
        stats = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = \
                    stats.get((syms[i], syms[i + 1]), 0) + wc[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_count:
            break
        merges.append((rank, l, r, n))
        words = {w: _py_apply(s, l, r) for w, s in words.items()}
    return merges, {w: words[w] for w in wc}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


SENNRICH = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]


def test_word_counts_gpt2_and_space_mark(spark):
    wc = {r["word"]: r["count"]
          for r in word_counts(_docs(spark, ["the cat  the'd cat!"])).collect()}
    # start-of-text 'the' is bare; the 'the' after the DOUBLE space is
    # also bare (the \s+ run eats both spaces, GPT-2 regex semantics)
    assert wc["the"] == 2
    assert wc["Ġcat"] == 2    # single leading space -> Ġ
    assert wc["'d"] == 1           # contraction split
    assert wc["!"] == 1
    assert not any(" " in w for w in wc)  # never a literal space symbol


def test_matches_python_reference_sennrich_corpus(spark):
    want, _ = _py_learn(SENNRICH, 8)
    got, words = learn_bpe(_docs(spark, SENNRICH), 8)
    assert [(m.rank, m.left, m.right, m.pair_count) for m in got] == want
    # the famous outcome: 'est</w>' becomes one symbol
    syms = {r["word"]: r["symbols"].split(" ") for r in words.collect()}
    assert any("est</w>" in s for s in syms.values())


def test_matches_python_reference_fuzz(spark):
    import random
    rng = random.Random(23)
    texts = [" ".join(rng.choice(["aba", "abab", "bab", "aa", "baa"])
                      for _ in range(rng.randint(3, 20)))
             for _ in range(12)]
    want, pywords = _py_learn(texts, 10)
    got, words = learn_bpe(_docs(spark, texts), 10)
    assert [(m.rank, m.left, m.right, m.pair_count) for m in got] == want
    syms = {r["word"]: r["symbols"].split(" ") for r in words.collect()}
    assert syms == pywords


def test_left_to_right_nonoverlapping(spark):
    # 'a a a </w>' under merge (a,a) -> 'aa a </w>' (never 'a aa')
    texts = ["aaa aaa baseline other words here"]
    merges, words = learn_bpe(_docs(spark, texts), 1, min_count=1)
    m = merges[0]
    syms = {r["word"]: r["symbols"] for r in words.collect()}
    if (m.left, m.right) == ("a", "a"):
        assert syms["aaa"].startswith("aa a")


def test_min_count_stop_and_empty_corpus(spark):
    merges, words = learn_bpe(_docs(spark, ["x y z"]), 5, min_count=2)
    assert merges == []  # every pair unique -> stop immediately
    merges, _ = learn_bpe(_docs(spark, ["   "]), 3)
    assert merges == []  # whitespace-only corpus: no words at all


def test_special_regex_chars_as_symbols(spark):
    # symbols like '.', '$', '(' must merge literally, not as regex
    texts = ["$5.00 $5.00 $5.00 (ok) (ok)"]
    want, pywords = _py_learn(texts, 6, min_count=2)
    got, words = learn_bpe(_docs(spark, texts), 6, min_count=2)
    assert [(m.rank, m.left, m.right, m.pair_count) for m in got] == want
    syms = {r["word"]: r["symbols"].split(" ") for r in words.collect()}
    assert syms == pywords


def test_segment_expr_reproduces_training_segmentation(spark):
    merges, words = learn_bpe(_docs(spark, SENNRICH), 6)
    seg = words.select(
        "word", "symbols",
        F.array_join(segment_expr(F.col("word"), merges), " ").alias("re"))
    bad = seg.filter(F.col("re") != F.col("symbols")).count()
    assert bad == 0
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # segmentation is pure JVM


def test_vocab_counts(spark):
    merges, words = learn_bpe(_docs(spark, SENNRICH), 4)
    v = {r["symbol"]: r["count"] for r in vocab(merges, words).collect()}
    wc = _py_word_counts(SENNRICH)
    # total symbol mass == sum over words of count * len(symbols)
    _, pywords = _py_learn(SENNRICH, 4)
    want_total = sum(wc[w] * len(s) for w, s in pywords.items())
    assert sum(v.values()) == want_total


def test_merge_pattern_quoting():
    p = merge_pattern(".", "$")
    assert "\\Q.\\E" in p and "\\Q$\\E" in p
    # a symbol containing the quote terminator itself stays literal
    assert "\\E\\\\E\\Q" in merge_pattern("a\\Eb", "c")


def test_n_merges_validation(spark):
    with pytest.raises(ValueError):
        learn_bpe(_docs(spark, ["a b"]), -1)


def test_driver_and_distributed_loops_agree(spark):
    # r07 (verdict #3): the merge loop runs on the driver when the word
    # table fits; parity with the distributed explode+groupBy loop is
    # pinned here (merge table AND final segmentations identical).
    import random

    rng = random.Random(3)
    base = ["low", "lower", "newest", "widest", "new", "west", "est"]
    texts = [" ".join(rng.choices(base, k=12)) for _ in range(40)]
    m_drv, w_drv = learn_bpe(_docs(spark, texts), 12)
    m_dst, w_dst = learn_bpe(_docs(spark, texts), 12, driver_words_max=0)
    assert [(m.rank, m.left, m.right, m.pair_count) for m in m_drv] == \
           [(m.rank, m.left, m.right, m.pair_count) for m in m_dst]
    drv = {r["word"]: (r["count"], r["symbols"]) for r in w_drv.collect()}
    dst = {r["word"]: (r["count"], r["symbols"]) for r in w_dst.collect()}
    assert drv == dst


def test_big_merge_table_bounded_plan(spark, monkeypatch):
    # r07 (verdict #3): >_SEGMENT_EXPR_MAX merges segment through ONE
    # Arrow pass instead of an n_merges-deep regexp chain; learning 1k+
    # merges stays bounded (driver loop — no job per merge) and the two
    # segmenters agree exactly.
    import fastdup_spark.operators.bpe as bpe_mod
    from pyspark.sql import functions as F

    rng = __import__("random").Random(9)
    words = ["".join(rng.choices("abcdefgh", k=rng.randint(3, 10)))
             for _ in range(400)]
    texts = [" ".join(rng.choices(words, k=30)) for _ in range(50)]
    merges, w = learn_bpe(_docs(spark, texts), 1200, min_count=1)
    assert len(merges) > bpe_mod._SEGMENT_EXPR_MAX
    df = w.select("word").limit(200)
    seg_udf = df.select("word", F.array_join(
        segment_expr(F.col("word"), merges), " ").alias("s"))
    plan = seg_udf._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "regexp_replace" not in plan
    # parity vs the chained-regexp form on a head of the table
    head = merges[:40]
    monkeypatch.setattr(bpe_mod, "_SEGMENT_EXPR_MAX", 10_000)
    chain = df.select("word", F.array_join(
        segment_expr(F.col("word"), head), " ").alias("s"))
    monkeypatch.setattr(bpe_mod, "_SEGMENT_EXPR_MAX", 0)
    arrow = df.select("word", F.array_join(
        segment_expr(F.col("word"), head), " ").alias("s"))
    a = {r["word"]: r["s"] for r in chain.collect()}
    b = {r["word"]: r["s"] for r in arrow.collect()}
    assert a == b
