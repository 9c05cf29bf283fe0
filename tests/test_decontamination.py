"""N-gram-overlap decontamination (operators/crossset.py): planted
partial overlaps, boundary sizes, broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.crossset import (
    ngram_overlap_contamination, word_ngrams_expr)


def _grams(spark, text, n):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(word_ngrams_expr(F.col("text"), n).alias("g")) \
        .collect()[0].g


def test_word_ngrams_all_positions(spark):
    assert _grams(spark, "a b c d", 3) == ["a b c", "b c d"]


def test_word_ngrams_short_doc_empty(spark):
    assert _grams(spark, "a b", 3) == []


def test_word_ngrams_exact_length(spark):
    assert _grams(spark, "a b c", 3) == ["a b c"]


def test_word_ngrams_whitespace_normalized(spark):
    assert _grams(spark, "  a   b\tc ", 2) == ["a b", "b c"]


def test_contamination_catches_partial_overlap(spark):
    # doc 2 quotes one eval sentence inside otherwise-novel text: the
    # exact/near-dup decontamination misses this, the n-gram probe must not
    train = spark.createDataFrame([
        (1, "completely unrelated words in this training document here"),
        (2, "novel prefix text the quick brown fox jumps over the lazy dog "
            "novel suffix text"),
        (3, "the quick brown fox jumps over the lazy dog"),  # eval verbatim
    ], ["doc_id", "text"])
    ev = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["gram"])
    # n=9 == the eval gram length
    out = {r.doc_id: r.n_matched_ngrams for r in
           ngram_overlap_contamination(train, ev, n=9).collect()}
    assert set(out) == {2, 3}
    assert out[2] == 1 and out[3] == 1


def test_contamination_counts_distinct_grams(spark):
    train = spark.createDataFrame(
        [(1, "p q r s p q r s p q r s")], ["doc_id", "text"])
    ev = spark.createDataFrame([("p q r s",), ("q r s p",)], ["gram"])
    out = ngram_overlap_contamination(train, ev, n=4).collect()
    assert out[0].n_matched_ngrams == 2  # distinct grams, not occurrences


def test_contamination_plan_broadcasts_eval(spark):
    train = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    ev = spark.createDataFrame([("a b c",)], ["gram"])
    plan = ngram_overlap_contamination(train, ev, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
