"""Shared dedup helpers (operators/dedup.py): the cross-doc duplicate
flag pass every rewrite operator uses, and the integer kill fraction."""

import random

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.dedup import (
    cross_doc_duplicated, integer_fraction,
)


def _reference(rows, min_docs):
    docs_per_key = {}
    for i, k in rows:
        if k is not None:
            docs_per_key.setdefault(k, set()).add(i)
    return {(i, k) for i, k in rows
            if k is not None and len(docs_per_key[k]) >= min_docs}


@pytest.mark.parametrize("min_docs", [2, 3])
def test_matches_python_reference_with_nulls(spark, min_docs):
    rng = random.Random(min_docs * 101)
    rows = [(rng.randint(1, 8), rng.choice(["a", "b", "c", "d", None]))
            for _ in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, k string")
    got = {(r["doc_id"], r["k"])
           for r in cross_doc_duplicated(df, "k", min_docs).collect()}
    want = _reference(rows, min_docs)
    assert got == want
    # row multiplicity: every qualifying input ROW comes back
    got_rows = cross_doc_duplicated(df, "k", min_docs).count()
    assert got_rows == sum(1 for t in rows if t in want)


def test_null_keys_never_flagged(spark):
    # Spark pools NULLs into one window partition; without the guard two
    # docs sharing only a NULL key would be "duplicates" of each other
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "x")],
        "doc_id bigint, k string")
    got = {r["doc_id"] for r in cross_doc_duplicated(df, "k").collect()}
    assert got == {3, 4}


def test_within_doc_repeats_not_flagged(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "x"), (2, "y")],
        "doc_id bigint, k string")
    assert cross_doc_duplicated(df, "k").count() == 0


def test_extra_columns_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 20)], "doc_id bigint, k string, payload int")
    rows = cross_doc_duplicated(df, "k").collect()
    assert {r["payload"] for r in rows} == {10, 20}
    assert set(rows[0].asDict()) == {"doc_id", "k", "payload"}


def test_integer_fraction():
    assert integer_fraction(0.3) == (3, 10)
    assert integer_fraction(0.5) == (1, 2)
    num, den = integer_fraction(1 / 3)
    assert num * 3 == den  # exact thirds survive limit_denominator
