"""Deterministic samplers (operators/sampling.py): rate accuracy, nesting,
quota exactness, partitioning-independence, shuffle-free plan."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.sampling import (
    hash_rate_sample, hash_rate_threshold, quota_sample)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang")).cache()


def test_rate_within_tolerance(ids):
    n = ids.count()
    for rate in (0.1, 0.5, 0.9):
        kept = hash_rate_sample(ids, rate).count()
        assert abs(kept / n - rate) < 0.02, (rate, kept)


def test_rate_edges(ids):
    assert hash_rate_sample(ids, 0.0).count() == 0
    assert hash_rate_sample(ids, 1.0).count() == ids.count()


def test_same_salt_nested_samples(ids):
    small = {r.doc_id for r in hash_rate_sample(ids, 0.1).collect()}
    big = {r.doc_id for r in hash_rate_sample(ids, 0.3).collect()}
    assert small <= big


def test_different_salts_decorrelated(ids):
    a = {r.doc_id for r in hash_rate_sample(ids, 0.2, salt="a:").collect()}
    b = {r.doc_id for r in hash_rate_sample(ids, 0.2, salt="b:").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.1 < overlap < 0.3  # ~rate, not ~1.0


def test_deterministic_across_partitionings(ids):
    a = sorted(r.doc_id for r in hash_rate_sample(ids, 0.2).collect())
    b = sorted(r.doc_id for r in
               hash_rate_sample(ids.repartition(13), 0.2).collect())
    assert a == b


def test_rate_sample_plan_shuffle_free(ids):
    plan = hash_rate_sample(ids, 0.2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_threshold_validation():
    with pytest.raises(ValueError):
        hash_rate_threshold(1.5)
    assert hash_rate_threshold(0.2) == "33333333"


# --- quota -----------------------------------------------------------------

def test_quota_exact_per_group(ids):
    out = quota_sample(ids, "lang", 7).groupBy("lang").count().collect()
    assert {r["count"] for r in out} == {7}


def test_quota_larger_than_group(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(3)], ["doc_id", "lang"])
    assert quota_sample(df, "lang", 10).count() == 3


def test_quota_is_sample_not_head(ids):
    # hash ordering must not return the first ids
    kept = [r.doc_id for r in
            quota_sample(ids, "lang", 50).collect()]
    assert sorted(kept) != sorted(range(250))


def test_quota_deterministic_across_partitionings(ids):
    a = sorted(r.doc_id for r in quota_sample(ids, "lang", 9).collect())
    b = sorted(r.doc_id for r in
               quota_sample(ids.repartition(17), "lang", 9).collect())
    assert a == b


def test_quota_rank_col(ids):
    out = quota_sample(ids, "lang", 4, rank_col="rk")
    got = {(r.lang, r.rk) for r in out.collect()}
    assert got == {(l, k) for l in "01234" for k in (1, 2, 3, 4)}


def test_quota_validation(ids):
    with pytest.raises(ValueError):
        quota_sample(ids, "lang", -1)
