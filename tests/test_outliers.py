"""exact_rank_head: two-phase percentile prune + exact rank, with the
under-prune fallback (ADVICE r01: approx cutoff on skewed/tied data can
leave fewer than k survivors — the exact bottom-k contract must hold)."""

from pyspark.sql import functions as F

from fastdup_spark.operators.outliers import exact_rank_head


def _naive_bottom_k(rows, k):
    return sorted(rows)[:k]


def test_fallback_when_cutoff_under_prunes(spark):
    """A margin so small the cutoff prunes below k forces the full-table
    fallback; the result must still be the exact deterministic bottom-k."""
    rows = [(i, float(i % 7)) for i in range(1000)]  # heavy ties
    df = spark.createDataFrame(rows, "doc_id long, v double")
    k = 100
    got = exact_rank_head(df, k, 1000, "v", "doc_id",
                          ascending=True, margin=1e-6).collect()
    want = _naive_bottom_k([(r[1], r[0]) for r in rows], k)
    assert sorted((r["v"], r["doc_id"]) for r in got) == want
    assert len(got) == k


def test_all_tied_values(spark):
    df = spark.createDataFrame([(i, 5.0) for i in range(200)],
                               "doc_id long, v double")
    got = exact_rank_head(df, 10, 200, "v", "doc_id", ascending=True).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(10))


def test_descending_and_zero_k(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                               "doc_id long, v double")
    top = exact_rank_head(df, 5, 50, "v", "doc_id", ascending=False).collect()
    assert sorted(r["doc_id"] for r in top) == [45, 46, 47, 48, 49]
    assert exact_rank_head(df, 0, 50, "v", "doc_id").count() == 0
