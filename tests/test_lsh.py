"""LSH banding correctness: identical sigs share all buckets, planted
near-dups share ≥1 bucket, salting splits mega-buckets (FIXTURES.md §C)."""

from pyspark.sql import functions as F

from fastdup_spark.config import PipelineConfig
from fastdup_spark.operators.lsh import (
    band_buckets, bucket_stats, candidate_pairs, salt_buckets,
)

CFG = PipelineConfig()


def test_identical_sigs_share_all_buckets(spark):
    sig = list(range(CFG.n_perm))
    df = spark.createDataFrame(
        [(1, sig), (2, sig)], "doc_id long, minhash array<long>")
    b = band_buckets(df, CFG.lsh_bands, CFG.lsh_rows)
    shared = (
        b.filter("doc_id = 1").select("band_id", "bucket")
        .intersect(b.filter("doc_id = 2").select("band_id", "bucket"))
    )
    assert shared.count() == CFG.lsh_bands


def test_band_count_and_determinism(spark):
    sig = list(range(CFG.n_perm))
    df = spark.createDataFrame([(1, sig)], "doc_id long, minhash array<long>")
    b1 = sorted(band_buckets(df, CFG.lsh_bands, CFG.lsh_rows).collect())
    b2 = sorted(band_buckets(df.repartition(4), CFG.lsh_bands, CFG.lsh_rows).collect())
    assert len(b1) == CFG.lsh_bands
    assert b1 == b2


def test_planted_pairs_share_bucket(fd, url_of, data):
    """Every exact/near truth pair must be an LSH candidate (recall of the
    index itself, before verify)."""
    _, url2id = url_of
    cands = {(r["src"], r["dst"]) for r in fd.store.read(fd.spark, "candidates").collect()}
    tp = data.truth_pairs
    missed = 0
    total = 0
    for _, row in tp[tp.kind.isin(["exact", "near"])].iterrows():
        a, b = url2id[row.src_url], url2id[row.dst_url]
        pair = (min(a, b), max(a, b))
        total += 1
        if pair not in cands:
            missed += 1
    assert total > 0
    assert missed / total <= 0.01, f"candidate recall too low: missed {missed}/{total}"


def test_salting_splits_mega_buckets(spark):
    """A bucket above max_bucket_size must be split into sub-buckets of
    roughly salt_target docs."""
    sig = list(range(CFG.n_perm))
    n = 50
    df = spark.createDataFrame([(i, sig) for i in range(n)], "doc_id long, minhash array<long>")
    b = band_buckets(df, CFG.lsh_bands, CFG.lsh_rows)
    st = bucket_stats(b)
    salted = salt_buckets(b, st, max_bucket_size=10, salt_target=10)
    per_sub = (
        salted.groupBy("band_id", "bucket", "salt").count()
        .agg(F.max("count").alias("mx")).first()["mx"]
    )
    assert per_sub < n  # mega-bucket got split
    n_salts = salted.select("salt").distinct().count()
    assert n_salts >= 4  # ceil(50/10) = 5 splits expected


def test_candidate_pairs_canonical_and_distinct(spark):
    sig = list(range(CFG.n_perm))
    df = spark.createDataFrame([(i, sig) for i in range(4)], "doc_id long, minhash array<long>")
    b = band_buckets(df, CFG.lsh_bands, CFG.lsh_rows)
    salted = salt_buckets(b, bucket_stats(b), 1000, 100)
    pairs = candidate_pairs(salted).collect()
    assert len(pairs) == 6  # C(4,2), deduped across 32 shared bands
    assert all(r["src"] < r["dst"] for r in pairs)


def test_bucket_counters_in_marker(fd):
    marker = fd.store.read_marker("candidates")
    c = marker["counters"]
    assert c["n_buckets_ge2"] > 0
    assert c["max_bucket_size"] >= 2
    assert "n_salted_buckets" in c


def test_tuner_collision_prob_matches_config_doc():
    from fastdup_spark.operators.lsh import lsh_collision_prob
    # the config docstring's recall claim: 32x4 at J=0.85 ~= 1 - 6e-11
    p = lsh_collision_prob(0.85, 32, 4)
    assert p > 1 - 1e-9


def test_tuner_recall_floor_and_factorization():
    from fastdup_spark.operators.lsh import (
        lsh_collision_prob, tune_lsh_params,
    )
    for t, n in [(0.5, 128), (0.7, 128), (0.85, 128), (0.9, 256),
                 (0.95, 64), (0.3, 128)]:
        b, r = tune_lsh_params(t, n)
        assert b * r == n and b >= 1 and r >= 1
        # every tested point has SOME factorization above the floor, so
        # the pick must honor it
        assert lsh_collision_prob(t, b, r) >= 0.99, (t, n, b, r)


def test_tuner_matches_shipped_config():
    from fastdup_spark.operators.lsh import tune_lsh_params
    # the docstring's pinned examples
    assert tune_lsh_params(0.85, 128) == (16, 8)
    assert tune_lsh_params(0.85, 128, min_recall=0.999) == (32, 4)


def test_tuner_prefers_fewer_false_candidates_within_floor():
    from fastdup_spark.operators.lsh import (
        lsh_collision_prob, tune_lsh_params,
    )
    b, r = tune_lsh_params(0.85, 128)
    # more rows than the shipped 32x4 -> strictly smaller sub-threshold area
    assert r > 4
    assert lsh_collision_prob(0.5, b, r) < lsh_collision_prob(0.5, 32, 4)


def test_tuner_rows_grow_with_threshold():
    from fastdup_spark.operators.lsh import tune_lsh_params
    rows = [tune_lsh_params(t, 128)[1] for t in (0.3, 0.6, 0.9)]
    assert rows == sorted(rows) and rows[0] < rows[-1]


def test_tuner_fallback_when_floor_unreachable():
    from fastdup_spark.operators.lsh import (
        lsh_collision_prob, tune_lsh_params,
    )
    # n_perm=4 at t=0.3: no factorization reaches 0.99 -> argmax p(t)
    b, r = tune_lsh_params(0.3, 4)
    assert b * r == 4
    best = max(((bb, 4 // bb) for bb in (1, 2, 4)),
               key=lambda br: lsh_collision_prob(0.3, br[0], br[1]))
    assert (b, r) == best


def test_tuner_validation():
    import pytest as _pytest
    from fastdup_spark.operators.lsh import tune_lsh_params
    with _pytest.raises(ValueError):
        tune_lsh_params(0.0)
    with _pytest.raises(ValueError):
        tune_lsh_params(1.0)
    with _pytest.raises(ValueError):
        tune_lsh_params(0.5, 0)
