"""Deterministic training-shard shuffle (operators/shards.py)."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.shards import (
    assign_training_shards, resolve_n_shards, write_training_shards,
)

N = 2000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))


def test_deterministic_across_partitionings(spark, docs):
    a = assign_training_shards(docs, 8, salt="s").orderBy("doc_id").collect()
    b = assign_training_shards(docs.repartition(13), 8, salt="s") \
        .orderBy("doc_id").collect()
    assert [(r["doc_id"], r["shard"], r["pos"]) for r in a] \
        == [(r["doc_id"], r["shard"], r["pos"]) for r in b]


def test_salt_changes_permutation(spark, docs):
    a = assign_training_shards(docs, 8, salt="s1").orderBy("doc_id").collect()
    b = assign_training_shards(docs, 8, salt="s2").orderBy("doc_id").collect()
    moved = sum(1 for x, y in zip(a, b)
                if (x["shard"], x["pos"]) != (y["shard"], y["pos"]))
    assert moved > N * 0.9  # a fresh permutation, not a tweak


def test_shards_balanced_and_pos_contiguous(spark, docs):
    out = assign_training_shards(docs, 8, salt="s").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > (N / 8) * 0.6 and max(sizes) < (N / 8) * 1.4
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # original columns carried through
    assert {"doc_id", "text", "shard", "pos"} == set(out[0].asDict())


def test_no_global_single_partition_sort(spark, docs):
    """The window must partition by shard — a global row_number would
    collapse to ONE partition and die at scale."""
    plan = assign_training_shards(docs, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan


def test_resolve_n_shards():
    assert resolve_n_shards(100, target_rows_per_shard=250_000) == 8
    assert resolve_n_shards(10_000_000, target_rows_per_shard=250_000) == 40
    assert resolve_n_shards(10**12) == 65536  # hi clamp


def test_n_shards_validation(spark, docs):
    with pytest.raises(ValueError):
        assign_training_shards(docs, 0)


def test_writer_layout_and_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, 4, salt="w")
    back = spark.read.parquet(path)
    # partition dirs present; boolean/int partition col reads back — cast
    assert back.select(F.col("shard").cast("int")).distinct().count() == 4
    assert back.count() == N
    # per-file rows are in pos order (loaders stream files sequentially)
    import glob
    import pyarrow.parquet as pq
    files = sorted(glob.glob(path + "/shard=*/*.parquet"))
    assert files
    for f in files[:4]:
        pos = pq.read_table(f, columns=["pos"]).column("pos").to_pylist()
        assert pos == sorted(pos)
    # round-trip matches the assignment
    a = {r["doc_id"]: (int(r["shard"]), r["pos"])
         for r in assign_training_shards(docs, 4, salt="w").collect()}
    b = {r["doc_id"]: (int(r["shard"]), r["pos"])
         for r in back.select("doc_id", F.col("shard").cast("int")
                              .alias("shard"), "pos").collect()}
    assert a == b


def test_writer_single_exchange(spark, tmp_path):
    # the corpus text must cross exactly ONE exchange: the pre-window
    # repartition on shard satisfies the rank window's clustering AND
    # the writer's output partitioning (round-6 review finding)
    rows = [(i, f"text body {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = assign_training_shards(df, 4, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # and the pinned-width form is row-identical to the default form
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, assign_training_shards(df, 4).collect()))
    assert a == b
