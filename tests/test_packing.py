"""Sequence packing (operators/packing.py): deterministic next-fit doc ->
(shard, bin, bin_offset) assignment, nothing split or truncated."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.packing import (
    pack_sequences, packing_stats, token_count_expr,
)


def _reference(ids_counts, capacity, n_shards, salt=""):
    """Pure-Python twin: md5 shard/pos walk + next-fit recurrence."""
    rows = []
    for i, n in ids_counts:
        hk = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        rows.append((int(hk[:15], 16) % n_shards, hk, i, n))
    out = {}
    for shard in range(n_shards):
        walk = sorted((hk, i, n) for s, hk, i, n in rows if s == shard)
        b, fill = 0, capacity + 1
        for pos, (hk, i, n) in enumerate(walk, start=1):
            if fill + n <= capacity:
                off = fill
                fill += n
            else:
                b += 1
                off = 0
                fill = n
            out[i] = (shard, pos, n, b, off, n > capacity)
    return out


def _docs(spark, ids_counts):
    rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in ids_counts]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_token_count_expr_blank_docs(spark):
    df = spark.createDataFrame([(1, "a  b\tc"), (2, "  "), (3, "")],
                               "doc_id bigint, text string")
    got = {r["doc_id"]: r["n"]
           for r in df.select("doc_id",
                              token_count_expr("text").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0}


def test_matches_pure_python_reference(spark):
    rng = random.Random(11)
    ids_counts = [(i, rng.randint(0, 40)) for i in range(1, 120)]
    want = _reference(ids_counts, capacity=64, n_shards=4, salt="s")
    got = {r["doc_id"]: (r["shard"], r["pos"], r["n_tokens"], r["bin"],
                         r["bin_offset"], r["oversize"])
           for r in pack_sequences(_docs(spark, ids_counts), 64, 4,
                                   salt="s").collect()}
    assert got == want


def test_invariants(spark):
    rng = random.Random(5)
    ids_counts = [(i, rng.randint(1, 50)) for i in range(1, 200)]
    cap = 80
    out = pack_sequences(_docs(spark, ids_counts), cap, 8).collect()
    assert len(out) == len(ids_counts)  # nothing dropped, nothing split
    by_bin = {}
    for r in out:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), rows in by_bin.items():
        rows.sort(key=lambda r: r["pos"])
        fill = 0
        for r in rows:
            assert r["bin_offset"] == fill  # docs tile the bin contiguously
            fill += r["n_tokens"]
        if not any(r["oversize"] for r in rows):
            assert fill <= cap
    # bins are 1-based and contiguous per shard
    for shard in {r["shard"] for r in out}:
        bins = sorted({r["bin"] for r in out if r["shard"] == shard})
        assert bins == list(range(1, len(bins) + 1))


def test_oversize_doc_gets_own_bin(spark):
    ids_counts = [(1, 10), (2, 999), (3, 10), (4, 10)]
    out = {r["doc_id"]: r
           for r in pack_sequences(_docs(spark, ids_counts), 64, 1,
                                   salt="z").collect()}
    big = out[2]
    assert big["oversize"] and big["bin_offset"] == 0
    assert all(r["bin"] != big["bin"] for i, r in out.items() if i != 2)


def test_zero_token_doc_zero_width_slot(spark):
    ids_counts = [(1, 5), (2, 0), (3, 5)]
    out = pack_sequences(_docs(spark, ids_counts), 64, 1).collect()
    assert len(out) == 3
    assert sum(r["n_tokens"] for r in out) == 10


def test_partitioning_invariance_and_salt(spark):
    ids_counts = [(i, (i * 7) % 30) for i in range(1, 90)]
    d = _docs(spark, ids_counts)
    a = sorted(map(tuple, pack_sequences(d, 50, 4, salt="a").collect()))
    b = sorted(map(tuple,
                   pack_sequences(d.repartition(11), 50, 4,
                                  salt="a").collect()))
    assert a == b  # partitioning-invariant
    c = sorted(map(tuple, pack_sequences(d, 50, 4, salt="b").collect()))
    assert a != c  # salt = fresh permutation


def test_count_col_override(spark):
    df = spark.createDataFrame([(1, "ignored", 30), (2, "ignored", 40)],
                               "doc_id bigint, text string, bpe int")
    out = {r["doc_id"]: r["n_tokens"]
           for r in pack_sequences(df, 64, 1, count_col="bpe").collect()}
    assert out == {1: 30, 2: 40}


def test_packing_stats(spark):
    ids_counts = [(i, 20) for i in range(1, 20)]
    packed = pack_sequences(_docs(spark, ids_counts), capacity=64,
                            n_shards=2)
    st = packing_stats(packed, 64).collect()
    assert all(r["fill"] == r["n_docs"] * 20 for r in st)
    assert all(0 < r["util"] <= 1.0 for r in st)
    assert sum(r["n_docs"] for r in st) == 19


def test_capacity_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, 3)]), 0, 1)


def test_null_text_packs_zero_width(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, 64, 1).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0 and not out[2]["oversize"]


def test_string_ids_rejected(spark):
    df = spark.createDataFrame([("x", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integer id"):
        pack_sequences(df, 64, 1)


def _chop_reference(ids_counts, capacity, n_shards, salt=""):
    """Pure-Python twin of chop_sequences."""
    rows = []
    for i, n in ids_counts:
        hk = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        rows.append((int(hk[:15], 16) % n_shards, hk, i, n))
    out = []
    for shard in range(n_shards):
        walk = sorted((hk, i, n) for s, hk, i, n in rows if s == shard)
        g = 0
        for pos, (hk, i, n) in enumerate(walk, start=1):
            if n == 0:
                continue
            s, e = g, g + n
            for w in range(s // capacity, (e - 1) // capacity + 1):
                a, b = max(s, w * capacity), min(e, (w + 1) * capacity)
                out.append((i, shard, pos, n, w, a - w * capacity,
                            a - s + 1, b - a))
            g = e
    return sorted(out)


def test_chop_matches_python_reference(spark):
    from fastdup_spark.operators.packing import chop_sequences
    rng = random.Random(31)
    ids_counts = [(i, rng.randint(0, 90)) for i in range(1, 150)]
    want = _chop_reference(ids_counts, 64, 4, salt="c")
    got = sorted(map(tuple,
                     chop_sequences(_docs(spark, ids_counts), 64, 4,
                                    salt="c").collect()))
    assert got == want


def test_chop_windows_tile_exactly(spark):
    from fastdup_spark.operators.packing import chop_sequences
    ids_counts = [(i, 17) for i in range(1, 60)]
    cap = 50
    out = chop_sequences(_docs(spark, ids_counts), cap, 2).collect()
    # per doc: slice lengths sum to n_tokens, slices contiguous
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for i, rows in per_doc.items():
        rows.sort(key=lambda r: r["tok_start"])
        assert sum(r["tok_len"] for r in rows) == rows[0]["n_tokens"]
        nxt = 1
        for r in rows:
            assert r["tok_start"] == nxt
            nxt += r["tok_len"]
    # per window: slices tile [0, cap) with no gaps (except the last
    # window of each shard, which may be a prefix)
    wins = {}
    for r in out:
        wins.setdefault((r["shard"], r["window"]), []).append(r)
    for (shard, win), rows in wins.items():
        rows.sort(key=lambda r: r["win_offset"])
        off = 0
        for r in rows:
            assert r["win_offset"] == off
            off += r["tok_len"]
        last = max(w for s, w in wins if s == shard)
        if win < last:
            assert off == cap
    # straddling actually happens at these sizes (17 does not divide 50)
    assert any(len(rows) > 1 for rows in per_doc.values())


def test_chop_zero_token_docs_emit_nothing(spark):
    from fastdup_spark.operators.packing import chop_sequences
    out = chop_sequences(_docs(spark, [(1, 5), (2, 0), (3, 7)]),
                         64, 1).collect()
    assert {r["doc_id"] for r in out} == {1, 3}
