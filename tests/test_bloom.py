"""Bloom novelty filter (operators/bloom.py — Dolma-style history dedup).

Gold strategy: the bitmap's verdicts are re-derived from the same
position sets via a pure-Python set replay (no false negatives by law,
false positives exactly where ALL k positions collide)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.bloom import (
    _BLOCK_BITS,
    BloomFilterModel,
    bloom_novel,
    bloom_params,
    build_bloom,
    positions_expr,
    probe_bloom,
)


def _keys_df(spark, keys, col="text"):
    return spark.createDataFrame([(i, k) for i, k in enumerate(keys)],
                                 f"doc_id long, {col} string")


@pytest.fixture(scope="module")
def history(spark):
    return _keys_df(spark, [f"seen doc {i}" for i in range(500)])


@pytest.fixture(scope="module")
def model(history):
    return build_bloom(history, "text", fpp=0.01)


def test_params_textbook_values():
    m, k = bloom_params(1000, 0.01)
    assert m == 9586 and k == 7
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives(spark, history, model):
    flagged = probe_bloom(history, model)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_fpp_bounded_and_novel_pass(spark, model):
    novel = _keys_df(spark, [f"new doc {i}" for i in range(1000)])
    flagged = probe_bloom(novel, model)
    fp = flagged.filter(F.col("maybe_seen")).count()
    assert fp / 1000 < 0.05  # sized for 1%
    survivors = bloom_novel(novel, model)
    assert survivors.count() == 1000 - fp
    assert survivors.columns == ["doc_id", "text"]


def test_matches_python_set_replay(spark, history, model):
    """Gold: verdict == 'all k positions in the inserted-position set'."""
    pos_of = lambda df: df.select(  # noqa: E731
        "doc_id", positions_expr("text", model.n_bits,
                                 model.n_hashes).alias("ps"))
    inserted = {p for r in pos_of(history).collect() for p in r["ps"]}
    probe_set = _keys_df(
        spark, [f"seen doc {i}" for i in range(0, 1000, 7)]
        + [f"other {i}" for i in range(200)])
    want = {r["doc_id"]: all(p in inserted for p in r["ps"])
            for r in pos_of(probe_set).collect()}
    got = {r["doc_id"]: r["maybe_seen"]
           for r in probe_bloom(probe_set, model).collect()}
    assert got == want


def test_null_keys(spark, model):
    df = spark.createDataFrame([(1, None), (2, "seen doc 3")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r["maybe_seen"]
            for r in probe_bloom(df, model).collect()}
    assert rows[1] is None and rows[2] is True
    # novelty filter: NULL keys pass through (never inserted)
    assert {r["doc_id"] for r in bloom_novel(df, model).collect()} == {1}
    # and the builder skips them without error
    m2 = build_bloom(df, "text", n_bits=1024, n_hashes=3)
    assert m2.n_set == 3


def test_multiblock_assembly_and_determinism(spark, history):
    """Bitmap identical under different input partitionings, with
    n_bits spanning multiple assembly blocks plus a ragged tail."""
    n_bits = 2 * _BLOCK_BITS + 100
    m1 = build_bloom(history, "text", n_bits=n_bits, n_hashes=4)
    m8 = build_bloom(history.repartition(8), "text",
                     n_bits=n_bits, n_hashes=4)
    assert m1.bits == m8.bits and len(m1.bits) == (n_bits + 7) >> 3
    assert m1.n_set == m8.n_set > 0
    flags = probe_bloom(history, m1)
    assert flags.filter(~F.col("maybe_seen")).count() == 0


def test_probe_is_map_side(spark, history, model):
    plan = probe_bloom(history, model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_model_is_compact(model):
    assert isinstance(model, BloomFilterModel)
    assert len(model.bits) == (model.n_bits + 7) >> 3
    # 500 keys at 1% fpp: ~4.8k bits = ~600 bytes
    assert len(model.bits) < 2000
    assert 0 < model.n_set <= 500 * model.n_hashes


def test_paragraph_scrub_drops_history_paragraphs(spark):
    from fastdup_spark.operators.bloom import (
        build_paragraph_bloom, paragraph_bloom_scrub,
    )

    boiler = "subscribe to our newsletter today"
    hist = spark.createDataFrame(
        [(i, f"old article {i}\n{boiler}\nmore old text {i}")
         for i in range(50)],
        "doc_id long, text string")
    model = build_paragraph_bloom(hist, fpp=0.001)

    batch = spark.createDataFrame(
        [(100, f"fresh paragraph one\n{boiler}\nfresh paragraph two"),
         (101, boiler),                       # all paragraphs seen
         (102, "entirely new text here"),
         (103, f"old article 7\n\n  \nnew tail paragraph")],  # blanks + reuse
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           paragraph_bloom_scrub(batch, model).collect()}

    # the boilerplate paragraph is gone EVERYWHERE, order preserved
    assert out[100]["clean_text"] == \
        "fresh paragraph one\nfresh paragraph two"
    assert out[100]["n_paras"] == 3 and out[100]["n_dropped"] == 1
    # fully-seen doc survives as an empty rewrite
    assert out[101]["clean_text"] == "" and out[101]["n_dropped"] == 1
    # untouched novel doc is byte-identical
    assert out[102]["clean_text"] == "entirely new text here"
    assert out[102]["n_dropped"] == 0
    # blank lines are not keys; the history-seen paragraph drops
    assert out[103]["clean_text"] == "new tail paragraph"
    assert out[103]["n_paras"] == 2 and out[103]["n_dropped"] == 1


def test_paragraph_scrub_no_false_negatives(spark, history):
    """Every paragraph of the history, redelivered, must drop."""
    from fastdup_spark.operators.bloom import (
        build_paragraph_bloom, paragraph_bloom_scrub,
    )
    model = build_paragraph_bloom(history)
    out = paragraph_bloom_scrub(history, model)
    assert out.filter(F.col("clean_text") != "").count() == 0
    assert out.count() == history.count()


# --------------------------------------------------------------------------
# span mode (ExactSubstr vs history, no join)
# --------------------------------------------------------------------------

def _span_corpus(spark):
    hist = spark.createDataFrame(
        [(1, "h1 h2 h3 h4 h5 h6 filler one"),
         (2, "other words q1 q2 q3 q4 trail here")],
        "doc_id bigint, text string")
    incoming = spark.createDataFrame(
        [(10, "x y h1 h2 h3 h4 h5 h6 z"),        # history run, shifted
         (11, "q1 q2 q3 q4 standalone novel words"),
         (12, "totally novel text with nothing shared"),
         (13, "h1 h2 h3 short")],                 # run shorter than k
        "doc_id bigint, text string")
    return hist, incoming


def test_span_scrub_erases_history_runs_at_any_offset(spark):
    from fastdup_spark.operators.bloom import (
        build_kgram_bloom, span_bloom_scrub)
    hist, incoming = _span_corpus(spark)
    model = build_kgram_bloom(hist, k=4, fpp=1e-6)
    out = {r["doc_id"]: r
           for r in span_bloom_scrub(incoming, model, k=4).collect()}
    assert out[10]["clean_text"] == "x y z"      # shifted run erased
    assert out[10]["n_spans"] == 1 and out[10]["n_dropped"] == 6
    assert out[11]["n_dropped"] == 4             # q-run seen in history
    assert "standalone novel words" in out[11]["clean_text"]
    assert out[12]["n_dropped"] == 0             # novel doc untouched
    assert out[13]["n_dropped"] == 0             # < k run invisible
    assert set(out) == {10, 11, 12, 13}


def test_span_scrub_no_false_negatives_law(spark):
    # EVERY window of a doc that is itself in the history must flag:
    # redelivering a history doc yields an empty rewrite (if long enough)
    from fastdup_spark.operators.bloom import (
        build_kgram_bloom, span_bloom_scrub)
    hist, _ = _span_corpus(spark)
    model = build_kgram_bloom(hist, k=4, fpp=0.25)  # even a sloppy fpp
    out = {r["doc_id"]: r
           for r in span_bloom_scrub(hist, model, k=4).collect()}
    for i, r in out.items():
        assert r["clean_text"] == "", i
        assert not r["kept"], i


def test_span_scrub_matches_exactsubstr_on_union(spark):
    # with a tight fpp, scrubbing incoming against history ==
    # remove_duplicated_spans over the union, restricted to incoming,
    # for runs shared ONLY across the history boundary
    from fastdup_spark.operators.bloom import (
        build_kgram_bloom, span_bloom_scrub)
    from fastdup_spark.operators.exactsubstr import remove_duplicated_spans
    hist, incoming = _span_corpus(spark)
    model = build_kgram_bloom(hist, k=4, fpp=1e-9)
    got = {r["doc_id"]: (r["clean_text"], r["n_dropped"], r["n_spans"])
           for r in span_bloom_scrub(incoming, model, k=4).collect()}
    want = {r["doc_id"]: (r["clean_text"], r["n_dropped"], r["n_spans"])
            for r in remove_duplicated_spans(
                hist.unionByName(incoming), k=4).collect()
            if r["doc_id"] >= 10}
    assert got == want


def test_kgram_bloom_autosizing_counts_windows(spark):
    from fastdup_spark.operators.bloom import bloom_params, build_kgram_bloom
    hist, _ = _span_corpus(spark)
    model = build_kgram_bloom(hist, k=4, fpp=0.01)
    # doc1: 8 tokens -> 5 windows; doc2: 8 tokens -> 5 windows
    want_bits, want_hashes = bloom_params(10, 0.01)
    assert (model.n_bits, model.n_hashes) == (want_bits, want_hashes)
    assert model.n_set > 0


def test_resolve_bloom_shape_user_bits_get_matched_hashes(spark):
    import math
    from fastdup_spark.operators.bloom import bloom_params, resolve_bloom_shape
    n_keys = 1000
    # caller pins a SMALL bitmap: k must be optimal for THAT bitmap,
    # not for the fpp-auto one (round-6 review finding)
    bits = 4096
    got_bits, got_k = resolve_bloom_shape(bits, None, n_keys, 0.01)
    assert got_bits == bits
    assert got_k == max(1, round(bits / n_keys * math.log(2)))
    auto_bits, auto_k = bloom_params(n_keys, 0.01)
    assert got_k < auto_k  # the auto k would be wrong for this bitmap
    # fully-pinned and fully-auto paths unchanged
    assert resolve_bloom_shape(None, None, n_keys, 0.01) == (auto_bits, auto_k)
    assert resolve_bloom_shape(bits, 2, n_keys, 0.01) == (bits, 2)
