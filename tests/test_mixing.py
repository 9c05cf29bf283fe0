"""Temperature / UniMax corpus mixing (operators/mixing.py).

Gold strategy: the allocations are pure integer Python — properties are
asserted exactly; the Spark application is replayed row-for-row with
hashlib md5 against the same ppm thresholds."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.mixing import (
    apply_mix,
    group_sizes,
    mix_corpus,
    rates_ppm,
    temperature_allocation,
    threshold_hex,
    unimax_allocation,
)

SIZES = {"en": 8000, "fr": 900, "sw": 90, "yo": 10}


def test_temperature_alpha1_is_proportional():
    alloc = temperature_allocation(SIZES, total=900, alpha=1.0)
    assert sum(alloc.values()) == 900
    assert alloc == {"en": 800, "fr": 90, "sw": 9, "yo": 1}


def test_temperature_alpha0_is_uniform_with_capping():
    # uniform 225 each, but sw/yo saturate and return leftover
    alloc = temperature_allocation(SIZES, total=900, alpha=0.0)
    assert sum(alloc.values()) == 900
    assert alloc["sw"] == 90 and alloc["yo"] == 10
    assert alloc["en"] == alloc["fr"] == 400


def test_temperature_smooths_between():
    a1 = temperature_allocation(SIZES, 900, alpha=1.0)
    a5 = temperature_allocation(SIZES, 900, alpha=0.5)
    # low-resource groups gain, the head shrinks
    assert a5["yo"] > a1["yo"] and a5["sw"] > a1["sw"]
    assert a5["en"] < a1["en"]
    assert sum(a5.values()) == 900


def test_allocation_caps_and_overbudget():
    alloc = temperature_allocation(SIZES, total=10**9, alpha=0.7)
    assert alloc == SIZES  # budget beyond the corpus: everything kept
    assert temperature_allocation(SIZES, 0) == {g: 0 for g in SIZES}


def test_unimax_waterfill():
    # budget 6000 uniform over 4 groups = 1500 each; sw+yo saturate at
    # 100 combined, fr at 900 -> leftover floods into en
    alloc = unimax_allocation(SIZES, total=6000)
    assert sum(alloc.values()) == 6000
    assert alloc["sw"] == 90 and alloc["yo"] == 10 and alloc["fr"] == 900
    assert alloc["en"] == 5000


def test_unimax_epoch_cap():
    alloc = unimax_allocation(SIZES, total=10**9, max_epochs=0.5)
    assert alloc == {"en": 4000, "fr": 450, "sw": 45, "yo": 5}


def test_validation_errors():
    with pytest.raises(ValueError):
        temperature_allocation({}, 10)
    with pytest.raises(ValueError):
        temperature_allocation({"en": 0}, 10)
    with pytest.raises(ValueError):
        temperature_allocation(SIZES, -1)
    with pytest.raises(ValueError):
        unimax_allocation(SIZES, 10, max_epochs=0)
    with pytest.raises(ValueError):
        threshold_hex(1_000_001)


def test_threshold_hex_golds():
    assert threshold_hex(0) == "00000000"
    assert threshold_hex(500_000) == "80000000"  # exactly half of 2^32
    assert threshold_hex(1_000_000) == "g"       # keep-everything sentinel
    assert threshold_hex(250_000) == "40000000"


def test_rates_ppm_full_group_is_sentinel():
    r = rates_ppm({"en": 8000, "yo": 10}, SIZES)
    assert r["en"] == 1_000_000 and r["yo"] == 1_000_000
    assert rates_ppm({"en": 4000}, SIZES)["en"] == 500_000


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en"] * 8 + ["fr", "sw"]) for i in range(1000)]
    return spark.createDataFrame(
        [(i, langs[i % 10]) for i, langs in rows],
        "doc_id long, lang string")


def test_apply_mix_matches_hashlib_replay(spark, docs):
    ppm = {"en": 125_000, "fr": 1_000_000, "sw": 0}
    out = apply_mix(docs, ppm, "lang").collect()
    thr = {g: threshold_hex(p) for g, p in ppm.items()}
    want = {
        (r["doc_id"], r["lang"]) for r in docs.collect()
        if hashlib.md5(f"mix:{r['doc_id']}".encode()).hexdigest()[:8]
        < thr[r["lang"]]
    }
    assert {(r["doc_id"], r["lang"]) for r in out} == want
    assert all(r["rate_ppm"] == ppm[r["lang"]] for r in out)
    # sw had rate 0, fr kept whole
    langs = {r["lang"] for r in out}
    assert "sw" not in langs
    assert sum(1 for r in out if r["lang"] == "fr") == 100


def test_apply_mix_plan_is_broadcast_no_corpus_shuffle(spark, docs):
    plan = apply_mix(docs, {"en": 500_000}, "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffleExchange" not in plan


def test_group_sizes_and_null_guard(spark, docs):
    assert group_sizes(docs, "lang") == {"en": 800, "fr": 100, "sw": 100}
    with_null = docs.withColumn(
        "lang", F.when(F.col("doc_id") == 0, None)
                 .otherwise(F.col("lang")))
    with pytest.raises(ValueError, match="NULL"):
        group_sizes(with_null, "lang")


def test_mix_corpus_e2e(spark, docs):
    out = mix_corpus(docs, "lang", total=400, scheme="unimax")
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # uniform 133/134 each, under caps; rate sampling is approximate
    # (binomial around quota) but deterministic
    assert set(by_lang) == {"en", "fr", "sw"}
    for g, n in by_lang.items():
        assert 90 <= n <= 180, (g, n)
    with pytest.raises(ValueError, match="scheme"):
        mix_corpus(docs, "lang", 10, scheme="nope")
