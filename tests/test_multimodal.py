"""Multimodal BINARY-column plumbing: decode-meta quarantine, deterministic
fake features, frame sampling — schema/partitioning/batch shape are real,
the codec is stubbed (no image libs in this environment)."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.functions.multimodal import (
    decode_image_meta, extract_image_features, sample_frames,
)
from fastdup_spark.operators.crossset import embedding_near_dup, restrict_cross_set


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(8)) * (i % 4 + 2) + bytes([i % 251])) for i in range(50)]
    rows.append((50, b"bad"))   # truncated -> quarantine
    rows.append((51, None))     # null -> quarantine
    return spark.createDataFrame(rows, "media_id long, content binary").cache()


def test_decode_meta_and_quarantine(spark, media):
    meta = decode_image_meta(media).cache()
    ok = meta.filter("error_code IS NULL")
    bad = meta.filter("error_code IS NOT NULL")
    assert ok.count() == 50
    assert bad.count() == 2
    r = ok.first()
    assert r["width"] >= 64 and r["height"] >= 64 and r["format"] in ("jpeg", "png", "webp")


def test_decode_meta_deterministic_across_partitions(spark, media):
    a = sorted(decode_image_meta(media.repartition(1)).collect())
    b = sorted(decode_image_meta(media.repartition(7)).collect())
    assert a == b


def test_real_decoder_is_stubbed(spark, media):
    meta = decode_image_meta(media, deterministic_fake=False)
    rows = meta.collect()
    assert all(r["error_code"] == "NotImplementedError" for r in rows)


def test_feature_extraction_deterministic(spark, media):
    f1 = {r["media_id"]: r["embedding"] for r in extract_image_features(media, dim=16).collect()}
    f2 = {r["media_id"]: r["embedding"] for r in extract_image_features(media.repartition(5), dim=16).collect()}
    assert f1 == f2
    good = [v for v in f1.values() if v is not None]
    assert len(good) == 50 and len(good[0]) == 16


def test_frame_sampling_explodes(spark, media):
    frames = sample_frames(media, every_n_bytes=8, max_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per)


def test_embedding_near_dup_finds_planted(spark):
    import numpy as np
    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal((20, 16)).astype(float)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        if i < 5:  # planted near-identical copy
            rows.append((100 + i, (v + rng.standard_normal(16) * 0.001).tolist()))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = embedding_near_dup(e, threshold=0.99)
    asg = {r["doc_id"]: r["component_id"] for r in res["assignments"].collect()}
    for i in range(5):
        assert asg[i] == asg[100 + i], f"planted embedding pair {i} not clustered"


def test_restrict_cross_set(spark):
    pairs = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    tags = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "test")], "doc_id long, split string")
    out = {(r["src"], r["dst"]) for r in restrict_cross_set(pairs, tags).collect()}
    assert out == {(1, 3), (2, 3)}
