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


def test_pluggable_decoder_and_features_e2e(spark, media, tmp_path):
    """Round-4 verdict #4: a user-supplied batch codec fn plugs into the
    decode/feature boundary exactly like fd.enrich(model_fn=...) — custom
    decoder -> custom features -> embedding index -> vector_search, with
    the stub path unchanged."""
    import numpy as np

    from fastdup_spark import FastdupSpark

    def my_decoder(raw: bytes):
        if len(raw) < 4:
            raise ValueError("too short for my codec")
        return (len(raw), 2 * len(raw), "custom")

    meta = decode_image_meta(media, decoder=my_decoder)
    ok = {r["media_id"]: r for r in meta.collect() if r["error_code"] is None}
    some_id = next(iter(ok))
    assert ok[some_id]["format"] == "custom"
    assert ok[some_id]["height"] == 2 * ok[some_id]["width"]
    bad = meta.filter("error_code = 'ValueError'").count()
    assert bad == 2  # b"bad" (len 3) and NULL

    def my_features(raw: bytes):
        if len(raw) < 4:
            raise ValueError("too short")
        v = np.frombuffer((raw * 8)[:32], dtype=np.uint8).astype(np.float32)
        return v / (np.linalg.norm(v) + 1e-9)

    feats = extract_image_features(media, feature_fn=my_features)
    good = feats.filter("error_code IS NULL")
    assert good.count() == 50 and len(good.first()["embedding"]) == 32
    # determinism across partitionings (worker-independent codec contract)
    a = sorted((r["media_id"], tuple(r["embedding"])) for r in good.collect())
    b = sorted((r["media_id"], tuple(r["embedding"])) for r in
               extract_image_features(media.repartition(7),
                                      feature_fn=my_features)
               .filter("error_code IS NULL").collect())
    assert a == b

    # downstream: index + search over the custom embeddings
    fd = FastdupSpark(spark, str(tmp_path / "media_idx"))
    fd.build_embedding_index(
        good.select(F.col("media_id").alias("vec_id"), "embedding"),
        n_planes=6, n_bands=4)
    q = [r["embedding"] for r in good.limit(1).collect()][0]
    hits = fd.vector_search(q, k=3).collect()
    assert len(hits) == 3 and hits[0]["cosine"] >= hits[-1]["cosine"]

    # stub path unchanged
    stub = decode_image_meta(media, deterministic_fake=False)
    assert all(r["error_code"] == "NotImplementedError"
               for r in stub.collect())


def test_resize_contract_and_quarantine(spark, media):
    from fastdup_spark.functions.multimodal import resize_images

    out = resize_images(media, max_width=128).cache()
    ok = out.filter("error_code IS NULL")
    bad = out.filter("error_code IS NOT NULL")
    assert ok.count() == 50 and bad.count() == 2
    assert ok.filter("width > 128").count() == 0
    # aspect preserved: resized h = ceil(h * 128 / w) of the decoded dims
    import math

    from fastdup_spark.functions.multimodal import _decode_image_fake

    raw0 = bytes(range(8)) * 2 + bytes([0])  # media_id 0's fixture bytes
    w, h, _fmt = _decode_image_fake(raw0)
    r0 = ok.filter("media_id = 0").first()
    if w > 128:
        assert r0["width"] == 128 and r0["height"] == math.ceil(h * 128 / w)
    else:
        assert (r0["width"], r0["height"]) == (w, h)
    # resized payload is never larger than the original
    orig = {r["media_id"]: len(bytes(r["content"]))
            for r in media.filter("content is not null").collect()}
    for r in ok.collect():
        assert len(bytes(r["content"])) <= max(8, orig[r["media_id"]])


def test_resize_pluggable_and_exception_quarantine(spark, media):
    from fastdup_spark.functions.multimodal import resize_images

    def resizer(raw, mw):
        if len(raw) % 2 == 1:
            raise OSError("corrupt")  # real codecs raise OSError subclasses
        return mw, mw, raw[:4]

    out = resize_images(media, max_width=32, resizer=resizer).cache()
    assert out.filter("error_code = 'OSError'").count() > 0
    okr = out.filter("error_code IS NULL").first()
    assert okr["width"] == 32 and okr["height"] == 32
    assert len(bytes(okr["content"])) <= 4
