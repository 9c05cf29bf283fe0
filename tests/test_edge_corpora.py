"""Degenerate-corpus hardening: all-quarantined, single-doc, empty batches —
every engine surface must return empty/singleton results, never crash."""

import pyspark.sql.functions as F
import pytest

from fastdup_spark import FastdupSpark
from fastdup_spark.plans.pipeline import near_dup_pipeline


@pytest.fixture(scope="module")
def degenerate(spark, tmp_path_factory):
    """One pipeline over 5 no-text pages (all quarantined -> 0 valid docs)."""
    pages = spark.createDataFrame(
        [(f"https://h/{i}", "2024-01-01 00:00:00", b"<html>no paras</html>",
          "en") for i in range(5)],
        "url string, warc_ts string, html binary, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    fd = FastdupSpark(spark, str(tmp_path_factory.mktemp("deg")))
    summ = fd.run(pages)
    return fd, summ


def test_all_quarantined_run(degenerate):
    fd, summ = degenerate
    assert summ["valid_docs"] == 0 and summ["quarantined"] == 5
    assert fd.docs().count() == 0
    assert fd.outliers().count() == 0
    assert fd.components().count() == 0
    assert fd.similarity().count() == 0
    assert fd.knn().count() == 0


def test_kmeans_on_empty_corpus(degenerate):
    fd, _ = degenerate
    res = fd.kmeans(k=3)
    assert res["assignments"].count() == 0
    assert res["centroids"].count() == 0
    assert res["assignments"].columns == ["doc_id", "cluster", "distance"]


def test_empty_update_batch(degenerate, spark):
    fd, _ = degenerate
    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, lang string")
    r = fd.update(empty)
    assert r["new_docs"] == 0 and r["new_pairs"] == 0


def test_single_doc_pipeline(spark):
    one = spark.createDataFrame(
        [(1, "hello world this is a single document")],
        "doc_id long, text string")
    r = near_dup_pipeline(one)
    asg = r["assignments"].collect()
    assert [(x["doc_id"], x["component_id"]) for x in asg] == [(1, 1)]
    assert r["edges"].count() == 0


def test_update_after_empty_run(degenerate, spark):
    """An all-quarantined initial run leaves zero-row stage tables (flat
    schema-file fallback); a later REAL batch must replace them with the
    partitioned layout cleanly — no mixed flat+hive layout errors."""
    fd, _ = degenerate
    pages = spark.createDataFrame(
        [("https://new/1", "2024-02-01 00:00:00",
          b"<html><p>some real paragraph text content here</p></html>", "en"),
         ("https://new/2", "2024-02-01 00:01:00",
          b"<html><p>another real paragraph text content here</p></html>", "en")],
        "url string, warc_ts string, html binary, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    r = fd.update(pages)
    assert r["new_docs"] == 2
    assert fd.docs().count() == 2
    assert fd.store.read(fd.spark, "extracted").count() == 7
    assert fd.store.read(fd.spark, "best_nn").count() == 2
    assert fd.summary()["valid_docs"] == 2
