"""Structured Streaming ingest (§2.8): readStream + foreachBatch over the
incremental updater must land in the same final state as batch update()."""

import os

import pytest
from pyspark.sql import functions as F

from fastdup_spark import FastdupSpark
from fastdup_spark.fixtures.pages import generate_pages, pages_to_spark
from fastdup_spark.streaming.stream import stream_pages


def test_stream_matches_batch(spark, tmp_path):
    data = generate_pages(400, seed=31)
    pages, _, _ = pages_to_spark(spark, data)
    pages = pages.cache()
    cut = pages.selectExpr("percentile(cast(warc_ts as double), 0.6) p").first()["p"]
    old = pages.filter(F.col("warc_ts").cast("double") <= cut)
    new = pages.filter(F.col("warc_ts").cast("double") > cut)

    # landing dir with the "streamed" batch
    landing = str(tmp_path / "landing")
    new.write.mode("overwrite").parquet(landing)
    # drop spark's _SUCCESS etc is fine for the file source

    fd_s = FastdupSpark(spark, str(tmp_path / "stream"))
    fd_s.run(old)
    q = stream_pages(fd_s, landing, trigger_available_now=True)
    q.awaitTermination(300)
    assert not q.isActive

    fd_b = FastdupSpark(spark, str(tmp_path / "batch"))
    fd_b.run(old)
    fd_b.update(new)

    a = {(r["doc_id"], r["component_id"]) for r in
         fd_s.store.read(spark, "assignments").collect()}
    b = {(r["doc_id"], r["component_id"]) for r in
         fd_b.store.read(spark, "assignments").collect()}
    assert a == b
    sa = fd_s.store.read(spark, "similarity").count()
    sb = fd_b.store.read(spark, "similarity").count()
    assert sa == sb
    # checkpoint dir exists (restart-safe stream)
    assert os.path.isdir(os.path.join(str(tmp_path / "stream"), "_stream_checkpoint"))
