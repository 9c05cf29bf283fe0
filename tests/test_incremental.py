"""Incremental batch ingest (streaming analog): new pages merge into an
existing run; duplicates across the old/new boundary are found; replays are
idempotent; final state equals a from-scratch run over the union."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark import FastdupSpark
from fastdup_spark.fixtures.pages import generate_pages, pages_to_spark
from fastdup_spark.streaming.incremental import high_water_mark


@pytest.fixture(scope="module")
def split_corpus(spark):
    data = generate_pages(600, seed=11)
    pages, _, _ = pages_to_spark(spark, data)
    pages = pages.cache()
    cutoff = pages.selectExpr("percentile(cast(warc_ts as double), 0.7) p").first()["p"]
    old = pages.filter(F.col("warc_ts").cast("double") <= cutoff)
    new = pages.filter(F.col("warc_ts").cast("double") > cutoff)
    return pages, old.cache(), new.cache()


def test_incremental_matches_full_run(spark, split_corpus, tmp_path):
    pages, old, new = split_corpus
    # run A: old batch then incremental update with new batch
    fd_inc = FastdupSpark(spark, str(tmp_path / "inc"))
    fd_inc.run(old)
    stats = fd_inc.update(new)
    assert stats["new_docs"] > 0
    # run B: everything at once
    fd_full = FastdupSpark(spark, str(tmp_path / "full"))
    fd_full.run(pages)

    a = {(r["doc_id"], r["component_id"]) for r in
         fd_inc.store.read(spark, "assignments").collect()}
    b = {(r["doc_id"], r["component_id"]) for r in
         fd_full.store.read(spark, "assignments").collect()}
    assert a == b, "incremental result must equal the from-scratch run"

    sa = {(r["src"], r["dst"]) for r in fd_inc.store.read(spark, "similarity").collect()}
    sb = {(r["src"], r["dst"]) for r in fd_full.store.read(spark, "similarity").collect()}
    assert sa == sb


def test_replay_is_idempotent(spark, split_corpus, tmp_path):
    pages, old, new = split_corpus
    fd = FastdupSpark(spark, str(tmp_path / "replay"))
    fd.run(old)
    fd.update(new)
    n_docs = fd.docs().count()
    n_pairs = fd.store.read(spark, "pairs_scored").count()
    stats2 = fd.update(new)  # same batch again
    assert stats2["new_docs"] == 0
    assert fd.docs().count() == n_docs
    assert fd.store.read(spark, "pairs_scored").count() == n_pairs


def test_high_water_mark_advances(spark, split_corpus, tmp_path):
    pages, old, new = split_corpus
    fd = FastdupSpark(spark, str(tmp_path / "hwm"))
    fd.run(old)
    h1 = high_water_mark(fd.docs())
    fd.update(new)
    h2 = high_water_mark(fd.docs())
    assert h2 > h1
