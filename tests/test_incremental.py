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

    # round-2 verdict item #7: the tail re-derived only the touched
    # neighborhood (batch endpoints + new docs), not the whole corpus...
    assert 0 < stats["touched_docs"] < fd_inc.docs().count()
    # ...and the scoped update is EXACT: knn / best_nn / outliers all equal
    # the from-scratch run's tables
    for stage, cols in (("knn", ("doc_id", "nn", "rank")),
                        ("best_nn", ("doc_id", "best_sim", "best_nn")),
                        ("outliers", ("doc_id", "best_sim", "best_nn"))):
        ta = {tuple(r[c] for c in cols)
              for r in fd_inc.store.read(spark, stage).collect()}
        tb = {tuple(r[c] for c in cols)
              for r in fd_full.store.read(spark, stage).collect()}
        assert ta == tb, f"scoped incremental {stage} diverged from full run"


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


def test_crash_after_extracted_append_heals_on_replay(spark, split_corpus, tmp_path):
    """Crash AFTER the extracted append but BEFORE the bookkeeping tail:
    the replay of the (now fully-redelivered) batch must detect the stale
    extracted marker from footers and heal counts/markers/derived tables."""
    import fastdup_spark.streaming.incremental as inc

    pages, old, new = split_corpus
    fd = FastdupSpark(spark, str(tmp_path / "heal"))
    fd.run(old)

    real_finalize = inc._finalize_bookkeeping
    def boom(*a, **k):
        raise RuntimeError("simulated crash before bookkeeping")
    inc._finalize_bookkeeping = boom
    try:
        with pytest.raises(RuntimeError):
            fd.update(new)
    finally:
        inc._finalize_bookkeeping = real_finalize

    # marker is stale now: extracted grew but marker was not refreshed
    lineage = fd.store._parquet_lineage(fd.store.table_path("extracted"))
    assert sum(x["rows"] for x in lineage) != fd.store.read_marker("extracted")["rows"]

    stats = fd.update(new)          # same batch redelivered -> heal path
    assert stats["new_docs"] == 0
    marker = fd.store.read_marker("extracted")
    assert marker["rows"] == sum(x["rows"] for x in
                                 fd.store._parquet_lineage(fd.store.table_path("extracted")))
    counts = fd.store.read_json("extract_counts")
    assert counts["valid"] == fd.docs().count()
    # derived tables healed too: summary reflects the full corpus
    assert fd.summary()["total_pages"] == counts["valid"] + counts["bad"]
