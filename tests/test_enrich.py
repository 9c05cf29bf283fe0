"""fd.enrich(): pluggable batch-model stage (reference captions/embeddings
analog) — deterministic default embedder, custom models, resume-skip, and
the enrich -> build_embedding_index -> vector_search e2e path."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastdup_spark import FastdupSpark
from fastdup_spark.fixtures.pages import generate_pages, pages_to_spark


@pytest.fixture(scope="module")
def fd_small(spark, tmp_path_factory):
    data = generate_pages(150, seed=33)
    pages, _, _ = pages_to_spark(spark, data)
    fd = FastdupSpark(spark, str(tmp_path_factory.mktemp("enrich") / "wd"))
    fd.run(pages)
    return fd


def test_default_hashing_embedder(fd_small, spark):
    emb = fd_small.enrich()
    n_docs = fd_small.docs().count()
    assert emb.count() == n_docs
    row = emb.first()
    v = np.asarray(row["embedding"], dtype=float)
    assert len(v) == 64
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5  # unit vectors
    m = fd_small.store.read_marker("enrichment")
    assert m["counters"]["model"] == "hashing_embedder_64"


def test_enrich_resume_skips_and_force_recomputes(fd_small):
    p = fd_small.store.marker_path("enrichment")
    fd_small.enrich()
    t0 = os.path.getmtime(p)
    fd_small.enrich()           # same model: marker untouched (skip)
    assert os.path.getmtime(p) == t0
    fd_small.enrich(force=True)  # force: stage rewritten
    assert os.path.getmtime(p) > t0


def test_enrich_deterministic_across_runs(spark, fd_small, tmp_path):
    """Same corpus, fresh work dir: bit-identical embeddings (fixed-key
    siphash — no process-seed dependence)."""
    data = generate_pages(150, seed=33)
    pages, _, _ = pages_to_spark(spark, data)
    fd2 = FastdupSpark(spark, str(tmp_path / "wd2"))
    fd2.run(pages)
    a = {r["doc_id"]: tuple(r["embedding"]) for r in fd_small.enrich().collect()}
    b = {r["doc_id"]: tuple(r["embedding"]) for r in fd2.enrich().collect()}
    assert a == b


def test_custom_model_fn(fd_small):
    import pandas as pd

    def char_stats_model(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_chars": pdf["text"].fillna("").str.len().astype("int64"),
        })

    out = fd_small.enrich(char_stats_model,
                          output_schema="doc_id bigint, n_chars bigint",
                          force=True)
    got = {r["doc_id"]: r["n_chars"] for r in out.collect()}
    truth = {r["doc_id"]: len(r["text"] or "")
             for r in fd_small.docs().collect()}
    assert got == truth
    m = fd_small.store.read_marker("enrichment")
    assert m["counters"]["model"] == "char_stats_model"
    # switching models recomputes even without force (different counters)
    emb = fd_small.enrich()
    assert "embedding" in emb.columns


def test_enrich_to_vector_search_e2e(fd_small):
    """The verdict item's done-criterion: enrichment embeddings feed the
    ANN index directly; a doc's own embedding retrieves that doc at
    rank 1 (exact-dup docs tie at cosine 1.0 — accept any of them)."""
    emb = fd_small.enrich()
    fd_small.build_embedding_index(emb, n_planes=None, n_bands=4,
                                   id_col="doc_id", vec_col="embedding")
    # probe with a UNIQUE-text doc (exact dups share the embedding and
    # would tie at cosine 1.0)
    uniq_id = (fd_small.docs().groupBy("text")
               .agg(F.count("*").alias("c"), F.min("doc_id").alias("doc_id"))
               .filter("c = 1").orderBy("doc_id").first()["doc_id"])
    probe = emb.filter(F.col("doc_id") == uniq_id).first()
    top = fd_small.vector_search(list(probe["embedding"]), k=3).collect()
    assert top, "no neighbors retrieved"
    assert top[0]["doc_id"] == uniq_id
    assert abs(top[0]["cosine"] - 1.0) < 1e-5


def test_enrich_requires_schema_for_custom_fn(fd_small):
    with pytest.raises(ValueError, match="output_schema"):
        fd_small.enrich(lambda pdf: pdf)
