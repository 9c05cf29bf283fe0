"""Shared fixtures: one SparkSession, one synthetic corpus, one pipeline run
reused across the suite (mirrors the reference's CI pattern of a single
fd.run() + many result checks, .github/workflows/examples-ci.yml)."""

from __future__ import annotations

import shutil

import pytest

from fastdup_spark import FastdupSpark, PipelineConfig, get_spark
from fastdup_spark.fixtures.pages import generate_pages, pages_to_spark

N_DOCS = 1000
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fastdup-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def data():
    return generate_pages(N_DOCS, SEED)


@pytest.fixture(scope="session")
def spark_data(spark, data):
    pages, tp, tc = pages_to_spark(spark, data)
    return pages.cache(), tp.cache(), tc.cache()


@pytest.fixture(scope="session")
def fd(spark, spark_data, tmp_path_factory):
    """A completed pipeline run over the 1k corpus."""
    work = str(tmp_path_factory.mktemp("fdwork"))
    shutil.rmtree(work, ignore_errors=True)
    eng = FastdupSpark(spark, work, PipelineConfig())
    eng.run(spark_data[0])
    return eng


@pytest.fixture(scope="session")
def url_of(fd):
    """doc_id -> url and url -> doc_id maps from the docs stage."""
    rows = fd.docs().select("doc_id", "url").collect()
    id2url = {r["doc_id"]: r["url"] for r in rows}
    url2id = {r["url"]: r["doc_id"] for r in rows}
    return id2url, url2id
