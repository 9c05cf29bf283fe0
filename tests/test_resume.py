"""Checkpoint/resume protocol: completed stages are skipped on rerun, config
changes invalidate markers, interrupted runs resume from the last marker
(north_rule resumability; ref run_mode=2 / resume, RUN.md:171-186)."""

import os
import shutil

import pytest

from fastdup_spark import FastdupSpark, PipelineConfig
from fastdup_spark.fixtures.pages import generate_pages, pages_to_spark
from fastdup_spark.plans.pipeline import STAGES


@pytest.fixture(scope="module")
def small_pages(spark):
    data = generate_pages(300, 7)
    pages, _, _ = pages_to_spark(spark, data)
    return pages.cache()


def _mtimes(work):
    return {s: os.path.getmtime(os.path.join(work, f"{s}.marker.json"))
            for s in STAGES if os.path.exists(os.path.join(work, f"{s}.marker.json"))}


def test_rerun_skips_all_stages(spark, small_pages, tmp_path):
    work = str(tmp_path / "w1")
    fd = FastdupSpark(spark, work)
    s1 = fd.run(small_pages)
    t1 = _mtimes(work)
    assert set(t1) == set(STAGES)
    s2 = fd.run(small_pages)
    t2 = _mtimes(work)
    assert t1 == t2, "resume must not rewrite completed stages"
    assert s1 == s2


def test_partial_restart_resumes_midway(spark, small_pages, tmp_path):
    """Simulate a crash after the signatures stage: later markers removed ->
    rerun recomputes only the missing stages."""
    work = str(tmp_path / "w2")
    fd = FastdupSpark(spark, work)
    out1 = fd.run(small_pages)
    before = _mtimes(work)
    for s in ("candidates", "pairs_scored", "similarity", "containment",
              "assignments", "component_info", "outliers"):
        os.remove(os.path.join(work, f"{s}.marker.json"))
        shutil.rmtree(os.path.join(work, s), ignore_errors=True)
    out2 = fd.run(small_pages)
    after = _mtimes(work)
    for s in ("extracted", "doc_stats", "signatures", "buckets"):
        assert before[s] == after[s], f"completed stage {s} recomputed"
    for s in ("candidates", "assignments"):
        assert after[s] > before[s]
    assert out1 == out2, "resumed run must produce identical results"


def test_config_change_invalidates(spark, small_pages, tmp_path):
    work = str(tmp_path / "w3")
    fd = FastdupSpark(spark, work, PipelineConfig())
    fd.run(small_pages)
    t1 = _mtimes(work)
    fd2 = FastdupSpark(spark, work, PipelineConfig(threshold=0.9))
    fd2.run(small_pages)
    t2 = _mtimes(work)
    assert t2["similarity"] > t1["similarity"]


def test_force_recomputes(spark, small_pages, tmp_path):
    work = str(tmp_path / "w4")
    fd = FastdupSpark(spark, work)
    fd.run(small_pages)
    t1 = _mtimes(work)
    fd.run(small_pages, force=True)
    t2 = _mtimes(work)
    assert all(t2[s] > t1[s] for s in STAGES)


def test_kmeans_stage_resume(spark, small_pages, tmp_path):
    """fd.kmeans() persists kmeans_assignments/kmeans_centroids as
    resume-skippable stage tables (reference kmeans sinks,
    definitions.py:17,19): same params skip, changed params or force
    recompute (round-2 verdict item #4)."""
    work = str(tmp_path / "w6")
    fd = FastdupSpark(spark, work)
    fd.run(small_pages)
    res = fd.kmeans(k=4, n_iter=2)
    n = res["assignments"].count()
    assert n == fd.docs().count()
    assert res["centroids"].count() <= 4
    assert {"doc_id", "cluster", "distance"} <= set(res["assignments"].columns)

    def mt(stage):
        return os.path.getmtime(os.path.join(work, f"{stage}.marker.json"))

    t1 = (mt("kmeans_assignments"), mt("kmeans_centroids"))
    fd.kmeans(k=4, n_iter=2)
    assert (mt("kmeans_assignments"), mt("kmeans_centroids")) == t1, \
        "same-param rerun must skip"
    fd.kmeans(k=5, n_iter=2)
    t3 = (mt("kmeans_assignments"), mt("kmeans_centroids"))
    assert t3 > t1, "changed k must recompute"
    fd.kmeans(k=5, n_iter=2, force=True)
    assert (mt("kmeans_assignments"), mt("kmeans_centroids")) > t3


def test_marker_lineage_counts(spark, small_pages, tmp_path):
    work = str(tmp_path / "w5")
    fd = FastdupSpark(spark, work)
    fd.run(small_pages)
    m = fd.store.read_marker("extracted")
    assert m["rows"] == sum(f["rows"] for f in m["files"])
    assert m["rows"] == fd.docs().count() + fd.quarantine().count()
    assert m["config_hash"] == fd.config.config_hash()
