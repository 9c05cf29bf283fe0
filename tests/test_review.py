"""Human-review round-trip (plans/review.py) — the text analog of the
reference's CVAT export/import loop (/root/reference/fastdup/cvat.py).

e2e: pipeline -> export review tasks (Label-Studio task JSON) -> simulate a
human completing them (both the LS completed-export shape and the flat
verdict JSONL) -> apply -> reviewed_components reflects the verdicts:
a rejected bridge edge splits its component, a confirmed below-threshold
pair merges one."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fastdup_spark import FastdupSpark
from fastdup_spark.fixtures.pages import generate_pages, pages_to_spark


@pytest.fixture(scope="module")
def fd(spark, tmp_path_factory):
    data = generate_pages(300, seed=7)
    pages, _, _ = pages_to_spark(spark, data)
    fd = FastdupSpark(spark, str(tmp_path_factory.mktemp("review_work")))
    fd.run(pages)
    return fd


def test_export_review_tasks_shape(fd, tmp_path):
    out = str(tmp_path / "tasks")
    n = fd.export_review_tasks(out, lo=0.0, limit=50)
    assert 0 < n <= 50
    rows = []
    for f in os.listdir(out):
        if f.endswith(".json"):
            with open(os.path.join(out, f)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    assert len(rows) == n
    for r in rows:
        d = r["data"]
        # doc_ids ride as strings (JSON consumers corrupt int64)
        assert isinstance(d["src"], str) and int(d["src"]) != 0
        assert r["id"] == f"{d['src']}:{d['dst']}"
        assert d["text_a"] and d["text_b"] and d["url_a"] != d["url_b"]
        assert 0.0 <= d["jaccard"] <= 1.0
        assert d["predicted"] in ("duplicate", "review")
    # strongest-first head: every exported pair >= the band floor
    assert all(r["data"]["jaccard"] >= 0.0 for r in rows)


def test_round_trip_reject_splits_and_confirm_merges(fd, spark, tmp_path):
    cfg = fd.config
    pairs = fd.store.read(spark, "pairs_scored")

    # a 2-doc component held together by exactly one strong edge
    comp2 = fd.components().filter(F.col("count") == 2)
    strong = pairs.filter(F.col("jaccard") >= cfg.cc_threshold)
    edge_counts = (
        comp2.select("doc_id", "component_id")
        .join(strong.select(F.col("src").alias("doc_id"), "dst"), "doc_id")
        .groupBy("component_id").agg(
            F.count("*").alias("n_edges"),
            F.first("doc_id").alias("src"), F.first("dst").alias("dst"))
    )
    bridge = edge_counts.filter(F.col("n_edges") == 1).first()
    assert bridge is not None, "fixture must plant a 2-doc near-dup cluster"

    # two singleton docs with NO automatic edge between them
    in_comp = fd.components().select("doc_id")
    singles = [r["doc_id"] for r in
               fd.docs().select("doc_id").join(in_comp, "doc_id", "left_anti")
               .orderBy("doc_id").limit(2).collect()]
    assert len(singles) == 2

    # --- simulate the completed review in BOTH accepted shapes ---
    ls_path = str(tmp_path / "completed_ls")
    os.makedirs(ls_path)
    ls_task = {
        "id": f"{bridge['src']}:{bridge['dst']}",
        "data": {"src": str(bridge["src"]), "dst": str(bridge["dst"])},
        "annotations": [
            {"result": [{"value": {"choices": ["duplicate"]}}]},
            # the LAST annotation wins (a second reviewer overrode the first)
            {"result": [{"value": {"choices": ["not_duplicate"]}}]},
        ],
    }
    with open(os.path.join(ls_path, "tasks.json"), "w") as f:
        f.write(json.dumps(ls_task) + "\n")

    flat_path = str(tmp_path / "completed_flat")
    os.makedirs(flat_path)
    with open(os.path.join(flat_path, "verdicts.json"), "w") as f:
        f.write(json.dumps({"src": singles[0], "dst": singles[1],
                            "verdict": "duplicate"}) + "\n")

    assert fd.apply_review(ls_path) == 1
    assert fd.apply_review(flat_path) == 2  # merged, newest-wins per pair

    rc = fd.reviewed_components()
    # the rejected bridge edge split its 2-doc component
    still = rc.filter(F.col("doc_id").isin([bridge["src"], bridge["dst"]]))
    assert still.count() == 0
    # the confirmed sub-threshold pair now forms a component
    merged = {r["component_id"] for r in
              rc.filter(F.col("doc_id").isin(singles)).collect()}
    assert len(merged) == 1
    # un-reviewed components are untouched
    base_other = fd.components().filter(
        ~F.col("doc_id").isin([bridge["src"], bridge["dst"]]))
    assert rc.filter(~F.col("doc_id").isin(singles)).count() \
        == base_other.count()


def test_re_review_newest_wins(fd, spark, tmp_path):
    from fastdup_spark.plans.review import read_review_results
    p = str(tmp_path / "again")
    os.makedirs(p)
    pair = fd.store.read(spark, "pairs_scored").select("src", "dst").first()
    with open(os.path.join(p, "v.json"), "w") as f:
        f.write(json.dumps({"src": pair["src"], "dst": pair["dst"],
                            "verdict": "duplicate"}) + "\n")
    before = fd.apply_review(p)
    # flip the same pair — count must NOT grow, verdict must flip
    with open(os.path.join(p, "v.json"), "w") as f:
        f.write(json.dumps({"src": pair["src"], "dst": pair["dst"],
                            "verdict": "not_duplicate"}) + "\n")
    after = fd.apply_review(p)
    assert after == before
    ov = fd.store.read(spark, "review_overrides")
    row = ov.filter((F.col("src") == min(pair["src"], pair["dst"]))
                    & (F.col("dst") == max(pair["src"], pair["dst"]))).first()
    assert row["verdict"] == "not_duplicate"

    # malformed verdicts are rejected loudly
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "v.json"), "w") as f:
        f.write(json.dumps({"src": 1, "dst": 2, "verdict": "maybe"}) + "\n")
    with pytest.raises(ValueError, match="verdict"):
        read_review_results(spark, bad)
