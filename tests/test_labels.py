"""Label/annotation operators: J4/J5 joins, A4 label score, A5 majority vote,
A13 classification report, W5 majority-label policy."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.dedup import majority_label_policy
from fastdup_spark.operators.labels import (
    MISSING_ANNOTATION, MISSING_DOC, VALID,
    classification_report, diff_label_pairs, enrich_pairs_with_labels,
    expand_with_annotations, label_score, top_k_label,
)


def test_expand_with_annotations(spark):
    docs = spark.createDataFrame([("u1",), ("u2",)], "url string")
    annot = spark.createDataFrame([("u2", "cat"), ("u3", "dog")], "url string, label string")
    out = {r["url"]: r["status"] for r in expand_with_annotations(docs, annot).collect()}
    assert out == {"u1": MISSING_ANNOTATION, "u2": VALID, "u3": MISSING_DOC}


def test_enrich_and_diff_labels(spark):
    pairs = spark.createDataFrame([(1, 2, 0.9), (1, 3, 0.8)], "src long, dst long, jaccard double")
    labels = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, label string")
    e = enrich_pairs_with_labels(pairs, labels)
    assert {(r["src"], r["dst"], r["label"], r["label2"]) for r in e.collect()} == {
        (1, 2, "a", "a"), (1, 3, "a", "b")}
    d = diff_label_pairs(e).collect()
    assert len(d) == 1 and d[0]["dst"] == 3


def test_label_score(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.9, "a", "a"), (1, 3, 0.8, "a", "b"), (1, 4, 0.7, "a", "a")],
        "src long, dst long, jaccard double, label string, label2 string")
    s = label_score(pairs, k=2).collect()[0]
    assert s["score"] == pytest.approx(50.0)  # top-2: labels a,b -> 50%


def test_top_k_label_majority(spark):
    pairs = spark.createDataFrame(
        [(1, 2, "x"), (1, 3, "x"), (1, 4, "y"), (5, 6, "z")],
        "src long, dst long, label2 string")
    out = {r["src"]: r["predicted"] for r in top_k_label(pairs, min_count=2).collect()}
    assert out[1] == "x"
    assert out[5] == "Unknown"  # count 1 < min_count 2


def test_classification_report(spark):
    pred = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a")],
        "label string, prediction string")
    rep = {r["class"]: r for r in classification_report(pred).collect()}
    assert rep["a"]["support"] == 3 and rep["a"]["tp"] == 2
    assert rep["a"]["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert rep["a"]["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert rep["b"]["precision"] == pytest.approx(1 / 2, abs=1e-6)
    assert rep["b"]["recall"] == pytest.approx(1 / 2, abs=1e-6)


def test_majority_label_policy(spark):
    asg = spark.createDataFrame(
        [(1, 10, "x"), (2, 10, "x"), (3, 10, "y"),   # dominant x (2/3 >= half)
         (4, 20, "p"), (5, 20, "q")],                # tie p/q: max*2 >= size -> keep min label p
        "doc_id long, component_id long, label string")
    out = {r["doc_id"]: r["keep"] for r in majority_label_policy(asg).collect()}
    assert out[1] is True and out[2] is False and out[3] is False
    assert out[4] is True and out[5] is False


def test_coco_annotation_roundtrip(fd, spark, tmp_path):
    """Round-4 verdict #3 (S11): a COCO JSON dict flattens through
    images[].file_name -> url, annotations[].category_id -> label via
    categories[], bbox kept as col_x/row_y/width/height (ref
    utils.py:518-565), and drives the J5 status join + J4 pair enrich."""
    import json

    urls = [r["url"] for r in fd.docs().select("url").limit(3).collect()]
    coco = {
        "images": [
            {"id": 1, "file_name": urls[0], "width": 640, "height": 480},
            {"id": 2, "file_name": urls[1], "width": 640, "height": 480},
            {"id": 3, "file_name": "https://missing.example.com/x",
             "width": 10, "height": 10},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 7,
             "bbox": [0.0, 1.0, 20.0, 30.0]},
            {"id": 11, "image_id": 2, "category_id": 8,
             "bbox": [5.0, 5.0, 10.0, 10.0]},
            {"id": 12, "image_id": 3, "category_id": 7,
             "bbox": [0.0, 0.0, 1.0, 1.0]},
        ],
        "categories": [{"id": 7, "name": "cat"}, {"id": 8, "name": "dog"}],
    }
    fd.set_annotations(coco)
    ann = fd.annotations()
    by_status = {r["url"]: r["status"] for r in ann.collect()
                 if r["status"] != MISSING_ANNOTATION}
    assert by_status[urls[0]] == VALID and by_status[urls[1]] == VALID
    assert by_status["https://missing.example.com/x"] == MISSING_DOC
    row = {r["url"]: r for r in
           fd.store.read(spark, "annotations").collect()}
    assert row[urls[0]]["label"] == "cat"
    assert (row[urls[0]]["col_x"], row[urls[0]]["height"]) == (0.0, 30.0)
    # J4 enrich consumes the COCO labels without modification
    fd.similarity_with_labels().limit(1).collect()

    # path form: *.json routes through the same flatten
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(coco))
    fd.set_annotations(str(p))
    assert fd.store.read(spark, "annotations").count() == 3

    import pytest as _pt
    with _pt.raises(ValueError):
        fd.set_annotations({"images": []})
