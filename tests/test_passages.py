"""Passage removal (operators/passages.py): cross-doc repeated 20-word
chunks dropped from every doc, order + sub-chunk tail preserved."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.passages import (
    passage_chunks, remove_repeated_passages,
)


def words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


BOILER = words("b", 20)  # exactly one chunk, planted in several docs


@pytest.fixture()
def docs(spark):
    rows = [
        # boiler + 20 unique + 5-word tail
        (1, BOILER + " " + words("x", 20) + " " + words("t", 5)),
        # boiler + 20 unique (no tail)
        (2, BOILER + " " + words("y", 20)),
        # within-doc repeat of its own chunk, unique to this doc -> kept
        (3, words("z", 20) + " " + words("z", 20)),
        # short doc (< 20 words) -> untouched (normalized)
        (4, "short  doc   with    odd spacing"),
        # doc that is ONLY boilerplate -> everything dropped
        (5, BOILER),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunking(spark, docs):
    ch = passage_chunks(docs).collect()
    per_doc = {}
    for r in ch:
        per_doc.setdefault(r["doc_id"], []).append((r["idx"], r["passage"]))
    assert len(per_doc[1]) == 2 and per_doc[1][0] == (1, BOILER)
    assert len(per_doc[3]) == 2
    assert 4 not in per_doc  # short docs contribute no chunks
    assert per_doc[5] == [(1, BOILER)]


def test_remove_repeated(spark, docs):
    out = {r["doc_id"]: r for r in remove_repeated_passages(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # one row per input doc
    # boiler dropped everywhere it repeats; order + tail preserved
    assert out[1]["clean_text"] == words("x", 20) + " " + words("t", 5)
    assert out[2]["clean_text"] == words("y", 20)
    assert (out[1]["n_chunks"], out[1]["n_dropped"]) == (2, 1)
    # within-doc repetition of a chunk unique to ONE doc is kept
    assert out[3]["clean_text"] == words("z", 20) + " " + words("z", 20)
    assert out[3]["n_dropped"] == 0
    # short docs pass through whitespace-normalized
    assert out[4]["clean_text"] == "short doc with odd spacing"
    assert (out[4]["n_chunks"], out[4]["n_dropped"]) == (0, 0)
    # all-boilerplate doc empties out
    assert out[5]["clean_text"] == ""
    assert (out[5]["n_chunks"], out[5]["n_dropped"]) == (1, 1)


def test_plan_is_jvm_only(spark, docs):
    plan = remove_repeated_passages(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_min_docs_threshold(spark, docs):
    """min_docs=4: BOILER appears in only 3 docs -> nothing is removed."""
    out = remove_repeated_passages(docs, min_docs=4)
    assert out.agg(F.sum("n_dropped")).collect()[0][0] == 0
