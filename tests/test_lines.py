"""Line-level dedup (operators/lines.py): cross-doc duplicated lines
dropped from every doc, gutted docs killed (RefinedWeb/FineWeb rule)."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.lines import doc_lines, remove_duplicated_lines

BANNER = "subscribe to our newsletter today"
FOOTER = "copyright acme corp all rights reserved"


@pytest.fixture()
def docs(spark):
    rows = [
        # banner + two unique lines + footer; \r\n endings + blank line
        (1, BANNER + "\r\n" + "unique first line one\r\n\r\n"
            "unique second line one\r\n" + FOOTER),
        # banner + one long unique line -> survives the 30% char rule
        (2, BANNER + "\n" + "a genuinely long unique line " * 4),
        # footer + tiny unique line -> killed (most chars are boilerplate)
        (3, FOOTER + "\nok"),
        # only unique lines, repeated INSIDE the doc -> kept (cross-doc only)
        (4, "self repeated line\nself repeated line\nmore text here"),
        # whitespace-only doc -> one row, empty clean_text, kept
        (5, " \t \n   \n"),
        # indented copy of the banner -> trimmed match, still deduped
        (6, "  " + BANNER + "  \nunique tail line six"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_doc_lines_trim_and_blanks(spark, docs):
    ln = doc_lines(docs).collect()
    got = {(r["doc_id"], r["idx"]): r["line"] for r in ln}
    # \r trimmed, blank line (idx 3 of doc 1) absent, indices stable
    assert got[(1, 1)] == BANNER
    assert got[(1, 2)] == "unique first line one"
    assert (1, 3) not in got
    assert got[(1, 4)] == "unique second line one"
    assert got[(6, 1)] == BANNER  # leading/trailing spaces trimmed
    assert not [k for k in got if k[0] == 5]  # whitespace-only doc: no lines


def test_remove_duplicated_lines(spark, docs):
    out = {r["doc_id"]: r
           for r in remove_duplicated_lines(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}  # every input doc, exactly once
    # doc 1: banner+footer dropped, unique lines survive in order
    assert out[1]["clean_text"] == (
        "unique first line one\nunique second line one")
    assert out[1]["n_lines"] == 4 and out[1]["n_dropped"] == 2
    # doc 2: long unique line dominates -> kept
    assert out[2]["kept"] and out[2]["n_dropped"] == 1
    # doc 3: footer is most of the chars -> killed, but still rewritten
    assert not out[3]["kept"] and out[3]["clean_text"] == "ok"
    # doc 4: within-doc repeats are NOT cross-doc dups
    assert out[4]["n_dropped"] == 0 and out[4]["kept"]
    assert out[4]["clean_text"] == (
        "self repeated line\nself repeated line\nmore text here")
    # doc 5: no non-blank lines -> empty, kept, zero counters
    assert out[5]["clean_text"] == "" and out[5]["kept"]
    assert out[5]["chars_total"] == 0
    # doc 6: indented banner deduped against doc 1/2's
    assert out[6]["clean_text"] == "unique tail line six"
    # char accounting is exact
    r = out[1]
    assert r["chars_total"] == sum(
        len(s) for s in [BANNER, "unique first line one",
                         "unique second line one", FOOTER])
    assert r["chars_dropped"] == len(BANNER) + len(FOOTER)


def test_min_docs_generic_path(spark, docs):
    # min_docs=3: banner appears in 3 docs -> dropped; footer in 2 -> kept
    out = {r["doc_id"]: r
           for r in remove_duplicated_lines(docs, min_docs=3).collect()}
    assert out[1]["n_dropped"] == 1
    assert out[1]["clean_text"].endswith(FOOTER)
    assert out[3]["n_dropped"] == 0 and out[3]["kept"]


def test_kept_threshold_is_integer_exact(spark):
    # dropped/total exactly == 0.3 must be KEPT (<=, not <): dup line of
    # 30 chars, unique line of 70 chars
    dup = "d" * 30
    rows = [(1, dup + "\n" + "u" * 70), (2, dup)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_lines(df).collect()}
    assert out[1]["chars_dropped"] == 30 and out[1]["chars_total"] == 100
    assert out[1]["kept"]
    # one char more dropped tips it over
    rows = [(1, dup + "x\n" + "u" * 70), (2, dup + "x")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_lines(df).collect()}
    assert not out[1]["kept"]


def test_plan_is_jvm_only(spark, docs):
    plan = remove_duplicated_lines(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_null_text_kept_with_empty_text(spark):
    # ADVICE r06: NULL text gave kept=NULL (3VL) so filter(kept) AND
    # filter(~kept) both dropped the doc; contract is keep-with-empty
    dup = "duplicated boilerplate line"
    df = spark.createDataFrame(
        [(1, dup + "\nunique one"), (2, None), (3, dup + "\nunique two")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_lines(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["kept"] is True
    assert out[2]["clean_text"] == ""
    assert out[2]["n_lines"] == 0 and out[2]["chars_total"] == 0
    assert out[1]["n_dropped"] == 1  # dedup still fires for real docs
