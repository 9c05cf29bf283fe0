"""C4 line cleaning + blocklist (operators/cleaning.py): per-rule goldens,
page-level kills, plan shape."""

import pytest

from fastdup_spark.operators.cleaning import blocklist_flags, c4_clean

GOOD1 = "This line has enough words and ends properly."
GOOD2 = "Another perfectly fine sentence lives right here!"
GOOD3 = 'He said the quoted form also counts as terminal."'


def _clean_one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return c4_clean(df, **kw).collect()[0]


def test_keeps_only_qualifying_lines(spark):
    r = _clean_one(spark, "\n".join([
        "Home | About | Contact",          # no terminal punct
        "Please enable javascript now ok.",  # javascript
        GOOD1,
        "Too short.",                       # < 5 words
        GOOD2,
        GOOD3,                              # quote counts as terminal
    ]))
    assert r.n_lines == 6 and r.n_kept == 3
    assert r.clean_text == "\n".join([GOOD1, GOOD2, GOOD3])
    assert r.keep_doc


def test_question_and_bang_are_terminal(spark):
    r = _clean_one(spark, "Is this a qualifying line with words?\n"
                          "Yes it is and it even shouts loudly!\n" + GOOD1)
    assert r.n_kept == 3 and r.keep_doc


def test_whitespace_normalized_before_count(spark):
    # 4 words + padding spaces must NOT count as 5
    r = _clean_one(spark, "only   four  words   here.\n" + GOOD1)
    assert r.n_kept == 1


def test_doc_killed_by_lorem_ipsum(spark):
    r = _clean_one(spark, "\n".join(
        [GOOD1, GOOD2, "Lorem Ipsum dolor sit amet filler text."]))
    assert r.n_kept == 3 and not r.keep_doc


def test_doc_killed_by_brace(spark):
    r = _clean_one(spark, "\n".join([GOOD1, GOOD2, GOOD3, "var x = {1};"]))
    assert r.n_kept == 3 and not r.keep_doc


def test_doc_killed_by_too_few_kept_lines(spark):
    r = _clean_one(spark, GOOD1 + "\nnope\nstill nope")
    assert r.n_kept == 1 and not r.keep_doc


def test_min_words_configurable(spark):
    r = _clean_one(spark, "Three words here.\n" + GOOD1, min_words=3,
                   min_kept_lines=1)
    assert r.n_kept == 2 and r.keep_doc


def test_plan_is_jvm_only_and_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a.\nb.")], ["doc_id", "text"])
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


# --- blocklist -------------------------------------------------------------

def test_blocklist_exact_token_membership(spark):
    df = spark.createDataFrame([
        (1, "the casino opened a new class"),   # casino hits; class != ass
        (2, "totally clean text right here"),
        (3, "CASINO and Jackpot in caps"),      # case-insensitive
        (4, "jackpotting is not jackpot"),      # substring must not hit
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           blocklist_flags(df, ["casino", "jackpot", "ass"]).collect()}
    assert out[1].blocked and out[1].matched == "casino"
    assert not out[2].blocked and out[2].matched == ""
    assert out[3].matched == "casino,jackpot" and out[3].n_hits == 2
    assert out[4].matched == "jackpot"  # exact token 'jackpot' present


def test_blocklist_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = blocklist_flags(df, ["bad"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_all_lines_dropped_gives_empty_clean_text(spark):
    r = _clean_one(spark, "Home | About\nshort.\nEnable javascript today ok.")
    assert r.n_kept == 0 and r.clean_text == "" and not r.keep_doc
