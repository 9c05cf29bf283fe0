"""PII scrub (operators/pii.py): golden redactions, counts, plan shape."""

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.pii import (
    EMAIL_TOKEN, IPV4_TOKEN, PHONE_TOKEN, scrub_pii)


@pytest.fixture(scope="module")
def scrubbed(spark):
    rows = [
        (1, "mail bob.smith+tag@corp.example.org please"),
        (2, "call 415-555-1234 or 415.555.9999 today"),
        (3, "server at 10.0.0.1 and 192.168.255.254 up"),
        (4, "no pii in this one at all"),
        (5, "a@b.io then 10.1.2.3 then 212 555 8888 mixed"),
        (6, "user123name has digits but no boundary 1234567890123"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    return out


def test_email_redacted(scrubbed):
    r = scrubbed[1]
    assert r.n_emails == 1 and r.n_phones == 0 and r.n_ips == 0
    assert r.clean_text == f"mail {EMAIL_TOKEN} please"


def test_phone_both_separators(scrubbed):
    r = scrubbed[2]
    assert r.n_phones == 2
    assert r.clean_text == f"call {PHONE_TOKEN} or {PHONE_TOKEN} today"


def test_ipv4(scrubbed):
    r = scrubbed[3]
    assert r.n_ips == 2
    assert r.clean_text == f"server at {IPV4_TOKEN} and {IPV4_TOKEN} up"


def test_clean_doc_unchanged(scrubbed):
    r = scrubbed[4]
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)
    assert r.clean_text == r.text


def test_mixed_classes_ordered(scrubbed):
    r = scrubbed[5]
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    assert r.clean_text == (
        f"{EMAIL_TOKEN} then {IPV4_TOKEN} then {PHONE_TOKEN} mixed")


def test_no_word_boundary_false_positives(scrubbed):
    # digits embedded in words / overlong digit runs are not phones/IPs
    r = scrubbed[6]
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)
    assert r.clean_text == r.text


def test_empty_text(scrubbed):
    r = scrubbed[7]
    assert r.clean_text == "" and r.n_emails == 0


def test_plan_is_jvm_only_and_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x a@b.co")], ["doc_id", "text"])
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
