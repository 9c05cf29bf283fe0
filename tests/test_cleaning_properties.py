"""Randomized cross-checks for the cleaning tier: one Spark pass over a
few hundred adversarial generated strings, compared row-by-row against
pure-Python reference implementations (re module semantics match Java
regex for the lookaround-free patterns), plus algebraic properties
(scrub idempotence, c4 re-clean stability)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.cleaning import c4_clean
from fastdup_spark.operators.pii import (
    EMAIL_RE, EMAIL_TOKEN, IPV4_RE, IPV4_TOKEN, PHONE_RE, PHONE_TOKEN,
    scrub_pii)

_WORDS = ["alpha", "beta", "gamma", "delta", "mail", "call", "至",
          "naïve", "x9", "O'Neil", "a.b", "-", "{", "}"]
_PII = ["bob@x.io", "a.b-c@mail.example.org", "415-555-1234",
        "415.555.9999", "212 555 8888", "10.0.0.1", "255.255.255.255",
        "not@an@email", "1.2.3", "12345678901", "x@y", "999-99-9999"]


def _gen_texts(n: int, seed: int = 7) -> list[str]:
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 14)
        toks = list(rng.choice(_WORDS, size=k)) if k else []
        for _ in range(rng.randint(0, 3)):
            toks.insert(rng.randint(0, len(toks) + 1),
                        str(rng.choice(_PII)))
        seps = rng.choice([" ", "  ", "\n", "\t", ". ", "! "], size=max(len(toks) - 1, 0))
        s = ""
        for i, t in enumerate(toks):
            s += t + (seps[i] if i < len(seps) else "")
        if rng.rand() < 0.3:
            s += rng.choice([".", "!", "?", '"', ""])
        out.append(s)
    out += ["", " ", "\n\n", ".", "a@b.co"]
    return out


def _py_scrub(text: str) -> tuple[int, int, int, str]:
    n_e = len(re.findall(EMAIL_RE, text))
    n_i = len(re.findall(IPV4_RE, text))
    n_p = len(re.findall(PHONE_RE, text))
    out = re.sub(EMAIL_RE, EMAIL_TOKEN, text)
    out = re.sub(IPV4_RE, IPV4_TOKEN, out)
    out = re.sub(PHONE_RE, PHONE_TOKEN, out)
    return n_e, n_i, n_p, out


@pytest.fixture(scope="module")
def scrub_rows(spark):
    texts = _gen_texts(400)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    return texts, rows


def test_scrub_matches_python_reference(scrub_rows):
    texts, rows = scrub_rows
    for i, t in enumerate(texts):
        n_e, n_i, n_p, clean = _py_scrub(t)
        r = rows[i]
        assert (r.n_emails, r.n_ips, r.n_phones) == (n_e, n_i, n_p), t
        assert r.clean_text == clean, t


def test_scrub_is_idempotent(spark, scrub_rows):
    texts, rows = scrub_rows
    once = [(i, rows[i].clean_text) for i in range(len(texts))]
    df = spark.createDataFrame(once, ["doc_id", "text"])
    twice = {r.doc_id: r for r in scrub_pii(df).collect()}
    for i, clean in once:
        assert twice[i].clean_text == clean
        assert (twice[i].n_emails, twice[i].n_ips, twice[i].n_phones) \
            == (0, 0, 0), clean


def _py_c4_keep(line: str, min_words: int = 5) -> bool:
    t = re.sub(r"\s+", " ", line).strip()
    # ''.split(' ') == [''] in Python and Spark alike: empty line = 1 "word"
    n_words = len(t.split(" "))
    return (n_words >= min_words and bool(re.search(r'[.!?"]$', t))
            and "javascript" not in t.lower())


def test_c4_matches_python_reference(spark):
    texts = _gen_texts(300, seed=11)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: r for r in c4_clean(df).collect()}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [l for l in lines if _py_c4_keep(l)]
        keep_doc = (len(kept) >= 3 and "lorem ipsum" not in t.lower()
                    and "{" not in t)
        r = got[i]
        assert r.n_lines == len(lines), repr(t)
        assert r.n_kept == len(kept), repr(t)
        assert r.clean_text == "\n".join(kept), repr(t)
        assert r.keep_doc == keep_doc, repr(t)


def test_c4_is_stable_under_reclean(spark):
    """Cleaning an already-clean text drops nothing further (kept lines
    all satisfy the line predicate by construction)."""
    texts = _gen_texts(200, seed=13)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = [(r.doc_id, r.clean_text) for r in c4_clean(df).collect()
            if r.clean_text]
    df2 = spark.createDataFrame(once, ["doc_id", "text"])
    again = {r.doc_id: r for r in c4_clean(df2).collect()}
    for i, clean in once:
        assert again[i].clean_text == clean
        assert again[i].n_kept == again[i].n_lines
