"""Generator determinism + planted-structure bounds (FIXTURES.md §C row 1)."""

import numpy as np

from fastdup_spark.fixtures.pages import NEAR_DUP_MIN_J, generate_pages


def test_deterministic_rebuild(data):
    d2 = generate_pages(1000, 42)
    assert data.pages.equals(d2.pages)
    assert data.truth_pairs.equals(d2.truth_pairs)
    assert data.truth_clusters.equals(d2.truth_clusters)
    # html bytes identical too (pages.equals compares object cells by value)
    assert all(a == b for a, b in zip(data.pages["html"], d2.pages["html"]))


def test_different_seed_differs():
    a = generate_pages(200, 42)
    b = generate_pages(200, 43)
    assert not a.pages["text"].equals(b.pages["text"])


def test_planted_jaccard_bounds(data):
    tp = data.truth_pairs
    near = tp[tp.kind == "near"]
    assert (near.true_jaccard >= NEAR_DUP_MIN_J).all()
    exact = tp[tp.kind == "exact"]
    assert (exact.true_jaccard == 1.0).all()
    boiler = tp[tp.kind == "boilerplate"]
    assert (boiler.true_jaccard < 0.5).all(), "boilerplate controls must stay below dup range"
    contain = tp[tp.kind == "containment"]
    assert len(contain) > 0 and (contain.true_jaccard < 0.85).all()


def test_kind_fractions(data):
    n = len(data.pages)
    counts = data.pages["url"].str.split("/").str[3].value_counts()
    assert counts.get("single", 0) / n > 0.5
    for kind in ("exact", "near", "boiler", "contain", "bad"):
        assert counts.get(kind, 0) > 0


def test_schema_and_types(data):
    p = data.pages
    assert list(p.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert p["url"].is_unique
    assert p["warc_ts"].dtype.kind == "M"
    assert all(isinstance(h, (bytes, bytearray)) for h in p["html"])
    assert set(p["lang"].unique()) <= {"en", "de", "fr", "es", "zh"}


def test_zh_docs_are_cjk(data):
    zh = data.pages[(data.pages.lang == "zh") & (data.pages.text != "")]
    assert len(zh) > 0
    sample = zh.iloc[0]["text"]
    cjk = sum(1 for c in sample if "一" <= c <= "鿿")
    assert cjk > len(sample) * 0.3
