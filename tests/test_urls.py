"""URL canonicalization + revisit dedup (operators/urls.py) — the cheapest
tier of a webtext dedup cascade. Golden canonical forms, edge cases, and
the keep-newest-fetch window over a pages-shaped frame."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.urls import (
    canonical_url_expr, url_revisit_dedup, with_canonical_url,
)

GOLDEN = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM/Path/", "https://www.example.com/Path"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&id=3", "https://example.com/a?id=3"),
    ("https://example.com/a?id=3&utm_campaign=y&b=2",
     "https://example.com/a?id=3&b=2"),
    ("https://example.com/a?gclid=abc&fbclid=def", "https://example.com/a"),
    # path case preserved; root slash collapses; '?' alone drops
    ("https://Example.com/CaseSensitive", "https://example.com/CaseSensitive"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com///", "https://example.com"),
    ("https://example.com/a?", "https://example.com/a"),
    # param ORDER preserved (no sorting by design)
    ("https://example.com/a?b=2&a=1", "https://example.com/a?b=2&a=1"),
    # no scheme -> passed through (lowercasing only hits the matched prefix)
    ("example.com/A", "example.com/A"),
]


def test_canonical_url_golden(spark):
    df = spark.createDataFrame([(r,) for r, _ in GOLDEN], "url string")
    got = [r["c"] for r in
           df.select(canonical_url_expr(F.col("url")).alias("c")).collect()]
    for (raw, want), g in zip(GOLDEN, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_canonical_is_jvm_only(spark):
    """The canonicalization must stay whole-stage-codegen (no Python)."""
    df = spark.range(5).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("url"))
    plan = with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.fixture()
def fetches(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # three fetches of one logical page (case/port/tracking noise)
        ("HTTPS://Site.com/a", t0, "v1"),
        ("https://site.com:443/a", t0 + dt.timedelta(days=1), "v2"),
        ("https://site.com/a?utm_source=feed", t0 + dt.timedelta(days=2), "v3"),
        # a second page, single fetch
        ("https://site.com/b", t0, "only"),
        # same-ts tie -> raw-url ascending breaks it deterministically
        ("https://site.com/c?x=1", t0, "tie1"),
        ("https://site.com/c?x=1#f", t0, "tie0"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")


def test_revisit_dedup_keeps_newest(fetches):
    out = url_revisit_dedup(fetches)
    surv = {r["canonical_url"]: r for r in out["survivors"].collect()}
    assert len(surv) == 3
    assert surv["https://site.com/a"]["text"] == "v3"  # newest fetch wins
    assert surv["https://site.com/b"]["text"] == "only"
    # tie on ts -> lowest raw url: the bare form is a prefix of the '#f'
    # variant, so it sorts first
    assert surv["https://site.com/c?x=1"]["url"] == "https://site.com/c?x=1"

    drops = out["drop_list"].collect()
    assert len(drops) == 3
    dropped_by_canon = {}
    for r in drops:
        dropped_by_canon.setdefault(r["canonical_url"], []).append(r)
    assert len(dropped_by_canon["https://site.com/a"]) == 2
    assert all(r["kept_url"] == "https://site.com/a?utm_source=feed"
               for r in dropped_by_canon["https://site.com/a"])

    groups = {r["canonical_url"]: r["n_fetches"]
              for r in out["groups"].collect()}
    assert groups == {"https://site.com/a": 3, "https://site.com/c?x=1": 2}


def test_revisit_dedup_on_fixture_corpus(spark, data):
    """Planted revisits over the standard pages fixture: every replica with
    url noise + newer ts must lose to its noisy twin, and non-replicated
    pages must survive untouched."""
    from fastdup_spark.fixtures.pages import pages_to_spark

    pages = pages_to_spark(spark, data)[0].limit(200).cache()
    noisy = (
        pages.limit(40)
        .withColumn("url", F.concat(F.lit("HTTPS://"),
                                    F.expr("substring(url, 9)"),
                                    F.lit("?utm_source=rss")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 7 days"))
    )
    out = url_revisit_dedup(pages.unionByName(noisy))
    assert out["survivors"].count() == 200
    assert out["drop_list"].count() == 40
    # every kept row for a revisited page is the NOISY (newer) fetch
    kept_noisy = out["survivors"].filter(F.col("url").startswith("HTTPS://"))
    assert kept_noisy.count() == 40
    assert out["groups"].count() == 40
