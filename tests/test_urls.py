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


def test_host_expr_golden(spark):
    from fastdup_spark.operators.urls import host_expr
    cases = [
        ("HTTPS://Site.Example.COM:8443/a/b?q=1#f", "site.example.com"),
        ("http://host.com/a", "host.com"),
        ("https://host.com", "host.com"),
        ("https://host.com?q=1", "host.com"),
        ("no-scheme/path", None),  # unknown host, NOT a '' pseudo-host
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r["h"] for r in
           df.select(host_expr(F.col("url")).alias("h")).collect()]
    for (raw, want), g in zip(cases, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_cap_per_host(spark):
    """Keep the 2 newest per host; drop_list carries host_rank > cap;
    host_stats counts both sides."""
    import datetime as dt
    from fastdup_spark.operators.urls import cap_per_host
    t0 = dt.datetime(2024, 5, 1)
    rows = [
        (1, "https://a.com/1", t0),
        (2, "https://a.com/2", t0 + dt.timedelta(days=1)),
        (3, "https://a.com/3", t0 + dt.timedelta(days=2)),
        (4, "https://A.com:443/4", t0 + dt.timedelta(days=3)),
        (5, "https://b.com/1", t0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, url string, warc_ts timestamp")
    res = cap_per_host(df, 2, id_col="doc_id")
    surv = {r["doc_id"] for r in res["survivors"].collect()}
    assert surv == {3, 4, 5}  # two newest of a.com (ids 4, 3) + all of b.com
    drops = {r["doc_id"]: r["host_rank"] for r in res["drop_list"].collect()}
    assert drops == {2: 3, 1: 4}
    stats = {r["host"]: (r["n_docs"], r["n_kept"])
             for r in res["host_stats"].collect()}
    assert stats == {"a.com": (4, 2), "b.com": (1, 1)}


def test_cap_per_host_is_jvm_only(spark):
    from fastdup_spark.operators.urls import cap_per_host
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://h"), (F.col("id") % 3).cast("string"),
                 F.lit(".com/"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("warc_ts"))
    res = cap_per_host(df, 2, id_col="doc_id")
    for key in ("survivors", "drop_list", "host_stats"):
        plan = res[key]._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, key


def test_null_and_schemeless_hosts_exempt_from_cap(spark):
    """Round-6 review finding: '' / NULL pseudo-hosts must not pool
    unrelated pages into one cap partition. Scheme-less and NULL urls
    all survive regardless of the cap; known hosts still get capped."""
    import datetime as dt

    from fastdup_spark.operators.urls import cap_per_host
    t0 = dt.datetime(2024, 5, 1)
    rows = [(i, f"relative/path/{i}", t0) for i in range(5)]
    rows += [(10 + i, None, t0) for i in range(3)]
    rows += [(20 + i, f"https://h.com/{i}", t0) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts timestamp")
    res = cap_per_host(df, 2, id_col="doc_id")
    surv = {r.doc_id for r in res["survivors"].collect()}
    assert set(range(5)) <= surv and {10, 11, 12} <= surv
    assert len([d for d in surv if d >= 20]) == 2
    assert res["drop_list"].filter("host IS NULL").count() == 0
    assert res["host_stats"].filter("host IS NULL").count() == 0


def test_null_url_exempt_from_revisit_dedup(spark):
    import datetime as dt

    from fastdup_spark.operators.urls import url_revisit_dedup
    t0 = dt.datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [(None, t0), (None, t0), ("https://a.com/x", t0),
         ("https://a.com/x#frag", t0)],
        "url string, warc_ts timestamp")
    res = url_revisit_dedup(df)
    assert res["survivors"].filter("url IS NULL").count() == 2
    assert res["drop_list"].count() == 1  # only the #frag revisit
