"""Tiered dedup cascade (operators/cascade.py): url -> exact -> near_dup.

Planted fixture covers every tier plus tier-precedence (a doc that is both
a url revisit AND an exact dup must be claimed by the cheaper url tier).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fastdup_spark.operators.cascade import dedup_cascade

def words(tag: str, n: int = 34) -> str:
    """n distinct tokens with a per-group vocabulary — groups share zero
    shingles, so the only near-dup pair is the one we plant."""
    return " ".join(f"{tag}{i}" for i in range(n))


W_URL, W_EXACT, W_NEAR = words("u"), words("e"), words("n")
# last token changed: 25 of 26 9-gram shingles shared -> J = 25/27 ~ 0.926
W_NEAR_VAR = W_NEAR[: -len("n33")] + "n33x"


@pytest.fixture()
def pages(spark):
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    ts = [t0 + dt.timedelta(days=i) for i in range(6)]
    rows = [
        # url revisits: 3 fetches of one canonical page; newest = id 3
        (1, "HTTPS://Site.com/a", ts[0], "v1 " + W_URL),
        (2, "https://site.com:443/a", ts[1], "v2 " + W_URL),
        (3, "https://site.com/a?utm_source=x", ts[2], "v3 " + W_URL),
        # exact dups under DIFFERENT urls: survivor = min id 4
        (4, "https://m1.com/x", ts[0], W_EXACT),
        (5, "https://m2.com/x", ts[0], W_EXACT),
        # id 6: exact dup of 4 AND url revisit of 7 (newer) -> url tier wins
        (6, "https://both.com/y", ts[0], W_EXACT),
        (7, "https://both.com/y#frag", ts[1], words("s")),
        # near-dups (distinct hashes, shared 9-gram shingles): comp = min 8
        (8, "https://n1.com/p", ts[0], W_NEAR),
        (9, "https://n2.com/p", ts[0], W_NEAR_VAR),
        # singleton
        (10, "https://solo.com/q", ts[0], words("z", 20)),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, url string, warc_ts timestamp, text string")


def test_cascade_decisions(spark, pages):
    res = dedup_cascade(pages, url_col="url", ts_col="warc_ts")
    dec = {r["doc_id"]: (r["tier"], r["kept_by"])
           for r in res["decisions"].collect()}
    # url tier: 1,2 superseded by newest fetch 3; 6 superseded by 7
    assert dec[1] == ("url", 3) and dec[2] == ("url", 3)
    assert dec[6] == ("url", 7)
    # exact tier: 5 deduped against 4 (6 already gone -> claimed by url)
    assert dec[5] == ("exact", 4)
    # near-dup tier: 9 clustered with 8
    assert dec[9] == ("near_dup", 8)
    assert set(dec) == {1, 2, 5, 6, 9}

    surv = {r["doc_id"] for r in res["survivors"].collect()}
    assert surv == {3, 4, 7, 8, 10}
    # partition property: every input row is survivor XOR dropped
    assert surv | set(dec) == {r["doc_id"] for r in pages.collect()}
    assert not (surv & set(dec))

    counts = {r["tier"]: r["n_dropped"] for r in res["tier_counts"].collect()}
    assert counts == {"url": 3, "exact": 1, "near_dup": 1}


def test_cascade_without_url_tier(spark, pages):
    """url_col=None: revisits are NOT collapsed; exact tier picks up the
    byte-identical bodies (4,5,6 -> keep 4)."""
    res = dedup_cascade(pages, url_col=None)
    dec = {r["doc_id"]: (r["tier"], r["kept_by"])
           for r in res["decisions"].collect()}
    assert dec[5] == ("exact", 4) and dec[6] == ("exact", 4)
    assert all(t != "url" for t, _ in dec.values())


def test_cheap_tiers_are_jvm_only(spark, pages):
    """With run_near_dup=False the whole cascade must stay codegen-side:
    no Python eval anywhere in the executed plan."""
    res = dedup_cascade(pages, url_col="url", ts_col="warc_ts",
                        run_near_dup=False)
    for key in ("survivors", "decisions"):
        plan = res[key]._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, key
        assert "ArrowEvalPython" not in plan, key


def test_kept_by_points_at_a_survivor(spark, pages):
    """Every kept_by must reference a doc that itself survived every tier
    (the cascade never chains drops onto dropped docs)."""
    res = dedup_cascade(pages, url_col="url", ts_col="warc_ts")
    surv = {r["doc_id"] for r in res["survivors"].collect()}
    kept = {r["kept_by"] for r in res["decisions"].collect()}
    assert kept <= surv


def test_ts_tie_breaks_by_min_id(spark):
    """Equal fetch timestamps -> smallest id survives (determinism)."""
    t0 = dt.datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [(11, "https://t.com/z", t0, "eleven only"),
         (12, "HTTPS://T.com/z", t0, "twelve only")],
        "doc_id bigint, url string, warc_ts timestamp, text string")
    res = dedup_cascade(df, url_col="url", ts_col="warc_ts",
                        run_near_dup=False)
    dec = {r["doc_id"]: r["kept_by"] for r in res["decisions"].collect()}
    assert dec == {12: 11}


def test_null_keys_exempt_from_cheap_tiers(spark):
    """Round-6 review finding: NULL url / NULL text rows carry no dedup
    evidence — they must all survive the window tiers, never be deduped
    against each other."""
    from fastdup_spark.operators.cascade import dedup_cascade
    rows = [
        (1, None, "https://a.com/x", 1),
        (2, None, "https://a.com/y", 2),   # NULL text: exact tier exempt
        (3, "same body", None, 3),
        (4, "same body", None, 4),         # NULL url: url tier exempt
        (5, "same body", "https://b.com/1", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, url string, ts long")
    res = dedup_cascade(df, id_col="doc_id", text_col="text",
                        url_col="url", ts_col="ts", run_near_dup=False)
    surv = {r.doc_id for r in res["survivors"].collect()}
    decisions = {r.doc_id: r.tier for r in res["decisions"].collect()}
    # NULL-text docs both survive; NULL-url docs reach the exact tier
    # where 3/4/5 share a body -> smallest id (3) survives
    assert surv == {1, 2, 3}
    assert decisions == {4: "exact", 5: "exact"}


def test_null_key_rows_spread_across_window_partitions(spark):
    # r07 (verdict #4): semantics were already NULL-exempt, but every
    # NULL-key row still landed in ONE window partition (straggler task
    # on NULL-heavy corpora). The partition key is now
    # (key isnull, coalesce(key, per-row id)) — assert the plan carries
    # the spread key and the semantics stay pinned.
    from pyspark.sql import functions as F

    rows = [(i, None if i % 2 else f"text {i}", None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    res = dedup_cascade(df, url_col="url", run_near_dup=False)
    plan = res["survivors"]._jdf.queryExecution().optimizedPlan().toString()
    assert "coalesce" in plan and "isnull" in plan
    # every NULL-text doc survives the exact tier untouched
    dropped = {r["doc_id"] for r in res["decisions"].collect()}
    assert not any(i % 2 for i in dropped)
