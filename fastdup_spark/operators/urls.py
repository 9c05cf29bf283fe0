"""URL canonicalization + URL-level dedup — the cheapest tier of a
webtext dedup cascade.

Common-Crawl-style pipelines (CCNet, RefinedWeb) dedup by canonical URL
BEFORE content dedup: the same page is fetched under scheme/host case
noise, default ports, trailing slashes, fragments, and tracking query
params, and across snapshots (revisits). Collapsing those is a pure
string transform + one window — no signatures needed — and removes the
bulk of exact refetch duplicates for the cost of a single shuffle on the
canonical key.

The reference has no URL surface (it keys images by filename,
/root/reference/fastdup/fastdup_controller.py:120-135); this module is
part of the beyond-the-reference LLM-data-pipeline tier (SURVEY §2
addenda). Everything here is pure built-in expressions (WholeStageCodegen,
no Python), and the canonicalization is deliberately regex-backreference
free so an independent SQL engine can replay it verbatim (the driver
oracle does, in DuckDB).

At 100-TB scale: `canonical_url_expr` is a map-side projection (no
shuffle); `url_revisit_dedup` shuffles once on the canonical key — the
same partitioning the downstream exact-hash dedup wants, so a real
cluster can reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query-param name prefixes that never identify content (tracking /
# click-attribution); the list is fixed so canonical ids are stable
TRACKING_PREFIXES = ("utm_", "gclid", "fbclid", "msclkid", "mc_eid")


def _canonical_from_parts(url: Column) -> Column:
    """Implementation body of `canonical_url_expr` (one SQL expr tree;
    see the public docstring for the rule list)."""
    u = url
    no_frag = F.substring_index(u, "#", 1)
    base = F.substring_index(no_frag, "?", 1)
    has_q = F.instr(no_frag, "?") > 0
    query = F.substring(no_frag, F.instr(no_frag, "?") + 1, F.lit(1 << 30))
    sh_raw = F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", 0)
    sh = F.lower(sh_raw)
    sh = (
        F.when(sh.startswith("https://") & sh.endswith(":443"),
               F.substring(sh, 1, F.length(sh) - 4))
        .when(sh.startswith("http://") & sh.endswith(":80"),
              F.substring(sh, 1, F.length(sh) - 3))
        .otherwise(sh)
    )
    path = F.substring(base, F.length(sh_raw) + 1, F.lit(1 << 30))
    path = F.regexp_replace(path, "/+$", "")
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    q2 = F.array_join(kept, "&")
    return F.concat(
        sh, path,
        F.when(has_q & (q2 != ""), F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )


def _is_tracking(param: Column) -> Column:
    cond = param.startswith(TRACKING_PREFIXES[0])
    for pref in TRACKING_PREFIXES[1:]:
        cond = cond | param.startswith(pref)
    return cond


def canonical_url_expr(url: Column) -> Column:
    """url string -> canonical form: fragment dropped; scheme/host
    lowercased; default ports (:80/:443) dropped; trailing path slashes
    dropped; tracking query params (TRACKING_PREFIXES) dropped with the
    remaining params' order preserved; an emptied query drops its '?'.
    Pure built-ins, no regex capture groups — the DuckDB driver oracle
    replays it verbatim. NOT done by design: www-stripping, param
    sorting, percent-decoding (each conflates distinct resources)."""
    return _canonical_from_parts(url)


def with_canonical_url(pages: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    """Map-side projection: attach the canonical url column."""
    return pages.withColumn(out_col, canonical_url_expr(F.col(url_col)))


def host_expr(url: Column) -> Column:
    """url -> lowercased host: authority minus userinfo (text after the
    LAST '@' — otherwise u1@spam.com/u2@spam.com would bucket one spam
    domain under N hosts and evade per-host caps) and minus the port,
    with bracketed IPv6 literals kept whole ('[2001:db8::1]:8443' ->
    '[2001:db8::1]', not '[2001'). Pure substring splits, no regex
    capture groups (same DuckDB-replayability discipline as
    canonical_url_expr); urls without '://' yield NULL — an unknown
    host, NOT a shared pseudo-host (a '' sentinel would pool every
    scheme-less/relative url into ONE cap_per_host partition and drop
    unrelated pages against each other)."""
    rest = F.when(F.instr(url, "://") > 0,
                  F.substring(url, F.instr(url, "://") + 3, F.lit(1 << 30))) \
        .otherwise(F.lit(None).cast("string"))
    auth = F.substring_index(
        F.substring_index(
            F.substring_index(F.substring_index(rest, "/", 1), "?", 1),
            "#", 1),
        "@", -1)
    host = F.when(
        auth.startswith("["),
        F.concat(F.substring_index(auth, "]", 1), F.lit("]"))
    ).otherwise(F.substring_index(auth, ":", 1))
    return F.lower(host)


def cap_per_host(pages: DataFrame, max_per_host: int,
                 url_col: str = "url", ts_col: str | None = "warc_ts",
                 id_col: str | None = None) -> dict[str, DataFrame]:
    """RefinedWeb-style per-domain cap (anti-spam/SEO-farm control): keep
    at most ``max_per_host`` pages per host — the newest fetches first
    when ``ts_col`` is given, ties (and the ts_col=None case) broken by
    ``id_col`` or the raw url for determinism.

    Returns ``{"survivors", "drop_list", "host_stats"}``: survivors keep
    the input columns + ``host``; drop_list = (url/id, host, host_rank)
    rows beyond the cap; host_stats = (host, n_docs, n_kept). One shuffle
    on host; everything else map-side — the same scale shape as
    url_revisit_dedup.
    """
    tie = [F.asc(id_col)] if id_col else [F.asc(url_col)]
    order = ([F.desc(ts_col)] if ts_col else []) + tie
    h = pages.withColumn("host", host_expr(F.col(url_col)))
    # NULL host = unknown host: EXEMPT from the cap (rank pinned 1), not a
    # shared pseudo-host — Window.partitionBy would otherwise pool every
    # scheme-less/malformed url into one partition and cap them together.
    # The (isnull, coalesce) partition key additionally spreads NULL-host
    # rows into singleton window partitions instead of one straggler task
    # (r07, verdict #4); the when() guard keeps semantics even when the
    # surrogate itself is NULL.
    surrogate = F.col(id_col).cast("string") if id_col else F.col(url_col)
    w = Window.partitionBy(
        F.col("host").isNull(), F.coalesce(F.col("host"), surrogate)
    ).orderBy(*order)
    ranked = h.withColumn(
        "host_rank",
        F.when(F.col("host").isNull(), F.lit(1))
        .otherwise(F.row_number().over(w)))
    survivors = ranked.filter(F.col("host_rank") <= max_per_host) \
                      .drop("host_rank")
    keep_cols = [id_col] if id_col else [url_col]
    drop_list = (
        ranked.filter(F.col("host_rank") > max_per_host)
        .select(*keep_cols, "host",
                F.col("host_rank").cast("long").alias("host_rank"))
    )
    host_stats = (
        h.filter(F.col("host").isNotNull())
        .groupBy("host").agg(F.count("*").alias("n_docs"))
        .withColumn("n_kept", F.least(F.col("n_docs"),
                                      F.lit(max_per_host).cast("long")))
    )
    return {"survivors": survivors, "drop_list": drop_list,
            "host_stats": host_stats}


def url_revisit_dedup(pages: DataFrame, url_col: str = "url",
                      ts_col: str = "warc_ts") -> dict[str, DataFrame]:
    """Keep the NEWEST fetch per canonical url (revisit dedup).

    Returns ``{"survivors": ..., "drop_list": ..., "groups": ...}``:
    survivors = one row per canonical url (latest ``ts_col``, ties broken
    by raw url for determinism); drop_list = (url, canonical_url,
    kept_url) rows for every superseded fetch; groups = (canonical_url,
    n_fetches) for groups with more than one fetch. One shuffle on the
    canonical key; everything else is map-side.
    """
    c = with_canonical_url(pages, url_col)
    # NULL url -> NULL canonical key: exempt from dedup (no evidence two
    # such rows are the same page), same NULL discipline as cap_per_host;
    # the (isnull, coalesce) partition key spreads NULL-key rows into
    # singleton window partitions instead of one straggler task (r07)
    w = Window.partitionBy(
        F.col("canonical_url").isNull(),
        F.coalesce(F.col("canonical_url"), F.col(url_col))
    ).orderBy(F.desc(ts_col), F.asc(url_col))
    ranked = c.withColumn(
        "_rn",
        F.when(F.col("canonical_url").isNull(), F.lit(1))
        .otherwise(F.row_number().over(w))) \
        .withColumn("_kept", F.first(url_col).over(w))
    survivors = ranked.filter(F.col("_rn") == 1).drop("_rn", "_kept")
    drop_list = (
        ranked.filter(F.col("_rn") > 1)
        .select(F.col(url_col).alias("url"), "canonical_url",
                F.col("_kept").alias("kept_url"))
    )
    groups = (
        c.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url").agg(F.count("*").alias("n_fetches"))
        .filter(F.col("n_fetches") >= 2)
    )
    return {"survivors": survivors, "drop_list": drop_list, "groups": groups}
