"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup pipeline on sf0.001.
``queries()`` exposes one entry per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for every entry —
including the once rows-only ops (CC via recursive CTEs, simhash via a
shingle-hash dump, hyperplane-LSH ANN via a plane-matrix dump).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # fastdup_spark pkg

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_TOK = r"\s+"


def _tokens(col):
    return F.split(F.trim(F.regexp_replace(col, _TOK, " ")), " ")


def _ts(col):
    # canonical timestamp string so Spark/DuckDB hash identically
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash -> LSH banding -> exact-Jaccard verify -> large-star/
    small-star CC over sf0.001 documents; returns component size table
    (the Spark analog of fastdup.run() + find_top_components)."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.plans.pipeline import near_dup_pipeline

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    res = near_dup_pipeline(docs, PipelineConfig())
    return (
        res["assignments"]
        .groupBy("component_id")
        .agg(F.count("*").alias("count"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("count") >= 2)
        .orderBy(F.desc("count"), F.asc("component_id"))
    )


# --------------------------------------------------------------------------
# SQL-checkable queries (Spark side)
# --------------------------------------------------------------------------

# --- dedup over documents -------------------------------------------------

def _docs_with_planted_dups(spark, sf):
    """documents ∪ mirrored copies of doc_id<500 (shifted ids) — gives the
    exact-dup operators a non-vacuous group structure at every sf."""
    d = _t(spark, sf, "documents")
    mirror = d.filter(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    return d.select("doc_id", "text").unionByName(mirror)


def q_exact_dup_groups(spark, sf):
    """Exact dedup by content hash (hash-groupBy; degenerate similarity-1.0
    clusters — SURVEY §2.4 A9 analog)."""
    d = _docs_with_planted_dups(spark, sf)
    return (
        d.groupBy(F.md5("text").alias("group_key"))
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("keeper"))
        .filter(F.col("group_size") >= 2)
    )


def q_exact_dup_histogram(spark, sf):
    """Component-size histogram (A9 / component_info.csv analog)."""
    return (
        q_exact_dup_groups(spark, sf)
        .groupBy("group_size").agg(F.count("*").alias("n_groups"))
    )


def q_exact_dup_drop_list(spark, sf):
    """W4 keep-first policy: non-survivors of exact-dup groups."""
    d = _docs_with_planted_dups(spark, sf).select("doc_id", F.md5("text").alias("gk"))
    w = Window.partitionBy("gk")
    wr = Window.partitionBy("gk").orderBy("doc_id")
    return (
        d.withColumn("sz", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter((F.col("sz") >= 2) & (F.col("rn") > 1))
        .select("doc_id")
    )


def q_ngram_jaccard_pairs(spark, sf):
    """Exact word-3-gram Jaccard between small-id docs, expressed the
    scalable way: explode distinct grams -> equi-join -> count (the SQL-
    checkable analog of the shingle verify stage). Mirrored copies of
    doc_id<10 are planted (ids +1000) so the pair set is non-vacuous at
    every sf; docs with <3 tokens get an empty gram set (ANSI-safe — a
    descending F.sequence would crash element_at)."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40).select("doc_id", "text")
    mirror = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text")
    d = d.unionByName(mirror)
    toks = d.select("doc_id", _tokens(F.col("text")).alias("w"))
    grams = toks.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.when(F.size("w") < 3, F.array().cast("array<string>"))
            .otherwise(F.transform(
                F.sequence(F.lit(1), F.size("w") - 2),
                lambda i: F.concat_ws(" ", F.element_at("w", i),
                                      F.element_at("w", i + 1),
                                      F.element_at("w", i + 2)),
            )))).alias("g"),
    ).filter(F.col("g") != "")
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        grams.alias("a").join(grams.alias("b"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count("*").alias("inter_cnt"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("src"), F.col("n").alias("na")), "src")
        .join(sizes.select(F.col("doc_id").alias("dst"), F.col("n").alias("nb")), "dst")
        .withColumn("union_cnt", F.col("na") + F.col("nb") - F.col("inter_cnt"))
        .withColumn("jaccard", F.round(F.col("inter_cnt") / F.col("union_cnt"), 6))
        .filter(F.col("jaccard") >= 0.05)
        .select("src", "dst", "inter_cnt", "union_cnt", "jaccard")
    )


def q_decontamination(spark, sf):
    """J9 train/eval cross-set decontamination: eval docs whose exact content
    hash appears in the train split (planted mirrors guarantee non-vacuous
    cross-split dups at every sf). Only cross-set pairs are emitted — the
    reference's test_dir mode (/root/reference/RUN.md:189-192). The mirror
    offset is ODD (+10000001) so a mirror's doc_id%10 split differs from its
    original's for 2 of 10 residues — guaranteeing cross-split dup pairs."""
    base = _t(spark, sf, "documents").select("doc_id", "text")
    mirror = base.filter(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 10_000_001).alias("doc_id"), "text")
    d = base.unionByName(mirror)
    tagged = d.select(
        "doc_id",
        F.when(F.pmod("doc_id", 10) < 8, F.lit("train")).otherwise(F.lit("eval"))
        .alias("split"),
        F.md5("text").alias("hk"))
    ev = tagged.filter(F.col("split") == "eval").select(
        F.col("doc_id").alias("eval_doc"), "hk")
    tr = tagged.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "hk")
    return (
        ev.join(tr, "hk")
        .select("eval_doc", "train_doc")
    )


def q_passage_dedup(spark, sf):
    """Passage-level exact dedup (Lee et al. 2022, 'Deduplicating Training
    Data Makes Language Models Better'): non-overlapping 20-word chunks
    hashed and grouped across the corpus; passages in >= 2 docs are repeated
    boilerplate/duplication (planted mirrors guarantee non-vacuous groups).
    Short docs (<20 words) contribute no chunks (ANSI-safe guard)."""
    d = _docs_with_planted_dups(spark, sf)
    w = _tokens(F.col("text"))
    chunks_expr = F.when(F.size(w) < 20, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), (F.size(w) / 20).cast("int")),
            lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * 20 + 1, 20)),
        ))
    ch = d.select("doc_id", F.explode(chunks_expr).alias("passage"))
    return (
        ch.groupBy(F.md5("passage").alias("passage_key"))
        .agg(F.count_distinct("doc_id").alias("n_docs"),
             F.count("*").alias("n_occurrences"))
        .filter(F.col("n_docs") >= 2)
    )


def q_passage_removal(spark, sf):
    """Corpus-rewriting form of passage_dedup (CCNet drop-everywhere
    semantics over Lee et al. fixed 20-word chunks): every doc rewritten
    with cross-doc repeated chunks removed, sub-chunk tail preserved.
    Pure built-in expressions (operators/passages.py); DuckDB replays the
    chunking, the repeated-key set, the ordered reassembly and the tail
    verbatim."""
    from fastdup_spark.operators.passages import remove_repeated_passages

    d = _docs_with_planted_dups(spark, sf)
    return remove_repeated_passages(d)


def q_exact_substring_removal(spark, sf):
    """ExactSubstr at arbitrary offsets (operators/exactsubstr.py — the
    Spark-native form of Lee et al. 2022's suffix-array tool): every
    cross-doc duplicated >=8-token run erased from every doc, spans
    merged, gutted docs killed (integer-exact 30% rule). Plants a
    shifted companion per doc_id%4==0 (2 filler tokens + the doc's first
    30 tokens) so duplicated runs exist at MISALIGNED offsets — the case
    fixed-grid passage hashing cannot see. DuckDB replays the token
    stream, the overlapping k-gram flag set, covered-position expansion,
    merged-interval counting, ordered reassembly and the kill rule
    verbatim."""
    from fastdup_spark.operators.exactsubstr import remove_duplicated_spans

    d = _t(spark, sf, "documents")
    w = _tokens(F.col("text"))
    plant = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 20000000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.array(F.lit("intro"), F.lit("filler")),
                     F.slice(w, 1, 30))).alias("text"))
    both = d.select("doc_id", "text").unionByName(plant)
    return remove_duplicated_spans(both, k=8)


_LINE_BANNER = "subscribe to our newsletter today for updates"
_LINE_FOOTER = "copyright acme corp all rights reserved worldwide"


def _docs_with_lines(spark, sf, k=8):
    """documents re-lined for line-granularity operators: the whitespace
    tokens regrouped into k-word lines (the sub-k tail becomes the final
    line), a boilerplate banner prepended when doc_id%3==0 and a footer
    appended when doc_id%5==0 — so cross-doc duplicated lines exist at
    every sf. The DuckDB oracle derives the SAME line lists independently
    (list_transform over the shared ws-token contract)."""
    from fastdup_spark.operators.textql import ws_tokens_expr

    d = _t(spark, sf, "documents")
    w = ws_tokens_expr(F.col("text"))
    n_full = (F.size(w) / k).cast("int")
    empty = F.array().cast("array<string>")
    # guard: sequence(1, 0) DESCENDS in Spark — short docs get no chunks
    chunks = F.when(n_full < 1, empty).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_full),
            lambda i: F.concat_ws(" ", F.slice(w, (i - 1) * k + 1, k))))
    tail = F.when(
        F.size(w) > n_full * k,
        F.array(F.concat_ws(" ", F.slice(w, n_full * k + 1,
                                         F.size(w) - n_full * k)))
    ).otherwise(empty)
    banner = F.when(F.col("doc_id") % 3 == 0,
                    F.array(F.lit(_LINE_BANNER))).otherwise(empty)
    footer = F.when(F.col("doc_id") % 5 == 0,
                    F.array(F.lit(_LINE_FOOTER))).otherwise(empty)
    lines = F.concat(banner, chunks, tail, footer)
    return d.select("doc_id", F.array_join(lines, "\n").alias("text"))


def q_line_dedup(spark, sf):
    """RefinedWeb/FineWeb line-level dedup (operators/lines.py): lines
    duplicated across >=2 docs dropped from EVERY doc, docs losing >30%
    of their chars killed (integer-exact threshold). Pure built-in
    expressions; DuckDB replays line derivation, the duplicated-key set,
    ordered reassembly and the char accounting verbatim."""
    from fastdup_spark.operators.lines import remove_duplicated_lines

    return remove_duplicated_lines(_docs_with_lines(spark, sf))


def q_training_shards(spark, sf):
    """Deterministic training-shard shuffle (operators/shards.py): the
    pipeline's output stage — shard = top-60-bits of md5(salt:id) mod N,
    pos = rank within shard by (key, id). One hash shuffle + per-shard
    sort (no global sort); DuckDB replays assignment AND order via
    CAST('0x'||substr(md5,1,15) AS BIGINT)."""
    from fastdup_spark.operators.shards import assign_training_shards

    d = _t(spark, sf, "documents").select("doc_id")
    return assign_training_shards(d, 16, salt="r6") \
        .select("doc_id", "shard", "pos")


def q_sequence_packing(spark, sf):
    """Deterministic next-fit sequence packing (operators/packing.py):
    every doc assigned a (shard, bin, bin_offset) training slot — no
    splits, no truncation, oversize docs flagged in a bin of their own.
    The per-shard next-fit recurrence runs in ONE grouped-pandas pass;
    DuckDB replays it exactly with a recursive CTE walking all shards in
    lockstep (plus the md5 shard/pos permutation and the shared ws-token
    counts)."""
    from fastdup_spark.operators.packing import pack_sequences

    d = _t(spark, sf, "documents")
    return pack_sequences(d, capacity=200, n_shards=8, salt="pack")


def q_sequence_chopping(spark, sf):
    """GPT-style concat-and-chop packing (operators/packing.py
    chop_sequences): each shard's docs concatenate in the md5 walk order
    and chop into 200-token windows, docs straddling boundaries. Pure
    integer arithmetic over a per-shard running sum, so DuckDB replays
    the permutation, the cumsum and every slice bound exactly."""
    from fastdup_spark.operators.packing import chop_sequences

    d = _t(spark, sf, "documents")
    return chop_sequences(d, capacity=200, n_shards=8, salt="chop")


def q_content_fingerprint(spark, sf):
    """Whitespace/punct-insensitive content fingerprint (md5 flavor so the
    oracle can reproduce it; production uses xxhash64)."""
    d = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), r"[\.,!\?;:]", ""), _TOK, " "))
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


# --- text analysis over documents ----------------------------------------

def q_doc_char_classes(spark, sf):
    """Integer char-class stats per doc (doc_stats analog; exact-match safe)."""
    d = _t(spark, sf, "documents")
    t = F.col("text")
    n = F.length(t)
    return d.select(
        "doc_id",
        n.alias("n_chars"),
        (n - F.length(F.regexp_replace(t, "[0-9]", ""))).alias("n_digits"),
        (n - F.length(F.regexp_replace(t, r"[\.,!\?;:]", ""))).alias("n_punct"),
        (n - F.length(F.regexp_replace(t, r"\s", ""))).alias("n_spaces"),
    )


def q_token_counts(spark, sf):
    """Whitespace token counting (training-data token accounting)."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.size(F.array_distinct(_tokens(F.col("text")))).alias("n_distinct_tokens"),
    )


def q_stopword_votes(spark, sf):
    """Per-language stopword hit counts — the lang-ID heuristic's inputs."""
    d = _t(spark, sf, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), _TOK, " ")), " ")
    en = ["the", "and", "of", "to", "in", "is"]
    de = ["der", "und", "die", "das", "von", "ist"]
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: x.isin(*en))).alias("en_votes"),
        F.size(F.filter(toks, lambda x: x.isin(*de))).alias("de_votes"),
    )


def q_lang_id(spark, sf):
    """Language-ID heuristic (operators/textql.py:lang_id_expr) per doc:
    CJK charset test, then argmax of per-language stopword votes with
    fixed precedence — fully mirrored in the DuckDB oracle."""
    from fastdup_spark.operators.textql import lang_id_expr

    d = _t(spark, sf, "documents")
    return d.select("doc_id", lang_id_expr(F.col("text")).alias("lang_pred"))


def q_quality_score(spark, sf):
    """Gopher-rule-style quality score in [0,1]
    (operators/textql.py:quality_score_expr) — pure per-row arithmetic,
    reproduced exactly by the oracle."""
    from fastdup_spark.operators.textql import quality_score_expr

    d = _t(spark, sf, "documents")
    return d.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))


def q_doc_stats_agg(spark, sf):
    """A8 summary analog: per (lang, source) corpus stats."""
    d = _t(spark, sf, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def q_length_quantile_filter(spark, sf):
    """F11 quantile band delete-filter: docs above the 95th length percentile
    (rank-based, deterministic in both engines). Two-phase plan: approx-
    percentile prune, exact rank on the ~5% survivors — no unpartitioned
    window over the full table."""
    from fastdup_spark.operators.outliers import exact_rank_head

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    n = d.count()
    return exact_rank_head(d, int(n * 0.05), n, "n_chars", "doc_id",
                           ascending=False).select("doc_id", "n_chars")


def q_explode_words(spark, sf):
    """T7 explode: word frequencies of small-id docs."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 5)
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )


def q_distinct_lang_source(spark, sf):
    """T5 distinct."""
    return _t(spark, sf, "documents").select("lang", "source").distinct()


def q_union_tagged(spark, sf):
    """T6 union: two source slices tagged and unioned."""
    d = _t(spark, sf, "documents")
    a = d.filter(F.col("source") == "src0").select("doc_id", F.lit("a").alias("tag"))
    b = d.filter(F.col("lang") == "en").select("doc_id", F.lit("b").alias("tag"))
    return a.unionByName(b)


# --- embeddings -----------------------------------------------------------

def q_cosine_to_query(spark, sf):
    """Brute-force cosine similarity of every vector to the query (vec_id=0)
    — ANN correctness baseline, JVM-side arithmetic."""
    from fastdup_spark.functions.similarity import cosine_expr

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            # + 0.0 normalizes IEEE -0.0 to +0.0 so both engines hash alike
            (F.round(cosine_expr(F.col("embedding").cast("array<double>"),
                                 F.col("qv")), 3) + F.lit(0.0)).alias("cosine"),
        )
    )


def q_embedding_label_counts(spark, sf):
    e = _t(spark, sf, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.min("vec_id").alias("min_vec_id"),
    )


def q_embedding_cosine_pairs(spark, sf):
    """Embedding-cosine near-dup PAIRS, brute force (cosine >= 0.35) — the
    exact-baseline form of embedding near-duplicate detection (the brief's
    'embedding-cosine near-dup' dedup row). Deliberately all-pairs via a
    broadcast nested-loop self-join so the oracle can brute-force the same
    set; the scale path is operators/crossset.embedding_near_dup
    (hyperplane-LSH bucket self-join -> cosine verify -> CC, same plan
    shape as MinHash-LSH) with ann_cosine_lsh as the query-time probe.
    Cosine is rounded to 3 in BOTH engines BEFORE the threshold so the
    filter decision is bit-identical; +0.0 normalizes IEEE -0.0."""
    from fastdup_spark.functions.similarity import cosine_expr

    e = _t(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("src"),
                 F.col("embedding").cast("array<double>").alias("va"))
    b = e.select(F.col("vec_id").alias("dst"),
                 F.col("embedding").cast("array<double>").alias("vb"))
    return (
        a.join(F.broadcast(b), F.col("src") < F.col("dst"))
        .withColumn("cosine",
                    F.round(cosine_expr(F.col("va"), F.col("vb")), 3)
                    + F.lit(0.0))
        .filter(F.col("cosine") >= 0.35)
        .select("src", "dst", "cosine")
    )


# --- relational coverage (J/A/W/T/F rows of SURVEY §2) ---------------------

def q_lineitem_pricing_summary(spark, sf):
    """TPC-H Q1 shape: the canonical partial+final hash aggregate."""
    l = _t(spark, sf, "lineitem")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_orders_per_nation(spark, sf):
    """J1-style multi-join: orders -> customer -> nation, aggregated."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


def q_top2_orders_per_customer(spark, sf):
    """W2 k-NN truncation shape: top-2 orders per customer by price."""
    o = _t(spark, sf, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def q_customers_without_orders(spark, sf):
    """J7 anti-join (the 'how=all' outlier filter shape): customers with no
    high-value order. The price filter is pushed below the anti-join and
    keeps the slice non-vacuous at every sf (every custkey has SOME order
    in this testdata, so the unfiltered anti-join proves nothing)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_suppliers_with_shipments(spark, sf):
    """left_semi (isin-filter shape, fastdup_controller.py:880)."""
    s = _t(spark, sf, "supplier")
    l = _t(spark, sf, "lineitem")
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select("s_suppkey", "s_name")


def q_best_event_per_user(spark, sf):
    """W1 best-NN-per-query shape over events."""
    e = _t(spark, sf, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", F.round("value", 6).alias("value"),
                _ts(F.col("ts")).alias("ts_str"))
    )


def q_events_high_water(spark, sf):
    """Incremental-resume high-water mark over event time (streaming analog,
    SURVEY §2.8): latest ts + counts per type."""
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        _ts(F.max("ts")).alias("max_ts"),
        F.count("*").alias("n"),
    )


def q_event_hourly_windows(spark, sf):
    """Tumbling time-window aggregation (the batch shape of a Structured
    Streaming watermark+window agg, §2.8): hourly buckets per event type
    with order-free exact aggregates (count/min/max — no float-sum
    order sensitivity across engines)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("win"))
        .agg(F.count("*").alias("n"),
             F.round(F.min("value"), 6).alias("min_value"),
             F.round(F.max("value"), 6).alias("max_value"))
        .select("event_type", _ts(F.col("win")).alias("window_start"),
                "n", "min_value", "max_value")
    )


def q_events_percentile_outliers(spark, sf):
    """F3 outlier percentile cut: bottom 5% of events by value (rank-based).
    Two-phase plan (approx prune -> exact rank on survivors), same shape as
    operators/outliers.py."""
    from fastdup_spark.operators.outliers import exact_rank_head

    e = _t(spark, sf, "events").select("event_id", "value")
    n = e.count()
    out = exact_rank_head(e, int(n * 0.05), n, "value", "event_id",
                          ascending=True)
    return out.select("event_id", F.round("value", 6).alias("value"))


def q_ntile_sampling(spark, sf):
    """W7 uniform-metric sampling: quartile tiles of orders per segment."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return (
        j.withColumn("tile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "tile")
        .agg(F.count("*").alias("n"), F.round(F.min("o_totalprice"), 2).alias("tile_min"))
    )


def q_part_type_stats(spark, sf):
    """Grouped stats with a derived column (F14) and two-key sort shape."""
    p = _t(spark, sf, "part")
    return (
        p.withColumn("type_prefix", F.split(F.col("p_type"), " ").getItem(0))
        .groupBy("p_brand", "type_prefix")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
             F.max("p_size").alias("max_size"))
    )


def q_classification_report(spark, sf):
    """A13 classification report (precision/recall/F1/support per class) over
    embeddings labels vs a deterministic synthetic prediction."""
    from fastdup_spark.operators.labels import classification_report

    e = _t(spark, sf, "embeddings")
    pred = e.select(F.col("label").cast("long").alias("label"),
                    (F.col("vec_id") % 10).cast("long").alias("prediction"))
    return classification_report(pred).withColumnRenamed("class", "clazz")


def q_pagerank(spark, sf):
    """A15 PageRank, fully oracle-checked: 3 fixed power iterations (tol=0
    forces all rounds) over the deterministic customer->nation->region
    hierarchy graph (node spaces offset so ids never collide). DuckDB
    replays the identical trajectory with unrolled CTEs."""
    from fastdup_spark.operators.pagerank import pagerank

    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"))
    n = _t(spark, sf, "nation").select(
        (F.col("n_nationkey") + 1000000).alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"))
    edges = c.unionByName(n)
    return pagerank(edges, max_iter=3, tol=0.0).select("doc_id", "pagerank")


def q_label_majority_vote(spark, sf):
    """A5 top_k_label majority vote: dominant order priority per customer."""
    from fastdup_spark.operators.labels import top_k_label

    o = _t(spark, sf, "orders").filter(F.col("o_custkey") < 300)
    pairs = o.select(F.col("o_custkey").alias("src"),
                     F.col("o_orderpriority").alias("label2"))
    return top_k_label(pairs, min_count=3)


# --------------------------------------------------------------------------
# non-SQL-expressible (rows-only driver check; pytest oracles in tests/)
# --------------------------------------------------------------------------

def q_near_dup_pairs(spark, sf):
    """THE core contract, oracle-checked end-to-end: the MinHash->LSH->exact-
    verify pipeline's edge set must equal DuckDB's brute-force exact 9-gram
    Jaccard pairs >= threshold. LSH is an optimization, not an
    approximation, at this recall point (32 bands x 4 rows misses a J=0.85
    pair with p ~ 6e-11), so the outputs are identical — any dropped or
    extra pair is a hash-mismatch here."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.plans.pipeline import near_dup_pipeline

    docs = _t(spark, sf, "documents")
    # both sides exclude docs whose NORMALIZED text is empty (punctuation/
    # whitespace-only) — the oracle's gram model is undefined for them
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    docs = docs.filter(norm != "")
    res = near_dup_pipeline(docs, PipelineConfig())
    return res["edges"].select(
        "src", "dst", F.round("jaccard", 6).alias("jaccard"))


def q_gopher_rules(spark, sf):
    """Gopher quality filters (Rae et al. 2021, published Table A1): per-doc
    word/length bounds, symbol/bullet/ellipsis ratios, alpha + stopword
    floors, conjunctive passes verdict. Pure JVM expressions."""
    from fastdup_spark.operators.textql import gopher_quality_expr

    d = _t(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    return (
        d.select("doc_id", gopher_quality_expr(F.col("text")).alias("_g"))
        .select("doc_id", "_g.*")
    )


def q_repetition_scores(spark, sf):
    """Within-doc repetition (Rae et al. 2021 repetition filters): fraction
    of 3-gram occurrences that repeat an earlier 3-gram."""
    from fastdup_spark.operators.textql import dup_ngram_fraction_expr

    d = _t(spark, sf, "documents").filter(F.trim(F.col("text")) != "")
    return (
        d.select("doc_id", dup_ngram_fraction_expr(F.col("text"), 3).alias("_r"))
        .select("doc_id", "_r.*")
    )


def q_search_many(spark, sf):
    """Batched set-vs-corpus search (the reference's search run mode is
    set-vs-set: every query row lands in search.csv,
    /root/reference/fastdup/__init__.py:2162-2238, RUN.md:189-192):
    queries = documents with doc_id % 7 == 1, probed against the full
    corpus bucket index in ONE job. At the >= threshold regime LSH
    candidate generation is exhaustive (same 6e-11 miss-probability
    argument as near_dup_pairs), so the DuckDB gram brute force restricted
    to the query set is an exact oracle, ranks included."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.functions.signatures import with_signatures
    from fastdup_spark.operators.lsh import band_buckets
    from fastdup_spark.plans.pipeline import search_corpus

    cfg = PipelineConfig()
    d = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    d = d.filter(norm != "")
    sigs = with_signatures(d, cfg).select(
        "doc_id", "minhash", "shingles").localCheckpoint(eager=True)
    buckets = band_buckets(sigs, cfg.lsh_bands, cfg.lsh_rows)
    queries = d.filter(F.col("doc_id") % 7 == 1).select(
        F.col("doc_id").alias("query_id"), "text")
    # the queries are a slice of the already-signatured corpus: reuse
    # their rows from the checkpointed sigs instead of a second UDF pass
    # (identical signatures by determinism — r07 optimization)
    qsigs = sigs.filter(F.col("doc_id") % 7 == 1) \
        .select(F.col("doc_id").alias("query_id"), "minhash", "shingles")
    return search_corpus(queries, sigs, buckets, cfg, k=10,
                         threshold=cfg.threshold, exclude_self=True,
                         query_sigs=qsigs)


def q_minhash_lsh_dedup(spark, sf):
    """Full MinHash->LSH->verify->CC near-dup pipeline over documents —
    now ORACLE-CHECKED end-to-end (was rows-only): DuckDB recomputes the
    brute-force exact-Jaccard edge set (same CTEs as near_dup_pairs) and
    resolves components with a recursive label-flood CTE; component_id =
    min doc_id on both engines (operators/cc.py determinism contract).
    Docs with empty NORMALIZED text are excluded on both sides (the
    oracle's gram model is undefined for them, as in near_dup_pairs)."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.plans.pipeline import near_dup_pipeline

    docs = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    docs = docs.filter(norm != "")
    res = near_dup_pipeline(docs, PipelineConfig())
    return (
        res["assignments"].groupBy("component_id")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= 2)
    )


def q_review_override_components(spark, sf):
    """Human-review override algebra (plans/review.py override_edges — the
    text analog of the reference's CVAT annotation loop,
    /root/reference/fastdup/cvat.py) oracle-checked end-to-end: the
    near-dup edge set gets a deterministic simulated review — REJECTED:
    edges whose endpoints agree mod 7 (a stand-in for human false-positive
    calls); CONFIRMED: adjacent-by-doc_id pairs where src % 13 == 0 (human
    false-negative catches, scored below threshold or never candidates) —
    then components re-resolve over the corrected edge set. DuckDB
    reproduces the identical algebra over its brute-force exact-Jaccard
    edge set plus the recursive label-flood CC (component_id = min doc_id
    on both engines; both use sign-of-dividend %, so the mod predicates
    agree on negative ids)."""
    from pyspark.sql import Window

    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.operators.cc import connected_components
    from fastdup_spark.plans.pipeline import near_dup_pipeline
    from fastdup_spark.plans.review import override_edges

    cfg = PipelineConfig()
    docs = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    docs = docs.filter(norm != "")
    res = near_dup_pipeline(docs, cfg)
    auto = res["pairs"].filter(F.col("jaccard") >= cfg.cc_threshold) \
        .select("src", "dst")
    rejected = auto.filter(F.col("src") % 7 == F.col("dst") % 7)
    confirmed = (
        docs.select("doc_id")
        .withColumn("nxt", F.lead("doc_id").over(Window.orderBy("doc_id")))
        .filter(F.col("nxt").isNotNull() & (F.col("doc_id") % 13 == 0))
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
    )
    edges = override_edges(auto, rejected, confirmed)
    asg = connected_components(edges, vertices=docs.select("doc_id"))
    return (
        asg.groupBy("component_id").agg(F.count("*").alias("count"))
        .filter(F.col("count") >= 2)
    )


def q_doc_best_neighbor(spark, sf):
    """W1 (best neighbor per doc) over the REAL text near-dup graph — the
    operator behind the outlier stage, oracle-checked on pipeline output:
    the edge set equals brute force at this recall point (the near_dup_pairs
    6e-11 miss-probability argument), so DuckDB's window over its
    brute-force pair set is an exact oracle. Jaccard is rounded to 6 BEFORE
    the top-1 window on both engines so tie-breaks agree."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.operators.knn import best_nn_per_query
    from fastdup_spark.plans.pipeline import near_dup_pipeline

    docs = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    docs = docs.filter(norm != "")
    res = near_dup_pipeline(docs, PipelineConfig())
    edges = res["edges"].select(
        "src", "dst", F.round("jaccard", 6).alias("jaccard"))
    bn = best_nn_per_query(edges, sim_col="jaccard")
    return bn.select("doc_id", F.col("nn").alias("best_nn"),
                     F.col("sim").alias("best_sim"))


def q_dedup_survivors(spark, sf):
    """W4 keep-one-per-component decision table (the write_deduped /
    remove_duplicates policy) over the REAL near-dup components — the drop
    list is every non-min member of a >=2 component; DuckDB resolves the
    same components with the recursive label-flood CTE (component_id = min
    doc_id on both engines)."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.operators.dedup import duplicates_to_drop
    from fastdup_spark.plans.pipeline import near_dup_pipeline

    docs = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    docs = docs.filter(norm != "")
    res = near_dup_pipeline(docs, PipelineConfig())
    return duplicates_to_drop(res["assignments"])


def q_dedup_survivors_longest(spark, sf):
    """The keep-longest survivor policy (operators/dedup.py
    keep_best_policy — the common LLM-pipeline choice) over the same
    real near-dup components as dedup_survivors: drop list = every
    member that is NOT the longest text of its >=2 component (ties ->
    min doc_id). DuckDB resolves the identical components with the
    recursive label-flood CTE and replays the keep-longest window."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.operators.dedup import duplicates_to_drop
    from fastdup_spark.plans.pipeline import near_dup_pipeline

    docs = _t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    docs = docs.filter(norm != "")
    res = near_dup_pipeline(docs, PipelineConfig())
    scores = docs.select("doc_id", F.length("text").alias("score"))
    return duplicates_to_drop(res["assignments"], scores=scores)


# The simhash oracles (round-5 verdict #4): DuckDB cannot reproduce Spark's
# xxhash64 shingle hashes, but it CAN reproduce the bit vote and Hamming
# blocking from the SAME uint64s — so the Spark queries dump their shingle
# hash stream (the simhash UDF's exact input) to this parquet, and the
# oracle recomputes the fingerprints with pure SQL bit arithmetic over it.
# Driver ordering guarantees the dump exists: each oracle runs right after
# its own Spark query. Dumps live in a per-user 0700 dir (same hazard
# class the lcs_native cache fixed: fixed world-shared /tmp names invite
# cross-user EACCES collisions and concurrent-run clobbering).
def _dump_dir() -> str:
    import tempfile

    d = os.path.join(tempfile.gettempdir(), f"fdspark-{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    return d


_SIMHASH_DUMP = os.path.join(_dump_dir(), "simhash_dump.parquet")


def _write_simhash_dump(spark, sf):
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.functions.signatures import (
        normalize_tokens_expr, shingles_expr,
    )
    cfg = PipelineConfig()
    d = _t(spark, sf, "documents")
    (d.withColumn("tokens", normalize_tokens_expr(F.col("text")))
      .withColumn("shingles", shingles_expr(F.col("tokens"), cfg.shingle_k))
      .select("doc_id",
              F.coalesce(F.size("shingles"), F.lit(0)).alias("n"),
              F.explode_outer("shingles").alias("h"))
      .write.mode("overwrite").parquet(_SIMHASH_DUMP))


def q_simhash_fingerprints(spark, sf):
    """SimHash 64-bit fingerprints (numpy pandas UDF). Dumps the shingle
    hash stream so the DuckDB oracle can replay the bit vote (see
    _SIMHASH_DUMP)."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.functions.signatures import (
        make_simhash_udf, normalize_tokens_expr, shingles_expr,
    )
    cfg = PipelineConfig()
    _write_simhash_dump(spark, sf)
    d = _t(spark, sf, "documents")
    sh = make_simhash_udf()
    return (
        d.withColumn("tokens", normalize_tokens_expr(F.col("text")))
        .withColumn("shingles", shingles_expr(F.col("tokens"), cfg.shingle_k))
        .select("doc_id", sh("shingles").alias("simhash"))
    )


def q_simhash_near_dup(spark, sf):
    """SimHash banding dedup (Manku et al. WWW'07): block equi-join +
    hamming verify + CC over documents. Oracle-checked end to end: the
    banding is exhaustive at hamming <= max_hamming (pigeonhole; no
    salting at this scale), so the DuckDB oracle's brute-force hamming
    join over the replayed fingerprints must produce the identical
    component histogram."""
    from fastdup_spark.config import PipelineConfig
    from fastdup_spark.functions.signatures import (
        make_simhash_udf, normalize_tokens_expr, shingles_expr,
    )
    from fastdup_spark.operators.simhash_dedup import simhash_near_dup

    cfg = PipelineConfig()
    _write_simhash_dump(spark, sf)
    d = _t(spark, sf, "documents")
    sh = make_simhash_udf()
    # fingerprints from the classic shingles_expr stream — the SAME hash
    # stream the oracle dump replays (the with_signatures fast path uses a
    # different k-gram combine, so its hash VALUES differ even though its
    # dedup behavior is equivalent; tests/test_signatures pins that)
    sigs = (
        d.withColumn("tokens", normalize_tokens_expr(F.col("text")))
        .withColumn("shingles", shingles_expr(F.col("tokens"), cfg.shingle_k))
        .select("doc_id", sh("shingles").alias("simhash"))
    )
    res = simhash_near_dup(sigs, max_hamming=3, bands=4)
    return (
        res["assignments"].groupBy("component_id")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= 2)
    )


# The ann_cosine_lsh oracle (round-6, closes the last rows-only row): the
# hyperplane matrix is deterministic in (dim, n_planes, n_bands, seed) and
# both engines compute DOUBLE dot products, so DuckDB can replay the sign
# buckets, the multiprobe XOR fan-out, and the rounded-cosine re-rank from
# a dump of the planes alone. Sign robustness is empirical and wide: at
# sf0.01 the smallest |dot| is ~9e-5 vs ~1e-15 cross-engine summation
# noise. Driver ordering guarantees the dump exists (oracle runs right
# after its own Spark query, same as _SIMHASH_DUMP).
_LSH_PLANES_DUMP = os.path.join(_dump_dir(), "lsh_planes.parquet")
_LSH_N_PLANES, _LSH_N_BANDS, _LSH_SEED = 5, 8, 7


def _write_lsh_planes_dump(dim: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastdup_spark.operators.knn import _plane_sets

    planes = _plane_sets(dim, _LSH_N_PLANES, _LSH_N_BANDS, _LSH_SEED)
    bands, pls, ws = [], [], []
    for b in range(_LSH_N_BANDS):
        for p in range(_LSH_N_PLANES):
            bands.append(b)
            pls.append(p)
            ws.append(planes[b, :, p].tolist())
    pq.write_table(
        pa.table({"band": pa.array(bands, pa.int32()),
                  "plane": pa.array(pls, pa.int32()),
                  "w": pa.array(ws, pa.list_(pa.float64()))}),
        _LSH_PLANES_DUMP)


def q_url_canonical_dedup(spark, sf):
    """URL-canonicalization dedup (operators/urls.py) — the cheapest tier
    of a webtext dedup cascade (CCNet/RefinedWeb dedup by canonical URL
    before content dedup). The testdata has no URL column, so the query
    derives a deterministic noisy URL per document (case noise, default
    port, trailing slash, tracking params, fragments — all keyed on
    doc_id residues, identical expressions in both engines), canonicalizes
    it with the production expression, and groups. The oracle replays the
    canonicalization verbatim in DuckDB — possible because
    canonical_url_expr is regex-capture-group-free by design."""
    from fastdup_spark.operators.urls import canonical_url_expr

    d = _t(spark, sf, "documents")
    m = lambda n: (F.col("doc_id") % n).cast("string")  # noqa: E731
    url = F.concat(
        F.lit("HTTPS://"), F.upper(F.col("source")), F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"), m(40),
        F.when(F.col("doc_id") % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("?utm_source=feed&id="), m(7)))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("?id="), m(7), F.lit("&utm_campaign=x")))
        .when(F.col("doc_id") % 5 == 2, F.lit("#frag"))
        .otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", canonical_url_expr(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") >= 2)
    )


def q_dedup_cascade(spark, sf):
    """Tiered dedup cascade (operators/cascade.py): canonical-URL revisit
    dedup -> exact content-hash dedup -> MinHash/LSH/verify/CC near-dup —
    the CCNet/RefinedWeb production shape, each tier feeding only its
    survivors to the next. Oracle-checked END TO END: DuckDB replays the
    full URL canonicalization, the keep-newest window, the text-equality
    window, the brute-force exact-Jaccard edge set and the recursive
    label-flood CC over the same derived inputs, and must produce the
    identical (doc_id, tier, kept_by) decision table.

    Input = documents + planted exact-dup mirrors (ids +10M). URLs/fetch
    timestamps are derived deterministically from doc_id (the testdata has
    no URL column): docs with doc_id % 11 == 0 form planted revisit groups
    under canonicalization noise (case, :443, trailing slash, utm-only
    query, fragment); everyone else gets a unique path (plus stripped
    tracking params for %5==1). fetch_ts = doc_id % 89, newest wins, ties
    to the smallest id."""
    from fastdup_spark.operators.cascade import dedup_cascade

    d = _docs_with_planted_dups(spark, sf)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[.,!?;:]", ""), r"\s+", " "))
    d = d.filter(norm != "")
    i = F.col("doc_id")
    url = F.when(
        i % 11 == 0,
        F.concat(
            F.lit("HTTPS://Archive.Example.COM"),
            F.when(i % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/r/"), (i % 23).cast("string"),
            F.when(i % 2 == 1, F.lit("/")).otherwise(F.lit("")),
            F.when(i % 5 == 0, F.lit("?utm_source=f"))
            .when(i % 5 == 2, F.lit("#frag")).otherwise(F.lit("")))
    ).otherwise(
        F.concat(
            F.lit("https://site"), (i % 13).cast("string"),
            F.lit(".example.com/d/"), i.cast("string"),
            F.when(i % 5 == 1,
                   F.concat(F.lit("?id="), (i % 7).cast("string"),
                            F.lit("&utm_campaign=x")))
            .otherwise(F.lit(""))))
    pages = d.select("doc_id", "text", url.alias("url"),
                     (i % 89).alias("fetch_ts"))
    res = dedup_cascade(pages, url_col="url", ts_col="fetch_ts")
    return res["decisions"]


def q_host_cap_filter(spark, sf):
    """RefinedWeb-style per-host cap (operators/urls.py cap_per_host):
    keep the 20 newest fetches per host, report everything beyond the
    cap. URLs derived deterministically from doc_id with scheme-case and
    port noise so the oracle replays host_expr's substring splits
    verbatim (no regex capture groups)."""
    from fastdup_spark.operators.urls import cap_per_host

    d = _t(spark, sf, "documents")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.lit("Site"), (i % 13).cast("string"), F.lit(".Example.com"),
        F.when(i % 7 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/d/"), i.cast("string"))
    pages = d.select("doc_id", url.alias("url"), (i % 89).alias("fetch_ts"))
    res = cap_per_host(pages, 20, ts_col="fetch_ts", id_col="doc_id")
    return res["drop_list"]


def q_ann_cosine_lsh(spark, sf):
    """Multi-band multiprobe hyperplane-LSH ANN top-k (scale path; brute
    force is the SQL-checked baseline q_cosine_to_query). 8 bands x 5 planes
    + 1-bit multiprobe: recall ~0.98 vs brute force on this near-isotropic
    testdata (tests/test_ann.py). Sign-LSH candidate cost is n^rho
    (rho=ln p1/ln p2 ~ 0.76 at cos 0.3), so n_planes should grow with
    log2(n) at scale; this config is tuned for the driver's sf.
    Oracle-checked end to end (round 6): dumps the deterministic plane
    matrix so DuckDB replays buckets + probes + rounded-cosine top-k; the
    cosine is rounded to 3 BEFORE the cut in both engines (same device as
    q_ann_cosine_ivf) so the k-boundary is identical."""
    from fastdup_spark.operators.knn import cosine_topk_lsh, hyperplane_buckets

    e = _t(spark, sf, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).first()["embedding"]
    _write_lsh_planes_dump(len(qv))
    bucketed = hyperplane_buckets(e.filter(F.col("vec_id") != 0),
                                  n_planes=_LSH_N_PLANES, n_bands=_LSH_N_BANDS,
                                  seed=_LSH_SEED)
    return cosine_topk_lsh(bucketed, qv, n_planes=_LSH_N_PLANES,
                           n_bands=_LSH_N_BANDS, seed=_LSH_SEED, k=10,
                           round_to=3)


_KMEANS_CACHE: dict = {}


def _kmeans_fit_cached(spark, sf, k=8, n_iter=2):
    """The kmeans + IVF queries share one fit: the Lloyd loop runs
    driver-side collects per round, so rerunning it per query doubled the
    cost of every driver/bench pass. The checkpointed assignments frame
    and the collected centroid rows are memoized per (sf, k, n_iter) for
    the life of the process."""
    from fastdup_spark.operators.kmeans import kmeans_fit

    key = (sf, k, n_iter)
    if key not in _KMEANS_CACHE:
        e = _t(spark, sf, "embeddings")
        fit = kmeans_fit(e, k=k, n_iter=n_iter)
        _KMEANS_CACHE[key] = {
            "assignments": fit["assignments"].localCheckpoint(eager=True),
            "centroids": fit["centroids"].collect(),
        }
    return _KMEANS_CACHE[key]


def _kmeans_assignments_cached(spark, sf, k=8, n_iter=2):
    return _kmeans_fit_cached(spark, sf, k, n_iter)["assignments"]


def q_kmeans_assignments(spark, sf):
    """A14 KMeans full contract: per-item (vec_id, cluster, distance) —
    kmeans_assignments.csv analog (/root/reference/fastdup/definitions.py:19).
    Deterministic Lloyd's (init = 8 smallest vec_ids, 2 rounds) so DuckDB
    replays the identical trajectory."""
    return _kmeans_assignments_cached(spark, sf)


def q_kmeans_centroid_stats(spark, sf):
    """A14 KMeans centroid table analog (kmeans_centroids.csv,
    definitions.py:17): per-cluster size + mean assignment distance."""
    asg = _kmeans_assignments_cached(spark, sf)
    return asg.groupBy("cluster").agg(
        F.count("*").alias("size"),
        F.round(F.avg("distance"), 4).alias("avg_dist"))


def q_ann_cosine_ivf(spark, sf, nprobe=3, k=10):
    """IVF ANN probe, fully oracle-checked: the shared deterministic KMeans
    fit is the coarse quantizer (its assignments are the inverted lists and
    are themselves oracle-green), the query (vec_id=0) probes its `nprobe`
    nearest centroids (squared distance rounded to 6 so the list choice is
    stable across float summation orders, ties to the lowest list), and
    the exact cosine ranks only those lists' members. Deterministic end to
    end -> DuckDB replays the identical trajectory (the hyperplane-LSH
    probe ann_cosine_lsh is replayed the same way from its plane dump).
    Cosine rounded to 3 in BOTH engines BEFORE the top-k so the cut is
    identical."""
    from fastdup_spark.functions.similarity import cosine_expr
    from fastdup_spark.operators.knn import probe_lists

    fit = _kmeans_fit_cached(spark, sf)
    e = _t(spark, sf, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).first()["embedding"]
    lists = probe_lists(fit["centroids"], qv, nprobe=nprobe)
    q = F.array(*[F.lit(float(x)) for x in qv])
    members = fit["assignments"] \
        .filter(F.col("cluster").isin(lists) & (F.col("vec_id") != 0))
    return (
        members.join(e.select("vec_id", "embedding"), "vec_id")
        .select("vec_id",
                (F.round(cosine_expr(F.col("embedding").cast("array<double>"),
                                     q), 3) + F.lit(0.0)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def q_semdedup(spark, sf, threshold=0.35):
    """SemDeDup semantic dedup (operators/semdedup.py — Abbas et al. 2023):
    the shared deterministic KMeans fit partitions the embedding space,
    near-dup edges are resolved ONLY within a cluster (cosine rounded to 3
    BEFORE the threshold in both engines), duplicate groups come from CC
    (component_id = min vec_id), and exactly one member per group survives —
    the one FARTHEST from its cluster centroid (distance rounded to 4),
    ties to the smallest id. Fully oracle-checked: DuckDB replays the
    unrolled Lloyd trajectory, the within-cluster brute-force cosine edges,
    a recursive label-flood CC and the same keep-one window."""
    from fastdup_spark.operators.semdedup import semdedup_decisions

    fit = _kmeans_fit_cached(spark, sf)
    e = _t(spark, sf, "embeddings")
    return semdedup_decisions(fit["assignments"], e, threshold)["decisions"]


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# --- webtext cleaning / decontamination / mixing tier (round 6 late) ------

def _did(c="doc_id"):
    return F.col(c).cast("string")


def q_pii_scrub(spark, sf):
    """PII redaction (operators/pii.py — Dolma/RedPajama-style regex scrub):
    emails/IPv4/phones counted on the original text and replaced in order
    with digit-free tokens. PII is PLANTED deterministically from doc_id
    (the corpus is synthetic word salad) with the same expression DuckDB
    rebuilds, so counts are non-vacuous and clean_text hashes must match."""
    from fastdup_spark.operators.pii import scrub_pii

    d = _t(spark, sf, "documents")
    doc = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(doc % 3 == 0, F.concat(
            F.lit(" contact user"), _did(), F.lit("@mail.example.com now"))
        ).otherwise(F.lit("")),
        F.when(doc % 5 == 0, F.concat(
            F.lit(" call 415-555-"),
            F.lpad(F.pmod(doc, F.lit(10000)).cast("string"), 4, "0"))
        ).otherwise(F.lit("")),
        F.when(doc % 7 == 0, F.concat(
            F.lit(" from 10."), F.pmod(doc, F.lit(256)).cast("string"),
            F.lit(".0."), F.pmod(doc * 7, F.lit(256)).cast("string"),
            F.lit(" end"))
        ).otherwise(F.lit("")),
    )
    return scrub_pii(d.select("doc_id", dirty.alias("text")))


def q_c4_line_filter(spark, sf):
    """C4 line-level cleaning (operators/cleaning.py — Raffel et al. 2020
    §2.2): terminal-punctuation + >=5-word lines kept, javascript lines
    dropped, pages with 'lorem ipsum'/'{' or <3 kept lines flagged dead.
    Line structure is derived deterministically from the corpus with an
    expression DuckDB rebuilds verbatim; clean_text hashes must match."""
    from fastdup_spark.operators.cleaning import c4_clean

    d = _t(spark, sf, "documents")
    doc = F.col("doc_id")
    code_line = F.when(doc % 11 == 0, F.lit("var cfg = { mode: 1 };")) \
        .otherwise(F.lit("All rights reserved by this site today."))
    tail_line = F.when(doc % 13 == 0, F.lit(
        "Lorem ipsum dolor sit amet and so forth today.")) \
        .otherwise(F.concat(F.lit("Final line for doc "), _did(),
                            F.lit(" is properly terminated!")))
    dirty = F.concat_ws(
        "\n",
        F.lit("Home | About | Contact"),
        F.lit("Please enable javascript to continue."),
        F.concat(F.lit("Report "), F.substring(F.col("text"), 1, 90),
                 F.lit(" end of this section.")),
        F.lit("Too short."),
        F.concat(F.substring(F.col("text"), 91, 70),
                 F.lit(" with no terminal punct")),
        code_line,
        tail_line,
    )
    return c4_clean(d.select("doc_id", dirty.alias("text")))


def q_blocklist_filter(spark, sf):
    """Word-blocklist audit (operators/cleaning.py — RefinedWeb/C4 bad-words
    pass): exact whitespace-token membership against a fixed list; two of
    the words exist in the corpus vocabulary, two never occur."""
    from fastdup_spark.operators.cleaning import blocklist_flags

    d = _t(spark, sf, "documents")
    return blocklist_flags(d.select("doc_id", "text"),
                           ["casino", "customer", "jackpot", "stream"])


def q_ngram_decontamination(spark, sf):
    """GPT-3-style n-gram decontamination (operators/crossset.py — Brown et
    al. 2020 App. C): a train doc is contaminated if it shares any word
    8-gram with the eval set. Eval grams are words 3..10 of every 37th doc
    (a PARTIAL-overlap probe — the exact/near-dup decontamination query
    cannot catch a single quoted sentence; this one must)."""
    from fastdup_spark.operators.crossset import ngram_overlap_contamination

    d = _t(spark, sf, "documents")
    w = _tokens(F.col("text"))
    ev = (
        d.filter((F.col("doc_id") % 37 == 0) & (F.size(w) >= 10))
        .select(F.concat_ws(" ", F.slice(w, 3, 8)).alias("gram"))
    )
    return ngram_overlap_contamination(
        d.select("doc_id", "text"), ev, n=8)


def q_bpe_token_counts(spark, sf):
    """GPT-2-style pre-tokenizer accounting (operators/textql.py —
    lookahead-free gpt2 regex, identical in Java regex and RE2):
    pre-token / non-space-token / distinct-token counts per doc. A
    contraction + digits + punctuation tail is planted deterministically
    so the splitter's interesting branches are exercised at every sf."""
    from fastdup_spark.operators.textql import gpt2_pretokens_expr

    d = _t(spark, sf, "documents")
    dirty = F.concat(F.col("text"), F.lit(" it's doc "), _did(),
                     F.lit(", ok!"))
    toks = gpt2_pretokens_expr(dirty)
    # regex whitespace test (trim strips only spaces; runs can be \t/\n)
    nonspace = F.filter(toks,
                        lambda x: F.regexp_replace(x, r"\s+", "") != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_pretokens"),
        F.size(nonspace).alias("n_tokens"),
        F.size(F.array_distinct(nonspace)).alias("n_distinct_tokens"),
    )


def q_lang_quota_sample(spark, sf):
    """Per-language quota sampling (operators/sampling.py — data-mixing
    quotas): keep 40 docs per lang ordered by md5(doc_id) so the pick is a
    reproducible sample, not a head; rk is the in-quota position."""
    from fastdup_spark.operators.sampling import quota_sample

    d = _t(spark, sf, "documents")
    return quota_sample(d.select("doc_id", "lang"), "lang", 40,
                        rank_col="rk")


def q_hash_rate_sample(spark, sf):
    """Stateless hash-rate sampling (operators/sampling.py): keep ~20% of
    docs iff substr(md5('s1:'||doc_id),1,8) sorts below the rate threshold.
    Zero shuffle — the 100-TB mixing path (plan pinned shuffle-free in
    tests/test_sampling.py)."""
    from fastdup_spark.operators.sampling import hash_rate_sample

    d = _t(spark, sf, "documents")
    return hash_rate_sample(d.select("doc_id", "lang"), 0.2, salt="s1:")


def q_lm_perplexity(spark, sf):
    """CCNet-style LM quality scoring (operators/lm.py — Wenzek et al.
    2020): a unigram LM with add-one-smoothed UNK is trained on the
    doc_id % 7 == 0 reference slice (the 'Wikipedia' stand-in), vocab
    capped at 500 so truncation + the OOV path are exercised at every
    sf, then every document is scored. Per-token log-probs are integer
    micro-nats so the per-doc sum is partitioning-independent; only the
    display ppl re-enters float land (rounded 2dp in both engines)."""
    from fastdup_spark.operators.lm import score_perplexity, train_unigram_lm

    d = _t(spark, sf, "documents")
    lm = train_unigram_lm(d.filter(F.col("doc_id") % 7 == 0),
                          vocab_size=500)
    return score_perplexity(d.select("doc_id", "text"), lm)


def q_dsir_selection(spark, sf):
    """DSIR data selection (operators/dsir.py — Xie et al. 2023): target
    LM on the doc_id % 7 == 0 slice, raw LM on the whole corpus (both
    vocab-capped at 500 so the OOV path fires), every doc weighted by
    the integer micro-nat log-likelihood ratio, top-100 head-cut with
    the md5 tie-break. DuckDB replays both LM fits, the per-token ratio
    sum and the ranked cut verbatim."""
    from fastdup_spark.operators.dsir import dsir_select, fit_dsir

    d = _t(spark, sf, "documents")
    t_lm, r_lm = fit_dsir(d.filter(F.col("doc_id") % 7 == 0), d,
                          vocab_size=500)
    return dsir_select(d.select("doc_id", "text"), t_lm, r_lm, n=100)


# Dolma-style Bloom history dedup (operators/bloom.py): the oracle replays
# the bitmap's verdict as pure set logic over a dump of the per-doc probe
# positions (JVM xxhash64 DuckDB can't compute) — maybe_seen iff ALL k
# positions appear in the inserted-position set. Same driver-ordering
# guarantee as _SIMHASH_DUMP: the dump is written by the Spark query.
_BLOOM_DUMP = os.path.join(_dump_dir(), "bloom_positions.parquet")


def q_bloom_novelty(spark, sf):
    """Bloom novelty check against a historical corpus (operators/bloom.py —
    Dolma-style, Soldaini et al. 2024): the even-doc_id half of documents is
    compressed ONCE into a broadcast bitmap; every document then probes it
    map-side (no join, no shuffle of the history). No false negatives by
    construction — every even doc must flag maybe_seen; odd docs flag only
    on full k-position collisions at the sized ~1% fpp. Fully deterministic
    (JVM xxhash64 positions), so DuckDB replays the exact verdict from the
    position dump."""
    from fastdup_spark.operators.bloom import (
        build_bloom, positions_expr, probe_bloom,
    )

    d = _t(spark, sf, "documents").filter(F.col("text").isNotNull())
    hist = d.filter(F.col("doc_id") % 2 == 0)
    model = build_bloom(hist, "text", fpp=0.01)
    (d.select(
        "doc_id",
        F.explode(positions_expr("text", model.n_bits,
                                 model.n_hashes)).alias("p"))
      .write.mode("overwrite").parquet(_BLOOM_DUMP))
    return probe_bloom(d, model, "text").select("doc_id", "maybe_seen")


_BLOOM_PARA_DUMP = os.path.join(_dump_dir(), "bloom_para_positions.parquet")


def q_bloom_paragraph_scrub(spark, sf):
    """Dolma paragraph-mode history dedup (operators/bloom.py
    paragraph_bloom_scrub): documents are rebuilt as three paragraphs (a
    boilerplate header shared by every doc, an 80-char body slice, a
    per-doc unique tail); the even-doc_id half is the history. The scrub
    must drop the boilerplate paragraph EVERYWHERE and redeliver even
    docs as empty rewrites, while odd docs keep their unique paragraphs
    (minus ~fpp collateral and cross-doc duplicate body slices — both
    deterministic). DuckDB rebuilds the same dirty text, splits it, joins
    the per-paragraph verdict replayed from the position dump, and
    reassembles with an ordered string_agg."""
    from fastdup_spark.operators.bloom import (
        _paragraphs, build_paragraph_bloom, paragraph_bloom_scrub,
        positions_expr,
    )

    d = _t(spark, sf, "documents")
    dirty = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("subscribe to our newsletter for updates"),
            F.substring(F.col("text"), 1, 80),
            F.concat(F.lit("unique tail for document "), _did()),
        ).alias("text"))
    hist = dirty.filter(F.col("doc_id") % 2 == 0)
    model = build_paragraph_bloom(hist, fpp=0.01)
    (_paragraphs(dirty, "text", "doc_id", "\n")
     .select("doc_id", "pos",
             F.explode(positions_expr("para", model.n_bits,
                                      model.n_hashes)).alias("p"))
     .write.mode("overwrite").parquet(_BLOOM_PARA_DUMP))
    return paragraph_bloom_scrub(dirty, model)


_BLOOM_SPAN_DUMP = os.path.join(_dump_dir(), "bloom_span_positions.parquet")


def q_bloom_span_scrub(spark, sf):
    """ExactSubstr-vs-HISTORY (operators/bloom.py span_bloom_scrub):
    Dolma's Bloom trick at Lee et al. span granularity — history-seen
    >=8-token runs erased from every doc without joining the history.
    Plant: each even doc contributes its first-30-token prefix + a
    unique tail; its odd partner carries the SAME prefix shifted by two
    pad tokens. History = even docs, so redelivered even docs scrub to
    empty and odd docs lose exactly the shifted shared run. DuckDB
    replays the verdicts as set logic over the dumped window-probe
    positions, then re-derives span merge, coverage, reassembly and the
    kill rule from the rebuilt text."""
    from fastdup_spark.operators.bloom import (
        _kgram_hashes, build_kgram_bloom, positions_expr, span_bloom_scrub,
    )

    d = _t(spark, sf, "documents")
    w0 = _tokens(F.col("text"))
    ev = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.concat_ws(" ", F.slice(w0, 1, 30)).alias("pref"))
    even_dirty = ev.select(
        "doc_id",
        F.concat_ws(" ", F.col("pref"),
                    F.concat(F.lit("u"), F.col("doc_id").cast("string"))
                    ).alias("text"))
    odd_ids = d.select("doc_id").filter(F.col("doc_id") % 2 == 1)
    odd_dirty = (
        ev.select((F.col("doc_id") + 1).alias("doc_id"), "pref")
        .join(odd_ids, "doc_id")
        .select("doc_id",
                F.concat_ws(" ", F.lit("pad1 pad2"), F.col("pref"),
                            F.concat(F.lit("u"),
                                     F.col("doc_id").cast("string"))
                            ).alias("text")))
    dirty = even_dirty.unionByName(odd_dirty)
    hist = dirty.filter(F.col("doc_id") % 2 == 0)
    model = build_kgram_bloom(hist, k=8, fpp=0.01)
    (_kgram_hashes(dirty, 8, "text", "doc_id")
     .select("doc_id", "start",
             F.explode(positions_expr("gk", model.n_bits,
                                      model.n_hashes)).alias("p"))
     .write.mode("overwrite").parquet(_BLOOM_SPAN_DUMP))
    return span_bloom_scrub(dirty, model, k=8)


# UniMax mixing (operators/mixing.py): the integer water-fill allocation is
# pytest-gold-covered; the dump carries (lang, rate_ppm) so DuckDB re-derives
# the identical 8-hex keep threshold with pure integer arithmetic and
# replays the md5 filter row-for-row.
_MIX_DUMP = os.path.join(_dump_dir(), "mix_rates.parquet")


def q_unimax_mix(spark, sf):
    """UniMax data mixing (operators/mixing.py — Chung et al. 2023): the
    budget (80% of the corpus) spreads as uniformly as possible over
    languages under a 1-epoch cap, so every low-resource lang saturates
    (rate_ppm = 1e6, the keep-all sentinel) and the leftover floods into
    the head lang at a fractional ppm rate. Allocation is driver-side
    exact integer water-filling over the tiny lang-count table; the
    application is a broadcast threshold join + shuffle-free md5 filter.
    DuckDB replays the threshold derivation and the filter from the ppm
    dump — both CASE branches exercised at every sf."""
    from fastdup_spark.operators.mixing import (
        group_sizes, rates_ppm, unimax_allocation,
    )

    d = _t(spark, sf, "documents").select("doc_id", "lang")
    sizes = group_sizes(d, "lang")
    total = (sum(sizes.values()) * 8) // 10
    ppm = rates_ppm(unimax_allocation(sizes, total), sizes)
    spark.createDataFrame(sorted(ppm.items()),
                          "lang string, rate_ppm long") \
        .coalesce(1).write.mode("overwrite").parquet(_MIX_DUMP)
    from fastdup_spark.operators.mixing import apply_mix
    return apply_mix(d, ppm, "lang").select("doc_id", "lang", "rate_ppm")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # dedup family
        "exact_dup_groups": q_exact_dup_groups,
        "exact_dup_histogram": q_exact_dup_histogram,
        "exact_dup_drop_list": q_exact_dup_drop_list,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "decontamination": q_decontamination,
        "passage_dedup": q_passage_dedup,
        "passage_removal": q_passage_removal,
        "content_fingerprint": q_content_fingerprint,
        # text analysis
        "doc_char_classes": q_doc_char_classes,
        "token_counts": q_token_counts,
        "stopword_votes": q_stopword_votes,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "doc_stats_agg": q_doc_stats_agg,
        "length_quantile_filter": q_length_quantile_filter,
        "explode_words": q_explode_words,
        "distinct_lang_source": q_distinct_lang_source,
        "union_tagged": q_union_tagged,
        # embeddings
        "cosine_to_query": q_cosine_to_query,
        "embedding_cosine_pairs": q_embedding_cosine_pairs,
        "embedding_label_counts": q_embedding_label_counts,
        # relational (SURVEY §2 J/A/W/T/F)
        "lineitem_pricing_summary": q_lineitem_pricing_summary,
        "orders_per_nation": q_orders_per_nation,
        "top2_orders_per_customer": q_top2_orders_per_customer,
        "customers_without_orders": q_customers_without_orders,
        "suppliers_with_shipments": q_suppliers_with_shipments,
        "best_event_per_user": q_best_event_per_user,
        "events_high_water": q_events_high_water,
        "event_hourly_windows": q_event_hourly_windows,
        "events_percentile_outliers": q_events_percentile_outliers,
        "ntile_sampling": q_ntile_sampling,
        "part_type_stats": q_part_type_stats,
        "classification_report": q_classification_report,
        "label_majority_vote": q_label_majority_vote,
        "pagerank": q_pagerank,
        # core near-dup contract (oracle = brute-force exact Jaccard)
        "near_dup_pairs": q_near_dup_pairs,
        "search_many": q_search_many,
        "gopher_rules": q_gopher_rules,
        "repetition_scores": q_repetition_scores,
        # once rows-only, all oracle-checked now: CC via recursive-CTE
        # oracles, simhash via the shingle-hash dump, ann_cosine_lsh via
        # the hyperplane-matrix dump (round 6 — zero rows-only rows left)
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "doc_best_neighbor": q_doc_best_neighbor,
        "dedup_survivors": q_dedup_survivors,
        "dedup_survivors_longest": q_dedup_survivors_longest,
        "review_override_components": q_review_override_components,
        "simhash_fingerprints": q_simhash_fingerprints,
        "simhash_near_dup": q_simhash_near_dup,
        "ann_cosine_lsh": q_ann_cosine_lsh,
        # URL tier of the dedup cascade (round 6; operators/urls.py)
        "url_canonical_dedup": q_url_canonical_dedup,
        # full url->exact->near_dup cascade (round 6; operators/cascade.py)
        "dedup_cascade": q_dedup_cascade,
        # per-host cap (round 6; RefinedWeb domain-cap analog)
        "host_cap_filter": q_host_cap_filter,
        # kmeans: deterministic Lloyd's -> fully oracle-checked (was rows-only)
        "kmeans_assignments": q_kmeans_assignments,
        "kmeans_centroid_stats": q_kmeans_centroid_stats,
        # IVF ANN: deterministic coarse quantizer -> fully oracle-checked
        "ann_cosine_ivf": q_ann_cosine_ivf,
        # SemDeDup semantic dedup over the same deterministic fit
        "semdedup": q_semdedup,
        # webtext cleaning / decontamination / mixing tier (round 6 late)
        "pii_scrub": q_pii_scrub,
        "c4_line_filter": q_c4_line_filter,
        "blocklist_filter": q_blocklist_filter,
        "ngram_decontamination": q_ngram_decontamination,
        "bpe_token_counts": q_bpe_token_counts,
        "lang_quota_sample": q_lang_quota_sample,
        "hash_rate_sample": q_hash_rate_sample,
        "lm_perplexity": q_lm_perplexity,
        # Bloom novelty vs history (round 6 late; operators/bloom.py)
        "bloom_novelty": q_bloom_novelty,
        # Dolma paragraph-mode bloom scrub (round 6 late)
        "bloom_paragraph_scrub": q_bloom_paragraph_scrub,
        # UniMax language mixing (round 6 late; operators/mixing.py)
        "unimax_mix": q_unimax_mix,
        # line-level dedup + training-shard shuffle (round 6 continuation)
        "line_dedup": q_line_dedup,
        "training_shards": q_training_shards,
        # arbitrary-offset duplicated-span removal (ExactSubstr form)
        "exact_substring_removal": q_exact_substring_removal,
        # next-fit training-bin packing (recursive-CTE oracle)
        "sequence_packing": q_sequence_packing,
        # GPT-style concat-and-chop window packing (integer oracle)
        "sequence_chopping": q_sequence_chopping,
        # DSIR data selection (two-LM importance ratio, ranked head-cut)
        "dsir_selection": q_dsir_selection,
        # ExactSubstr vs history via Bloom (span-granularity Dolma trick)
        "bloom_span_scrub": q_bloom_span_scrub,
    }


def _pagerank_oracle_sql(n_iter: int = 3, damping: float = 0.85) -> str:
    """Unrolled power iteration mirroring operators/pagerank.pagerank on the
    customer->nation->region hierarchy graph (q_pagerank): symmetrized
    distinct edges, rank0 = 1.0, rank = (1-d) + d * inflow each round."""
    step = """
        r{nxt} AS (
          SELECT n.doc_id,
                 CAST({tele} AS DOUBLE) + CAST({damp} AS DOUBLE)
                   * coalesce(s.inflow, CAST(0 AS DOUBLE)) AS rank
          FROM nodes n LEFT JOIN (
            SELECT e.v AS doc_id, sum(r.rank / d.deg) AS inflow
            FROM eb e
            JOIN r{i} r ON e.u = r.doc_id
            JOIN deg d ON e.u = d.u
            GROUP BY e.v) s ON n.doc_id = s.doc_id
        )"""
    parts = [f"""
        base AS (
          SELECT c_custkey AS u, c_nationkey + 1000000 AS v FROM customer
          UNION ALL
          SELECT n_nationkey + 1000000 AS u, n_regionkey + 2000000 AS v FROM nation
        ),
        eb AS (
          SELECT DISTINCT u, v FROM (
            SELECT u, v FROM base WHERE u <> v
            UNION ALL
            SELECT v AS u, u AS v FROM base WHERE u <> v)
        ),
        nodes AS (SELECT DISTINCT u AS doc_id FROM eb),
        deg AS (SELECT u, count(*) AS deg FROM eb GROUP BY u),
        r0 AS (SELECT doc_id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)"""]
    for it in range(n_iter):
        parts.append(step.format(i=it, nxt=it + 1,
                                 tele=1 - damping, damp=damping))
    return ("WITH " + ",".join(parts)
            + f" SELECT doc_id, round(rank, 6) AS pagerank FROM r{n_iter}")


def _kmeans_oracle_sql(k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd's in DuckDB SQL mirroring operators/kmeans.kmeans_fit:
    init = k smallest vec_ids, argmin ties to lowest cluster, empty clusters
    drop out, n_iter (assign, update) rounds then a final assign."""
    assign = """
        a{i} AS (
          SELECT e.vec_id, c.cluster,
                 list_sum(list_transform(list_zip(e.v, c.cv),
                          p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
          FROM ev e CROSS JOIN {cent} c
        ),
        asg{i} AS (
          SELECT vec_id, cluster, d FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY d, cluster) AS rn FROM a{i})
          WHERE rn = 1
        )"""
    update = """
        c{nxt} AS (
          SELECT cluster, list(m ORDER BY pos) AS cv FROM (
            SELECT a.cluster, t.i AS pos, avg(e.v[t.i]) AS m
            FROM asg{i} a JOIN ev e USING (vec_id)
            CROSS JOIN (SELECT unnest(range(1, {dim1})) AS i) t
            GROUP BY a.cluster, t.i)
          GROUP BY cluster
        )"""
    parts = [f"""
        ev AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
          FROM (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT {k})
        )"""]
    for it in range(n_iter):
        parts.append(assign.format(i=it, cent=f"c{it}"))
        parts.append(update.format(i=it, nxt=it + 1, dim1=dim + 1))
    parts.append(assign.format(i=n_iter, cent=f"c{n_iter}"))
    return "WITH " + ",".join(parts) + f"""
        SELECT vec_id, cluster, round(d, 4) AS distance FROM asg{n_iter}"""


def _ivf_oracle_sql(nprobe: int = 3, kk: int = 10,
                    k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    """IVF probe over the SAME unrolled Lloyd's trajectory as the kmeans
    oracle: asg{n} are the inverted lists, c{n} the coarse centroids; the
    query (vec_id=0) picks its nprobe nearest centroids (squared distance
    rounded to 6, ties to the lowest list — matching
    operators/knn.probe_lists), then exact cosine over those lists only."""
    base = _kmeans_oracle_sql(k=k, n_iter=n_iter, dim=dim)
    with_body = base[len("WITH "):base.rindex("SELECT vec_id, cluster")]
    with_body = with_body.rstrip().rstrip(",")
    cdist = """round(list_sum(list_transform(list_zip(c.cv, q.qv),
                     p -> (p[1]-p[2])*(p[1]-p[2]))), 6)"""
    return f"""
        WITH {with_body},
        q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
        probe AS (
          SELECT cluster FROM (
            SELECT c.cluster,
                   row_number() OVER (ORDER BY {cdist}, c.cluster) AS rn
            FROM c{n_iter} c CROSS JOIN q) WHERE rn <= {nprobe}
        )
        SELECT vec_id, cosine FROM (
          SELECT a.vec_id,
                 round(
                   list_sum(list_transform(list_zip(e.v, q.qv),
                            p -> p[1]*p[2]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
                      * sqrt(list_sum(list_transform(q.qv, x -> x*x)))),
                 3) + 0.0 AS cosine
          FROM asg{n_iter} a
          JOIN probe USING (cluster)
          JOIN ev e USING (vec_id)
          CROSS JOIN q
          WHERE a.vec_id <> 0
        ) ORDER BY cosine DESC, vec_id LIMIT {kk}"""


def _semdedup_oracle_sql(threshold: float = 0.35, k: int = 8,
                         n_iter: int = 2, dim: int = 64) -> str:
    """SemDeDup replay over the SAME unrolled Lloyd trajectory as the
    kmeans oracle: within-cluster brute-force cosine edges (rounded to 3
    BEFORE the threshold, matching operators/semdedup.semdedup_edges),
    recursive label-flood CC (component_id = min vec_id; singletons keep
    their own id), then the keep-one window — farthest-from-centroid
    survives (distance rounded to 4), ties to the smallest id."""
    base = _kmeans_oracle_sql(k=k, n_iter=n_iter, dim=dim)
    with_body = base[len("WITH "):base.rindex("SELECT vec_id, cluster")]
    with_body = with_body.rstrip().rstrip(",")
    n = n_iter
    cos = """round(
        list_sum(list_transform(list_zip(ea.v, eb.v), p -> p[1]*p[2]))
        / (sqrt(list_sum(list_transform(ea.v, x -> x*x)))
           * sqrt(list_sum(list_transform(eb.v, x -> x*x)))), 3) + 0.0"""
    return f"""
        WITH RECURSIVE {with_body},
        edges AS (
          SELECT a.vec_id AS src, b.vec_id AS dst
          FROM asg{n} a
          JOIN asg{n} b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          JOIN ev ea ON ea.vec_id = a.vec_id
          JOIN ev eb ON eb.vec_id = b.vec_id
          WHERE {cos} >= {threshold}
        ),
        sym AS (
          SELECT src AS u, dst AS v FROM edges
          UNION ALL
          SELECT dst AS u, src AS v FROM edges
        ),
        reach(u, c) AS (
          SELECT DISTINCT u, u FROM sym
          UNION
          SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
        ),
        comp0 AS (
          SELECT u AS vec_id, min(c) AS component_id FROM reach GROUP BY u
        ),
        comp AS (
          SELECT a.vec_id, a.cluster, round(a.d, 4) AS distance,
                 COALESCE(c.component_id, a.vec_id) AS component_id
          FROM asg{n} a LEFT JOIN comp0 c USING (vec_id)
        )
        SELECT vec_id, cluster, component_id, distance,
               row_number() OVER (PARTITION BY component_id
                 ORDER BY distance DESC, vec_id) = 1 AS is_survivor
        FROM comp"""


# Shared CTE set for the simhash oracles: replay the production bit vote
# over the Spark-dumped shingle-hash stream (_SIMHASH_DUMP) in pure SQL.
# HUGEINT (int128) arithmetic carries the unsigned-64 semantics: negative
# int64 hashes lift by 2^64, bit j extracts as (u // 2^j) % 2, and the
# reassembled fingerprint wraps back to signed int64 — matching numpy's
# uint64 vote + int64 view bit for bit (round-5 verdict #4; validated
# against signatures.simhash_batch on random hash streams).
_SIMHASH_FP_CTES = f"""
            t AS (SELECT doc_id, n, h
                  FROM read_parquet('{_SIMHASH_DUMP}/*.parquet')),
            u AS (
              SELECT doc_id, n,
                     CASE WHEN h < 0
                          THEN CAST(h AS HUGEINT) + (CAST(1 AS HUGEINT) << 64)
                          ELSE CAST(h AS HUGEINT) END AS uh
              FROM t WHERE h IS NOT NULL
            ),
            votes AS (
              SELECT doc_id, g.j AS j, max(n) AS n,
                     count(*) FILTER (
                       WHERE (uh // (CAST(1 AS HUGEINT) << g.j)) % 2 = 1) AS v
              FROM u, generate_series(0, 63) g(j)
              GROUP BY doc_id, g.j
            ),
            fp0 AS (
              SELECT doc_id,
                     COALESCE(SUM(CASE WHEN 2 * v > n
                                       THEN (CAST(1 AS HUGEINT) << j)
                                       ELSE CAST(0 AS HUGEINT) END),
                              CAST(0 AS HUGEINT)) AS s
              FROM votes GROUP BY doc_id
            ),
            fp AS (
              SELECT doc_id,
                     CAST(CASE WHEN s >= (CAST(1 AS HUGEINT) << 63)
                               THEN s - (CAST(1 AS HUGEINT) << 64)
                               ELSE s END AS BIGINT) AS simhash
              FROM fp0
            ),
            allfp AS (
              SELECT d.doc_id, COALESCE(fp.simhash, 0) AS simhash
              FROM (SELECT DISTINCT doc_id FROM t) d LEFT JOIN fp USING (doc_id)
            )"""


def oracle_sql() -> dict[str, str]:
    from fastdup_spark.operators.pii import EMAIL_RE as _PII_EMAIL
    from fastdup_spark.operators.pii import IPV4_RE as _PII_IPV4
    from fastdup_spark.operators.pii import PHONE_RE as _PII_PHONE
    from fastdup_spark.operators.sampling import hash_rate_threshold
    from fastdup_spark.operators.textql import GPT2_PRETOKEN_RE as _GPT2_RE

    tok = "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"
    ltok = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
    return {
        "simhash_fingerprints": f"""
            WITH {_SIMHASH_FP_CTES}
            SELECT doc_id, simhash FROM allfp
        """,
        # brute-force hamming<=3 graph over the replayed fingerprints ==
        # the banding result (pigeonhole is exhaustive at this distance;
        # identical-fp docs connect via the star edges on the Spark side,
        # via hamming-0 pairs here — same components either way)
        "simhash_near_dup": f"""
            WITH RECURSIVE {_SIMHASH_FP_CTES},
            edges AS (
              SELECT a.doc_id AS src, b.doc_id AS dst
              FROM allfp a JOIN allfp b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ),
            sym AS (
              SELECT src AS u, dst AS v FROM edges
              UNION ALL
              SELECT dst AS u, src AS v FROM edges
            ),
            reach(u, c) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
            ),
            comp AS (
              SELECT u AS doc_id, min(c) AS component_id
              FROM reach GROUP BY u
            )
            SELECT component_id, count(*) AS count
            FROM comp GROUP BY component_id HAVING count(*) >= 2
        """,
        "exact_dup_groups": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id < 500
            )
            SELECT md5(text) AS group_key, count(*) AS group_size,
                   min(doc_id) AS keeper
            FROM docs GROUP BY md5(text) HAVING count(*) >= 2
        """,
        "exact_dup_histogram": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id < 500
            ),
            g AS (
              SELECT md5(text) AS gk, count(*) AS group_size
              FROM docs GROUP BY md5(text) HAVING count(*) >= 2
            )
            SELECT group_size, count(*) AS n_groups FROM g GROUP BY group_size
        """,
        "exact_dup_drop_list": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id < 500
            ),
            d AS (
              SELECT doc_id, md5(text) AS gk,
                     count(*) OVER (PARTITION BY md5(text)) AS sz,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM docs
            )
            SELECT doc_id FROM d WHERE sz >= 2 AND rn > 1
        """,
        "ngram_jaccard_pairs": f"""
            WITH docs AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 40
              UNION ALL
              SELECT doc_id + 1000 AS doc_id, text FROM documents WHERE doc_id < 10
            ),
            toks AS (
              SELECT doc_id, {tok} AS w FROM docs
            ),
            idx AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, greatest(len(w)-2, 0))) AS i
              FROM toks
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                     w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              FROM idx
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS inter_cnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT i.src, i.dst, i.inter_cnt,
                   sa.n + sb.n - i.inter_cnt AS union_cnt,
                   round(i.inter_cnt * 1.0 / (sa.n + sb.n - i.inter_cnt), 6) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.src
            JOIN sizes sb ON sb.doc_id = i.dst
            WHERE round(i.inter_cnt * 1.0 / (sa.n + sb.n - i.inter_cnt), 6) >= 0.05
        """,
        "decontamination": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000001 AS doc_id, text FROM documents WHERE doc_id < 500
            ),
            tagged AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'eval' END AS split,
                     md5(text) AS hk
              FROM docs
            )
            SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc
            FROM tagged e JOIN tagged t ON e.hk = t.hk
            WHERE e.split = 'eval' AND t.split = 'train'
        """,
        "passage_dedup": f"""
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id < 500
            ),
            toks AS (SELECT doc_id, {tok} AS w FROM docs),
            ch AS (
              SELECT doc_id,
                     array_to_string(w[(i-1)*20+1 : i*20], ' ') AS passage
              FROM (SELECT doc_id, w,
                           unnest(range(1, len(w) // 20 + 1)) AS i
                    FROM toks)
            )
            SELECT md5(passage) AS passage_key,
                   count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_occurrences
            FROM ch GROUP BY md5(passage) HAVING count(DISTINCT doc_id) >= 2
        """,
        "passage_removal": f"""
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id < 500
            ),
            toks AS (SELECT doc_id, {tok} AS w FROM docs),
            ch AS (
              SELECT doc_id, i AS idx,
                     array_to_string(w[(i-1)*20+1 : i*20], ' ') AS passage
              FROM (SELECT doc_id, w,
                           unnest(range(1, len(w) // 20 + 1)) AS i
                    FROM toks)
            ),
            rep AS (
              SELECT md5(passage) AS pk FROM ch
              GROUP BY md5(passage) HAVING count(DISTINCT doc_id) >= 2
            ),
            body AS (
              SELECT doc_id, string_agg(passage, ' ' ORDER BY idx) AS body
              FROM ch WHERE md5(passage) NOT IN (SELECT pk FROM rep)
              GROUP BY doc_id
            ),
            drops AS (
              SELECT doc_id, count(*) AS n_dropped
              FROM ch WHERE md5(passage) IN (SELECT pk FROM rep)
              GROUP BY doc_id
            ),
            base AS (
              SELECT doc_id, len(w) // 20 AS n_chunks,
                     CASE WHEN len(w) > (len(w) // 20) * 20
                          THEN array_to_string(
                            w[(len(w) // 20) * 20 + 1 : len(w)], ' ')
                          ELSE '' END AS tail
              FROM toks
            )
            SELECT b.doc_id,
                   concat_ws(' ',
                     CASE WHEN coalesce(o.body, '') <> '' THEN o.body END,
                     CASE WHEN b.tail <> '' THEN b.tail END) AS clean_text,
                   b.n_chunks,
                   coalesce(d.n_dropped, 0) AS n_dropped
            FROM base b
            LEFT JOIN body o ON b.doc_id = o.doc_id
            LEFT JOIN drops d ON b.doc_id = d.doc_id
        """,
        "content_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(
                        regexp_replace(lower(text), '[\\.,!\\?;:]', '', 'g'),
                        '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "doc_char_classes": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                   length(text) - length(regexp_replace(text, '[\\.,!\\?;:]', '', 'g')) AS n_punct,
                   length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS n_spaces
            FROM documents
        """,
        "token_counts": f"""
            SELECT doc_id,
                   len({tok}) AS n_tokens,
                   len(list_distinct({tok})) AS n_distinct_tokens
            FROM documents
        """,
        "stopword_votes": f"""
            SELECT doc_id,
                   len(list_filter({ltok},
                       x -> x IN ('the','and','of','to','in','is'))) AS en_votes,
                   len(list_filter({ltok},
                       x -> x IN ('der','und','die','das','von','ist'))) AS de_votes
            FROM documents
        """,
        "lang_id": r"""
            WITH t AS (
              SELECT doc_id, text, length(text) AS n_chars,
                     length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))
                       AS cjk,
                     string_split_regex(trim(regexp_replace(lower(text),
                       '[\.,!\?;:]', '', 'g')), '\s+') AS toks
              FROM documents
            ),
            v AS (
              SELECT doc_id, n_chars, cjk,
                len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','with'))) AS en,
                len(list_filter(toks, x -> x IN ('der','und','die','das','von','ist','mit','nicht'))) AS de,
                len(list_filter(toks, x -> x IN ('le','et','les','des','est','dans','pour','que'))) AS fr,
                len(list_filter(toks, x -> x IN ('el','y','los','las','es','con','para','una'))) AS es
              FROM t
            )
            SELECT doc_id,
                   CASE WHEN n_chars = 0 THEN 'und'
                        WHEN cjk * 5 > n_chars THEN 'zh'
                        WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                        WHEN en = greatest(en, de, fr, es) THEN 'en'
                        WHEN de = greatest(en, de, fr, es) THEN 'de'
                        WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM v
        """,
        "quality_score": r"""
            WITH t AS (
              SELECT doc_id, text, length(text) AS n_chars,
                     string_split_regex(trim(regexp_replace(lower(text),
                       '[\.,!\?;:]', '', 'g')), '\s+') AS toks
              FROM documents
            ),
            r AS (
              SELECT doc_id, n_chars,
                CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE)
                     ELSE len(list_distinct(toks)) * CAST(1.0 AS DOUBLE) / len(toks)
                END AS distinct_ratio,
                CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
                     ELSE (n_chars - length(regexp_replace(text, '[0-9]', '', 'g')))
                          * CAST(1.0 AS DOUBLE) / n_chars END AS digit_ratio,
                CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
                     ELSE (n_chars - length(regexp_replace(text, '[\.,!\?;:]', '', 'g')))
                          * CAST(1.0 AS DOUBLE) / n_chars END AS punct_ratio,
                CASE WHEN n_chars < 64 THEN n_chars / CAST(64.0 AS DOUBLE)
                     WHEN n_chars > 100000 THEN CAST(0.5 AS DOUBLE)
                     ELSE CAST(1.0 AS DOUBLE) END AS len_score
              FROM t
            )
            SELECT doc_id,
                   round(greatest(CAST(0.0 AS DOUBLE), least(
                     CAST(0.4 AS DOUBLE) * len_score
                     + CAST(0.3 AS DOUBLE) * least(distinct_ratio * 2, CAST(1.0 AS DOUBLE))
                     + CAST(0.15 AS DOUBLE) * (1 - least(digit_ratio * 4, CAST(1.0 AS DOUBLE)))
                     + CAST(0.15 AS DOUBLE) * (1 - least(punct_ratio * 4, CAST(1.0 AS DOUBLE))),
                     CAST(1.0 AS DOUBLE))), 6) AS quality
            FROM r
        """,
        "doc_stats_agg": """
            -- cast: DuckDB sum(BIGINT) is HUGEINT -> float64 in pandas
            SELECT lang, source, count(*) AS n_docs,
                   cast(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 4) AS avg_chars,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents GROUP BY lang, source
        """,
        "length_quantile_filter": """
            WITH ranked AS (
              SELECT doc_id, n_chars,
                     row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn,
                     count(*) OVER () AS n
              FROM documents
            )
            SELECT doc_id, n_chars FROM ranked
            WHERE rn <= cast(floor(n * 0.05) AS BIGINT)
        """,
        "explode_words": f"""
            WITH w AS (
              SELECT unnest({tok}) AS word FROM documents WHERE doc_id < 5
            )
            SELECT word, count(*) AS cnt FROM w GROUP BY word
        """,
        "distinct_lang_source": "SELECT DISTINCT lang, source FROM documents",
        "union_tagged": """
            SELECT doc_id, 'a' AS tag FROM documents WHERE source = 'src0'
            UNION ALL
            SELECT doc_id, 'b' AS tag FROM documents WHERE lang = 'en'
        """,
        "cosine_to_query": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(
                     list_sum(list_transform(list_zip(e.embedding, q.qv),
                              p -> cast(p[1] AS DOUBLE) * cast(p[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(e.embedding,
                              x -> cast(x AS DOUBLE) * cast(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(q.qv,
                              x -> cast(x AS DOUBLE) * cast(x AS DOUBLE))))),
                   3) + 0.0 AS cosine
            FROM embeddings e, q WHERE e.vec_id <> 0
        """,
        "embedding_cosine_pairs": """
            SELECT src, dst, cosine FROM (
              SELECT a.vec_id AS src, b.vec_id AS dst,
                     round(
                       list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                p -> cast(p[1] AS DOUBLE) * cast(p[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.embedding,
                                x -> cast(x AS DOUBLE) * cast(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.embedding,
                                x -> cast(x AS DOUBLE) * cast(x AS DOUBLE))))),
                     3) + 0.0 AS cosine
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            ) t WHERE cosine >= 0.35
        """,
        "embedding_label_counts": """
            SELECT label, count(*) AS n, min(vec_id) AS min_vec_id
            FROM embeddings GROUP BY label
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_per_nation": """
            SELECT n_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top2_orders_per_customer": """
            WITH r AS (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders WHERE o_custkey < 200
            )
            SELECT o_custkey, o_orderkey, o_totalprice, rank FROM r WHERE rank <= 2
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """,
        "suppliers_with_shipments": """
            SELECT s_suppkey, s_name FROM supplier
            WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
        """,
        "best_event_per_user": """
            WITH r AS (
              SELECT user_id, event_id, value, ts,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id ASC) AS rn
              FROM events WHERE user_id < 100
            )
            SELECT user_id, event_id, round(value, 6) AS value,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
            FROM r WHERE rn = 1
        """,
        "events_high_water": """
            SELECT event_type,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "event_hourly_windows": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS window_start,
                   count(*) AS n,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_percentile_outliers": """
            WITH ranked AS (
              SELECT event_id, value,
                     row_number() OVER (ORDER BY value ASC, event_id ASC) AS rn,
                     count(*) OVER () AS n
              FROM events
            )
            SELECT event_id, round(value, 6) AS value FROM ranked
            WHERE rn <= cast(floor(n * 0.05) AS BIGINT)
        """,
        "ntile_sampling": """
            WITH t AS (
              SELECT c_mktsegment, o_totalprice, o_orderkey,
                     ntile(4) OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS tile
              FROM orders JOIN customer ON o_custkey = c_custkey
            )
            SELECT c_mktsegment, tile, count(*) AS n,
                   round(min(o_totalprice), 2) AS tile_min
            FROM t GROUP BY c_mktsegment, tile
        """,
        "part_type_stats": """
            SELECT p_brand, string_split(p_type, ' ')[1] AS type_prefix,
                   count(*) AS n_parts,
                   round(avg(p_retailprice), 4) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_brand, string_split(p_type, ' ')[1]
        """,
        "classification_report": """
            WITH pred AS (
              SELECT cast(label AS BIGINT) AS label,
                     cast(vec_id % 10 AS BIGINT) AS prediction
              FROM embeddings
            ),
            tp AS (
              SELECT label AS clazz, count(*) AS tp FROM pred
              WHERE label = prediction GROUP BY label
            ),
            sup AS (SELECT label AS clazz, count(*) AS support FROM pred GROUP BY label),
            prd AS (SELECT prediction AS clazz, count(*) AS predicted FROM pred GROUP BY prediction),
            rep AS (
              SELECT coalesce(sup.clazz, prd.clazz) AS clazz,
                     coalesce(tp.tp, 0) AS tp,
                     coalesce(sup.support, 0) AS support,
                     coalesce(prd.predicted, 0) AS predicted
              FROM sup FULL OUTER JOIN prd ON sup.clazz = prd.clazz
              LEFT JOIN tp ON coalesce(sup.clazz, prd.clazz) = tp.clazz
            ),
            pr AS (
              SELECT clazz, tp, support, predicted,
                     CASE WHEN predicted = 0 THEN 0.0
                          ELSE round(tp * 1.0 / predicted, 6) END AS precision,
                     CASE WHEN support = 0 THEN 0.0
                          ELSE round(tp * 1.0 / support, 6) END AS recall
              FROM rep
            )
            SELECT clazz, tp, support, predicted, precision, recall,
                   CASE WHEN precision + recall = 0 THEN 0.0
                        ELSE round(2 * precision * recall / (precision + recall), 6)
                   END AS f1
            FROM pr
        """,
        "label_majority_vote": """
            WITH counts AS (
              SELECT o_custkey AS src, o_orderpriority AS label2,
                     count(*) AS cnt
              FROM orders WHERE o_custkey < 300
              GROUP BY o_custkey, o_orderpriority
            ),
            totals AS (SELECT src, cast(sum(cnt) AS BIGINT) AS total
                       FROM counts GROUP BY src),
            ranked AS (
              SELECT src, label2, cnt,
                     row_number() OVER (PARTITION BY src
                       ORDER BY cnt DESC, label2 ASC) AS rk
              FROM counts
            )
            SELECT r.src,
                   CASE WHEN r.cnt >= 3 THEN r.label2 ELSE 'Unknown' END AS predicted,
                   r.cnt, t.total
            FROM ranked r JOIN totals t ON r.src = t.src WHERE r.rk = 1
        """,
        "near_dup_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT src, dst,
                   round(icnt * CAST(1.0 AS DOUBLE)
                         / (sa.n + sb.n - icnt), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = src
            JOIN sizes sb ON sb.doc_id = dst
            WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
        """,
        "gopher_rules": r"""
            WITH d AS (
              SELECT doc_id, text,
                     string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws,
                     string_split(text, chr(10)) AS ls
              FROM documents WHERE trim(text) <> ''
            ),
            m AS (
              SELECT doc_id,
                len(ws) AS n_words,
                list_sum(list_transform(ws, x -> len(x))) * CAST(1.0 AS DOUBLE) / len(ws) AS mwl,
                len(list_filter(ws, x -> contains(x, '#') OR contains(x, '...')
                                      OR contains(x, '…'))) AS n_sym,
                len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
                len(list_filter(ls, l -> starts_with(ltrim(l), '-')
                                      OR starts_with(ltrim(l), '*')
                                      OR starts_with(ltrim(l), '•'))) AS n_bullet,
                len(list_filter(ls, l -> ends_with(rtrim(l), '...')
                                      OR ends_with(rtrim(l), '…'))) AS n_ellip,
                len(ls) AS n_lines,
                len(list_filter(['the','be','to','of','and','that','have','with'],
                                s -> list_contains(list_transform(ws, x -> lower(x)), s)))
                  AS n_stop
              FROM d
            )
            SELECT doc_id,
              n_words,
              round(mwl, 4) AS mean_word_len,
              round(n_sym * CAST(1.0 AS DOUBLE) / n_words, 4) AS frac_symbol_words,
              round(n_alpha * CAST(1.0 AS DOUBLE) / n_words, 4) AS frac_alpha_words,
              round(n_bullet * CAST(1.0 AS DOUBLE) / n_lines, 4) AS frac_bullet_lines,
              round(n_ellip * CAST(1.0 AS DOUBLE) / n_lines, 4) AS frac_ellipsis_lines,
              n_stop AS n_stopwords_present,
              (n_words BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
                AND (n_sym * CAST(1.0 AS DOUBLE) / n_words <= 0.1)
                AND (n_bullet * CAST(1.0 AS DOUBLE) / n_lines <= 0.9)
                AND (n_ellip * CAST(1.0 AS DOUBLE) / n_lines <= 0.3)
                AND (n_alpha * CAST(1.0 AS DOUBLE) / n_words >= 0.8)
                AND (n_stop >= 2) AS passes
            FROM m
        """,
        "repetition_scores": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
              FROM documents WHERE trim(text) <> ''
            ),
            g AS (
              SELECT doc_id, array_to_string(ws[i : i+2], ' ') AS gr
              FROM (SELECT doc_id, ws,
                           unnest(range(1, greatest(len(ws) - 2, 0) + 1)) AS i
                    FROM d)
            ),
            agg AS (
              SELECT doc_id, count(*) AS total_ngrams,
                     count(DISTINCT gr) AS distinct_ngrams
              FROM g GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.total_ngrams, 0) AS total_ngrams,
                   coalesce(a.distinct_ngrams, 0) AS distinct_ngrams,
                   CASE WHEN a.total_ngrams > 0
                        THEN round(1.0 - a.distinct_ngrams * CAST(1.0 AS DOUBLE)
                                   / a.total_ngrams, 6)
                        ELSE 0.0 END AS dup_frac
            FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
        """,
        "minhash_lsh_dedup": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT src, dst FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
              WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
            ),
            sym AS (
              SELECT src AS u, dst AS v FROM edges
              UNION ALL
              SELECT dst AS u, src AS v FROM edges
            ),
            reach(u, c) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
            ),
            comp AS (
              SELECT u AS doc_id, min(c) AS component_id
              FROM reach GROUP BY u
            )
            SELECT component_id, count(*) AS count
            FROM comp GROUP BY component_id
            HAVING count(*) >= 2
        """,
        "review_override_components": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edges0 AS (
              SELECT src, dst FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
              WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
            ),
            rejected AS (
              SELECT src, dst FROM edges0 WHERE src % 7 = dst % 7
            ),
            confirmed AS (
              SELECT src, dst FROM (
                SELECT doc_id AS src,
                       lead(doc_id) OVER (ORDER BY doc_id) AS dst
                FROM toks)
              WHERE dst IS NOT NULL AND src % 13 = 0
            ),
            edges AS (
              SELECT src, dst FROM edges0
              EXCEPT
              SELECT src, dst FROM rejected
              UNION
              SELECT src, dst FROM confirmed
            ),
            sym AS (
              SELECT src AS u, dst AS v FROM edges
              UNION ALL
              SELECT dst AS u, src AS v FROM edges
            ),
            reach(u, c) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
            ),
            comp AS (
              SELECT u AS doc_id, min(c) AS component_id
              FROM reach GROUP BY u
            )
            SELECT component_id, count(*) AS count
            FROM comp GROUP BY component_id
            HAVING count(*) >= 2
        """,
        "doc_best_neighbor": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edgesj AS (
              SELECT src, dst,
                     round(icnt * CAST(1.0 AS DOUBLE)
                           / (sa.n + sb.n - icnt), 6) AS j
              FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
              WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
            ),
            sym AS (
              SELECT src AS doc_id, dst AS nn, j FROM edgesj
              UNION ALL
              SELECT dst AS doc_id, src AS nn, j FROM edgesj
            )
            SELECT doc_id, nn AS best_nn, j AS best_sim
            FROM sym
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY j DESC, nn) = 1
        """,
        "dedup_survivors": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT src, dst FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
              WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
            ),
            sym AS (
              SELECT src AS u, dst AS v FROM edges
              UNION ALL
              SELECT dst AS u, src AS v FROM edges
            ),
            reach(u, c) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
            ),
            comp AS (
              SELECT u AS doc_id, min(c) AS component_id
              FROM reach GROUP BY u
            )
            SELECT doc_id, component_id
            FROM comp WHERE doc_id <> component_id
        """,
        # same recursive-CTE components; survivor = longest raw text
        # (ties -> min doc_id), drop list = everyone else
        "dedup_survivors_longest": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT src, dst FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
              WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
            ),
            sym AS (
              SELECT src AS u, dst AS v FROM edges
              UNION ALL
              SELECT dst AS u, src AS v FROM edges
            ),
            reach(u, c) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
            ),
            comp AS (
              SELECT u AS doc_id, min(c) AS component_id
              FROM reach GROUP BY u
            ),
            ranked AS (
              SELECT comp.doc_id, comp.component_id,
                     row_number() OVER (
                       PARTITION BY comp.component_id
                       ORDER BY length(d.text) DESC, comp.doc_id) AS rn
              FROM comp JOIN documents d ON d.doc_id = comp.doc_id
            )
            SELECT doc_id, component_id FROM ranked WHERE rn > 1
        """,
        "search_many": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT q.doc_id AS query_id, b.doc_id AS doc_id, count(*) AS icnt
              FROM grams q JOIN grams b
                ON q.g = b.g AND q.doc_id % 7 = 1 AND b.doc_id <> q.doc_id
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT i.query_id, i.doc_id,
                     round(i.icnt * CAST(1.0 AS DOUBLE)
                           / (sq.n + sb.n - i.icnt), 6) AS jaccard
              FROM inter i
              JOIN sizes sq ON sq.doc_id = i.query_id
              JOIN sizes sb ON sb.doc_id = i.doc_id
              WHERE round(i.icnt * CAST(1.0 AS DOUBLE)
                          / (sq.n + sb.n - i.icnt), 6) >= 0.85
            )
            SELECT query_id, doc_id, jaccard,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY jaccard DESC, doc_id) AS rank
            FROM scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                                       ORDER BY jaccard DESC, doc_id) <= 10
        """,
        "pagerank": _pagerank_oracle_sql(),
        "kmeans_assignments": _kmeans_oracle_sql(),
        "kmeans_centroid_stats": f"""
            WITH base AS ({_kmeans_oracle_sql()})
            SELECT cluster, count(*) AS size,
                   round(avg(distance), 4) AS avg_dist
            FROM base GROUP BY cluster
        """,
        "ann_cosine_ivf": _ivf_oracle_sql(),
        "semdedup": _semdedup_oracle_sql(),
        # replay of operators/urls.canonical_url_expr: fragment drop,
        # scheme/host lowercase, default-port drop, trailing-slash drop,
        # tracking-param drop with order preserved (no regex capture
        # groups anywhere, so the Spark and RE2 dialects agree)
        "url_canonical_dedup": """
            WITH u AS (
              SELECT doc_id,
                     'HTTPS://' || upper(source) || '.Example.COM'
                     || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
                     || '/Docs/' || CAST(doc_id % 40 AS VARCHAR)
                     || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                             THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
                             WHEN doc_id % 5 = 1
                             THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x'
                             WHEN doc_id % 5 = 2 THEN '#frag'
                             ELSE '' END AS url
              FROM documents
            ),
            parts AS (
              SELECT doc_id,
                     split_part(split_part(url, '#', 1), '?', 1) AS base,
                     position('?' IN split_part(url, '#', 1)) AS qpos,
                     split_part(url, '#', 1) AS no_frag
              FROM u
            ),
            pieces AS (
              SELECT doc_id, base, qpos,
                     CASE WHEN qpos > 0
                          THEN substring(no_frag, qpos + 1) ELSE '' END AS query,
                     regexp_extract(base,
                       '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*') AS sh_raw
              FROM parts
            ),
            canon AS (
              SELECT doc_id,
                     (CASE WHEN starts_with(lower(sh_raw), 'https://')
                                AND right(lower(sh_raw), 4) = ':443'
                           THEN left(lower(sh_raw), length(sh_raw) - 4)
                           WHEN starts_with(lower(sh_raw), 'http://')
                                AND right(lower(sh_raw), 3) = ':80'
                           THEN left(lower(sh_raw), length(sh_raw) - 3)
                           ELSE lower(sh_raw) END)
                     || regexp_replace(substring(base, length(sh_raw) + 1),
                                       '/+$', '')
                     || (CASE WHEN qpos > 0 AND array_to_string(
                                list_filter(string_split(query, '&'),
                                  p -> p <> '' AND NOT (
                                       starts_with(p, 'utm_')
                                       OR starts_with(p, 'gclid')
                                       OR starts_with(p, 'fbclid')
                                       OR starts_with(p, 'msclkid')
                                       OR starts_with(p, 'mc_eid'))),
                                '&') <> ''
                           THEN '?' || array_to_string(
                                list_filter(string_split(query, '&'),
                                  p -> p <> '' AND NOT (
                                       starts_with(p, 'utm_')
                                       OR starts_with(p, 'gclid')
                                       OR starts_with(p, 'fbclid')
                                       OR starts_with(p, 'msclkid')
                                       OR starts_with(p, 'mc_eid'))),
                                '&')
                           ELSE '' END) AS canonical_url
              FROM pieces
            )
            SELECT canonical_url, count(*) AS n_docs,
                   min(doc_id) AS min_doc_id
            FROM canon GROUP BY canonical_url HAVING count(*) >= 2
        """,
        # per-host cap: replay host_expr's substring splits + the
        # keep-newest window, report rows beyond the cap
        "host_cap_filter": """
            WITH u AS (
              SELECT doc_id, doc_id % 89 AS fetch_ts,
                     (CASE WHEN doc_id % 2 = 0
                           THEN 'HTTPS://' ELSE 'https://' END)
                     || 'Site' || CAST(doc_id % 13 AS VARCHAR)
                     || '.Example.com'
                     || CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END
                     || '/d/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents
            ),
            a AS (
              SELECT doc_id, fetch_ts,
                     split_part(split_part(split_part(split_part(
                       CASE WHEN position('://' IN url) > 0
                            THEN substring(url, position('://' IN url) + 3)
                            ELSE NULL END,
                       '/', 1), '?', 1), '#', 1), '@', -1) AS auth
              FROM u
            ),
            h AS (
              SELECT doc_id, fetch_ts,
                     lower(CASE WHEN starts_with(auth, '[')
                                THEN split_part(auth, ']', 1) || ']'
                                ELSE split_part(auth, ':', 1) END) AS host
              FROM a
            ),
            r AS (
              SELECT doc_id, host,
                     row_number() OVER (PARTITION BY host
                       ORDER BY fetch_ts DESC, doc_id) AS host_rank
              FROM h
            )
            SELECT doc_id, host, host_rank FROM r WHERE host_rank > 20
        """,
        # full cascade replay: canonicalization (same rules as above) ->
        # keep-newest revisit window -> text-equality window -> brute-force
        # exact-Jaccard edges + recursive label-flood CC over the survivors
        "dedup_cascade": r"""
            WITH RECURSIVE dset AS (
              SELECT doc_id, text FROM documents
              WHERE trim(regexp_replace(regexp_replace(text,
                    '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents
              WHERE doc_id < 500
                AND trim(regexp_replace(regexp_replace(text,
                    '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) <> ''
            ),
            u AS (
              SELECT doc_id, text, doc_id % 89 AS fetch_ts,
                     CASE WHEN doc_id % 11 = 0 THEN
                       'HTTPS://Archive.Example.COM'
                       || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
                       || '/r/' || CAST(doc_id % 23 AS VARCHAR)
                       || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '?utm_source=f'
                               WHEN doc_id % 5 = 2 THEN '#frag'
                               ELSE '' END
                     ELSE
                       'https://site' || CAST(doc_id % 13 AS VARCHAR)
                       || '.example.com/d/' || CAST(doc_id AS VARCHAR)
                       || CASE WHEN doc_id % 5 = 1
                               THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                                    || '&utm_campaign=x'
                               ELSE '' END
                     END AS url
              FROM dset
            ),
            parts AS (
              SELECT doc_id, text, fetch_ts,
                     split_part(split_part(url, '#', 1), '?', 1) AS base,
                     position('?' IN split_part(url, '#', 1)) AS qpos,
                     split_part(url, '#', 1) AS no_frag
              FROM u
            ),
            pieces AS (
              SELECT doc_id, text, fetch_ts, base, qpos,
                     CASE WHEN qpos > 0
                          THEN substring(no_frag, qpos + 1) ELSE '' END AS query,
                     regexp_extract(base,
                       '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*') AS sh_raw
              FROM parts
            ),
            canon AS (
              SELECT doc_id, text, fetch_ts,
                     (CASE WHEN starts_with(lower(sh_raw), 'https://')
                                AND right(lower(sh_raw), 4) = ':443'
                           THEN left(lower(sh_raw), length(sh_raw) - 4)
                           WHEN starts_with(lower(sh_raw), 'http://')
                                AND right(lower(sh_raw), 3) = ':80'
                           THEN left(lower(sh_raw), length(sh_raw) - 3)
                           ELSE lower(sh_raw) END)
                     || regexp_replace(substring(base, length(sh_raw) + 1),
                                       '/+$', '')
                     || (CASE WHEN qpos > 0 AND array_to_string(
                                list_filter(string_split(query, '&'),
                                  p -> p <> '' AND NOT (
                                       starts_with(p, 'utm_')
                                       OR starts_with(p, 'gclid')
                                       OR starts_with(p, 'fbclid')
                                       OR starts_with(p, 'msclkid')
                                       OR starts_with(p, 'mc_eid'))),
                                '&') <> ''
                           THEN '?' || array_to_string(
                                list_filter(string_split(query, '&'),
                                  p -> p <> '' AND NOT (
                                       starts_with(p, 'utm_')
                                       OR starts_with(p, 'gclid')
                                       OR starts_with(p, 'fbclid')
                                       OR starts_with(p, 'msclkid')
                                       OR starts_with(p, 'mc_eid'))),
                                '&')
                           ELSE '' END) AS canonical_url
              FROM pieces
            ),
            r1 AS (
              SELECT doc_id, text, canonical_url,
                     row_number() OVER (PARTITION BY canonical_url
                       ORDER BY fetch_ts DESC, doc_id) AS rn,
                     first_value(doc_id) OVER (PARTITION BY canonical_url
                       ORDER BY fetch_ts DESC, doc_id) AS kept
              FROM canon
            ),
            s1 AS (SELECT doc_id, text FROM r1 WHERE rn = 1),
            r2 AS (
              SELECT doc_id, text,
                     row_number() OVER (PARTITION BY text
                       ORDER BY doc_id) AS rn,
                     min(doc_id) OVER (PARTITION BY text) AS kept
              FROM s1
            ),
            s2 AS (SELECT doc_id, text FROM r2 WHERE rn = 1),
            toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(text,
                       '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')), ' ') AS w
              FROM s2
            ),
            grams AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(w) < 9 THEN array_to_string(w, ' ')
                            ELSE array_to_string(w[i : i+8], ' ') END AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 8, 1) + 1)) AS i
                      FROM toks))
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS icnt
              FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            edges AS (
              SELECT src, dst FROM inter
              JOIN sizes sa ON sa.doc_id = src
              JOIN sizes sb ON sb.doc_id = dst
              WHERE icnt * CAST(1.0 AS DOUBLE) / (sa.n + sb.n - icnt) >= 0.85
            ),
            sym AS (
              SELECT src AS u, dst AS v FROM edges
              UNION ALL
              SELECT dst AS u, src AS v FROM edges
            ),
            reach(u, c) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.v, r.c FROM reach r JOIN sym s ON s.u = r.u
            ),
            comp AS (
              SELECT u AS doc_id, min(c) AS component_id
              FROM reach GROUP BY u
            )
            SELECT doc_id, 'url' AS tier, kept AS kept_by
            FROM r1 WHERE rn > 1
            UNION ALL
            SELECT doc_id, 'exact' AS tier, kept AS kept_by
            FROM r2 WHERE rn > 1
            UNION ALL
            SELECT doc_id, 'near_dup' AS tier, component_id AS kept_by
            FROM comp WHERE doc_id <> component_id
        """,
        # hyperplane-LSH ANN: replay sign buckets + multiprobe + rounded
        # re-rank from the dumped deterministic plane matrix (round 6)
        "ann_cosine_lsh": f"""
            WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                        FROM embeddings),
            pl AS (SELECT band, plane, w
                   FROM read_parquet('{_LSH_PLANES_DUMP}')),
            dots AS (
              SELECT e.vec_id, p.band, p.plane,
                     list_dot_product(e.v, p.w) AS d
              FROM ev e CROSS JOIN pl p
            ),
            buckets AS (
              SELECT vec_id, band,
                     CAST(SUM(CASE WHEN d > 0
                                   THEN (CAST(1 AS BIGINT) << plane)
                                   ELSE 0 END) AS BIGINT) AS bucket
              FROM dots GROUP BY vec_id, band
            ),
            qb AS (SELECT band, bucket AS base FROM buckets WHERE vec_id = 0),
            probes AS (
              SELECT band, base AS bucket FROM qb
              UNION ALL
              SELECT qb.band,
                     xor(qb.base, CAST(1 AS BIGINT) << CAST(g.j AS INT))
              FROM qb CROSS JOIN generate_series(0, {_LSH_N_PLANES - 1}) g(j)
            ),
            cand AS (
              SELECT DISTINCT b.vec_id
              FROM buckets b JOIN probes p USING (band, bucket)
              WHERE b.vec_id <> 0
            ),
            q AS (SELECT v AS qv FROM ev WHERE vec_id = 0)
            SELECT vec_id, cosine FROM (
              SELECT c.vec_id,
                     round(list_dot_product(e.v, q.qv)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(q.qv, q.qv))), 3)
                     + 0.0 AS cosine
              FROM cand c JOIN ev e USING (vec_id) CROSS JOIN q
            ) ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        # replay of operators/pii.scrub_pii: counts on the original text,
        # redaction in email -> ipv4 -> phone order (RE2 and Java regex
        # agree on these patterns: no lookaround, no backreferences)
        "pii_scrub": f"""
            WITH dirty AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                          || doc_id || '@mail.example.com now' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN ' from 10.'
                          || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
                          || ' end' ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id, text,
              len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
              len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ips,
              len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
              regexp_replace(regexp_replace(regexp_replace(text,
                '{_PII_EMAIL}', '<EMAIL>', 'g'),
                '{_PII_IPV4}', '<IP>', 'g'),
                '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text
            FROM dirty
        """,
        # replay of operators/cleaning.c4_clean: the line predicate uses THE
        # whitespace tokenizer contract; kept lines rejoined with newlines
        "c4_line_filter": f"""
            WITH base AS (
              SELECT doc_id,
                concat_ws(chr(10),
                  'Home | About | Contact',
                  'Please enable javascript to continue.',
                  'Report ' || substr(text, 1, 90) || ' end of this section.',
                  'Too short.',
                  substr(text, 91, 70) || ' with no terminal punct',
                  CASE WHEN doc_id % 11 = 0 THEN 'var cfg = {{ mode: 1 }};'
                       ELSE 'All rights reserved by this site today.' END,
                  CASE WHEN doc_id % 13 = 0
                       THEN 'Lorem ipsum dolor sit amet and so forth today.'
                       ELSE 'Final line for doc ' || doc_id
                            || ' is properly terminated!' END
                ) AS text
              FROM documents
            ),
            k AS (
              SELECT doc_id, text,
                string_split(text, chr(10)) AS lines,
                list_filter(string_split(text, chr(10)), l ->
                  len(string_split(trim(regexp_replace(l, '\\s+', ' ', 'g')),
                      ' ')) >= 5
                  AND regexp_matches(
                      trim(regexp_replace(l, '\\s+', ' ', 'g')), '[.!?"]$')
                  AND NOT contains(
                      lower(trim(regexp_replace(l, '\\s+', ' ', 'g'))),
                      'javascript')) AS kept
              FROM base
            )
            SELECT doc_id,
              len(lines) AS n_lines,
              len(kept) AS n_kept,
              (len(kept) >= 3
               AND NOT contains(lower(text), 'lorem ipsum')
               AND NOT contains(text, '{{')) AS keep_doc,
              -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
              coalesce(array_to_string(kept, chr(10)), '') AS clean_text
            FROM k
        """,
        # replay of operators/cleaning.blocklist_flags: exact token
        # membership over the lowercased whitespace tokenizer
        "blocklist_filter": f"""
            WITH h AS (
              SELECT doc_id,
                list_sort(list_intersect(list_distinct({ltok}),
                  ['casino', 'customer', 'jackpot', 'stream'])) AS hits
              FROM documents
            )
            SELECT doc_id, len(hits) AS n_hits,
                   -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
                   coalesce(array_to_string(hits, ','), '') AS matched,
                   len(hits) > 0 AS blocked
            FROM h
        """,
        # replay of operators/crossset.ngram_overlap_contamination: eval
        # grams = words 3..10 of every 37th doc; train side explodes all
        # word 8-grams (list_slice over the tokenizer contract)
        "ngram_decontamination": f"""
            WITH tt AS (
              SELECT doc_id, {tok} AS toks FROM documents
            ),
            ev AS (
              SELECT DISTINCT array_to_string(list_slice(toks, 3, 10), ' ')
                     AS g
              FROM tt WHERE doc_id % 37 = 0 AND len(toks) >= 10
            ),
            tg AS (
              SELECT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS g
              FROM tt, UNNEST(range(1, greatest(len(toks) - 7, 0) + 1)) u(i)
            )
            SELECT t.doc_id, count(DISTINCT t.g) AS n_matched_ngrams
            FROM tg t JOIN ev ON t.g = ev.g
            GROUP BY t.doc_id
        """,
        # replay of operators/textql.gpt2_pretokens_expr: the lookahead-free
        # gpt2 pre-tokenizer regex means the same in RE2 ($$-quoted so the
        # embedded quote in the contraction branch survives)
        "bpe_token_counts": f"""
            WITH d AS (
              SELECT doc_id,
                     text || ' it''s doc ' || doc_id || ', ok!' AS text
              FROM documents
            ),
            t AS (
              SELECT doc_id,
                     regexp_extract_all(text, $${_GPT2_RE}$$) AS toks
              FROM d
            ),
            f AS (
              SELECT doc_id, toks,
                     -- regex, not trim(): trim strips only spaces and the
                     -- pre-tokenizer emits tab/newline runs too
                     list_filter(toks, x ->
                       regexp_replace(x, '\\s+', '', 'g') <> '') AS nt
              FROM t
            )
            SELECT doc_id,
                   len(toks) AS n_pretokens,
                   len(nt) AS n_tokens,
                   len(list_distinct(nt)) AS n_distinct_tokens
            FROM f
        """,
        # replay of operators/sampling.quota_sample: md5-of-decimal-id
        # ordering, 40 per lang
        "lang_quota_sample": """
            WITH r AS (
              SELECT doc_id, lang,
                row_number() OVER (
                  PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
              FROM documents
            )
            SELECT doc_id, lang, rk FROM r WHERE rk <= 40
        """,
        # replay of operators/sampling.hash_rate_sample: fixed-width
        # lowercase hex compares identically in both engines; the
        # threshold comes from the operator itself so it can never drift
        "hash_rate_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE substr(md5('s1:' || doc_id), 1, 8)
                  < '{hash_rate_threshold(0.2)}'
        """,
        # replay of operators/lm.py train_unigram_lm + score_perplexity:
        # the canonical ws-tokenizer contract lowercased, top-500 vocab
        # (count desc, token asc ties), add-one UNK, integer micro-nat
        # log-probs (exact per-doc sums), ppl rounded 2dp in both engines
        "lm_perplexity": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split(trim(regexp_replace(
                         lower(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS token
              FROM documents
            ),
            cnts AS (
              SELECT token, count(*) AS cnt FROM tok
              WHERE doc_id % 7 = 0 GROUP BY token
            ),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cnts),
            vocab AS (
              SELECT token, cnt FROM cnts
              ORDER BY cnt DESC, token ASC LIMIT 500
            ),
            lp AS (
              SELECT v.token,
                     CAST(round(ln(v.cnt / (t.t + 1)) * 1000000, 0)
                          AS BIGINT) AS lpm
              FROM vocab v, tot t
            ),
            oov AS (
              SELECT CAST(round(ln(
                       (t.t - (SELECT CAST(sum(cnt) AS BIGINT) FROM vocab)
                        + 1) / (t.t + 1)) * 1000000, 0) AS BIGINT) AS lpm
              FROM tot t
            ),
            per AS (
              SELECT tok.doc_id, count(*) AS n_tokens,
                     CAST(sum(coalesce(lp.lpm, (SELECT lpm FROM oov)))
                          AS BIGINT) AS logprob_micro
              FROM tok LEFT JOIN lp ON tok.token = lp.token
              GROUP BY tok.doc_id
            )
            SELECT d.doc_id,
                   coalesce(per.n_tokens, 0) AS n_tokens,
                   coalesce(per.logprob_micro, 0) AS logprob_micro,
                   CASE WHEN coalesce(per.n_tokens, 0) > 0 THEN
                     round(exp((-per.logprob_micro) / 1000000.0
                               / per.n_tokens), 2)
                   END AS ppl
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        # concat-and-chop replay: md5 shard/pos permutation, per-shard
        # running token sum, slice bounds as pure integer arithmetic
        "sequence_chopping": f"""
            WITH base AS (
              SELECT doc_id,
                     CAST(len(list_filter({tok}, x -> x <> ''))
                          AS BIGINT) AS n_tokens,
                     md5('chop:' || CAST(doc_id AS VARCHAR)) AS hk
              FROM documents
            ),
            sh AS (
              SELECT doc_id, n_tokens, hk,
                     CAST(CAST('0x' || substring(hk, 1, 15) AS BIGINT) % 8
                          AS INTEGER) AS shard
              FROM base
            ),
            ordered AS (
              SELECT doc_id, n_tokens, shard,
                     CAST(row_number() OVER (PARTITION BY shard
                                             ORDER BY hk, doc_id)
                          AS BIGINT) AS pos,
                     CAST(sum(n_tokens) OVER (PARTITION BY shard
                                              ORDER BY hk, doc_id
                                              ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS g_end
              FROM sh
            ),
            g AS (
              SELECT *, g_end - n_tokens AS g_start
              FROM ordered WHERE n_tokens > 0
            )
            SELECT doc_id, shard, pos, n_tokens,
                   w AS "window",
                   CAST(greatest(g_start, w * 200) - w * 200
                        AS BIGINT) AS win_offset,
                   CAST(greatest(g_start, w * 200) - g_start + 1
                        AS BIGINT) AS tok_start,
                   CAST(least(g_end, (w + 1) * 200)
                        - greatest(g_start, w * 200) AS BIGINT) AS tok_len
            FROM (SELECT *, unnest(range(g_start // 200,
                                         (g_end - 1) // 200 + 1)) AS w
                  FROM g)
        """,
        # DSIR: both unigram fits (micro-nat contract, identical to the
        # lm_perplexity replay), the per-token log-ratio sum, and the
        # ranked top-100 cut with the md5 tie-break
        "dsir_selection": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split(trim(regexp_replace(
                         lower(text), '\s+', ' ', 'g')), ' '),
                       x -> x <> '')) AS token
              FROM documents
            ),
            tc AS (
              SELECT token, count(*) AS cnt FROM tok
              WHERE doc_id % 7 = 0 GROUP BY token
            ),
            tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM tc),
            tvocab AS (
              SELECT token, cnt FROM tc
              ORDER BY cnt DESC, token ASC LIMIT 500
            ),
            tlp AS (
              SELECT v.token,
                     CAST(round(ln(v.cnt / (t.t + 1)) * 1000000, 0)
                          AS BIGINT) AS lpm
              FROM tvocab v, tt t
            ),
            toov AS (
              SELECT CAST(round(ln(
                       (t.t - (SELECT CAST(sum(cnt) AS BIGINT) FROM tvocab)
                        + 1) / (t.t + 1)) * 1000000, 0) AS BIGINT) AS lpm
              FROM tt t
            ),
            rc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
            rt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM rc),
            rvocab AS (
              SELECT token, cnt FROM rc
              ORDER BY cnt DESC, token ASC LIMIT 500
            ),
            rlp AS (
              SELECT v.token,
                     CAST(round(ln(v.cnt / (t.t + 1)) * 1000000, 0)
                          AS BIGINT) AS lpm
              FROM rvocab v, rt t
            ),
            roov AS (
              SELECT CAST(round(ln(
                       (t.t - (SELECT CAST(sum(cnt) AS BIGINT) FROM rvocab)
                        + 1) / (t.t + 1)) * 1000000, 0) AS BIGINT) AS lpm
              FROM rt t
            ),
            per AS (
              SELECT tok.doc_id, count(*) AS n_tokens,
                     CAST(sum(coalesce(tlp.lpm, (SELECT lpm FROM toov))
                            - coalesce(rlp.lpm, (SELECT lpm FROM roov)))
                          AS BIGINT) AS score_micro
              FROM tok
              LEFT JOIN tlp ON tok.token = tlp.token
              LEFT JOIN rlp ON tok.token = rlp.token
              GROUP BY tok.doc_id
            ),
            allsc AS (
              SELECT d.doc_id,
                     coalesce(per.n_tokens, 0) AS n_tokens,
                     coalesce(per.score_micro, 0) AS score_micro,
                     md5(CAST(d.doc_id AS VARCHAR)) AS tie
              FROM documents d LEFT JOIN per USING (doc_id)
            )
            SELECT doc_id, n_tokens, score_micro,
                   CAST(row_number() OVER (ORDER BY score_micro DESC, tie)
                        AS BIGINT) AS rank
            FROM allsc
            ORDER BY score_micro DESC, tie LIMIT 100
        """,
        # span-mode Bloom scrub: verdicts = set logic over the dumped
        # window-probe positions (seen iff ALL k positions were inserted
        # by the even-doc history half), then the FULL ExactSubstr tail
        # replays from the rebuilt text: span merge, coverage, ordered
        # reassembly, integer-exact kill rule
        "bloom_span_scrub": f"""
            WITH pos AS (SELECT doc_id, start, p
                         FROM read_parquet('{_BLOOM_SPAN_DUMP}/*.parquet')),
            ins AS (SELECT DISTINCT p FROM pos WHERE doc_id % 2 = 0),
            st AS (
              SELECT doc_id, start FROM (
                SELECT pos.doc_id, pos.start,
                       count(*) = count(ins.p) AS s
                FROM pos LEFT JOIN ins ON pos.p = ins.p
                GROUP BY pos.doc_id, pos.start)
              WHERE s
            ),
            base AS (SELECT doc_id, {tok} AS w0 FROM documents),
            ev AS (
              SELECT doc_id, array_to_string(w0[1:30], ' ') AS pref
              FROM base WHERE doc_id % 2 = 0
            ),
            dirty AS (
              SELECT doc_id,
                     pref || ' u' || CAST(doc_id AS VARCHAR) AS text
              FROM ev
              UNION ALL
              SELECT e.doc_id + 1 AS doc_id,
                     'pad1 pad2 ' || e.pref || ' u'
                       || CAST(e.doc_id + 1 AS VARCHAR) AS text
              FROM ev e JOIN documents o ON o.doc_id = e.doc_id + 1
            ),
            toks AS (SELECT doc_id, {tok} AS w FROM dirty),
            spans AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN prev IS NULL OR start > prev + 7
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
              FROM (SELECT doc_id, start,
                           lag(start) OVER (PARTITION BY doc_id
                                            ORDER BY start) AS prev
                    FROM st)
              GROUP BY doc_id
            ),
            dropped AS (
              SELECT DISTINCT doc_id, unnest(range(start, start + 8)) AS idx
              FROM st
            ),
            tk AS (
              SELECT doc_id, i AS idx, w[i] AS tok
              FROM (SELECT doc_id, w,
                           unnest(range(1, len(w) + 1)) AS i FROM toks)
              WHERE w[i] <> ''
            ),
            per AS (
              SELECT t.doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN d.idx IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dropped,
                     string_agg(CASE WHEN d.idx IS NULL THEN t.tok END,
                                ' ' ORDER BY t.idx) AS clean_text
              FROM tk t
              LEFT JOIN dropped d ON t.doc_id = d.doc_id AND t.idx = d.idx
              GROUP BY t.doc_id
            )
            SELECT b.doc_id,
                   coalesce(p.clean_text, '') AS clean_text,
                   coalesce(p.n_tokens, 0) AS n_tokens,
                   coalesce(p.n_dropped, 0) AS n_dropped,
                   coalesce(s.n_spans, 0) AS n_spans,
                   coalesce(p.n_dropped, 0) * 10
                     <= coalesce(p.n_tokens, 0) * 3 AS kept
            FROM (SELECT doc_id FROM dirty) b
            LEFT JOIN per p ON b.doc_id = p.doc_id
            LEFT JOIN spans s ON b.doc_id = s.doc_id
        """,
        # Bloom novelty: pure set replay over the dumped probe positions —
        # maybe_seen iff EVERY one of the doc's k positions was inserted by
        # the even-doc_id history half (duplicate positions within one doc
        # are harmless: the LEFT JOIN preserves row-for-row pairing)
        "bloom_novelty": f"""
            WITH pos AS (SELECT doc_id, p
                         FROM read_parquet('{_BLOOM_DUMP}/*.parquet')),
            ins AS (SELECT DISTINCT p FROM pos WHERE doc_id % 2 = 0)
            SELECT pos.doc_id,
                   count(*) = count(ins.p) AS maybe_seen
            FROM pos LEFT JOIN ins ON pos.p = ins.p
            GROUP BY pos.doc_id
        """,
        # Dolma paragraph-mode scrub: rebuild the dirty text, split it the
        # same way, replay each paragraph's verdict from the position dump
        # (seen iff ALL k positions were inserted by the even-doc_id
        # history), and reassemble with an ordered string_agg
        "bloom_paragraph_scrub": f"""
            WITH pos AS (SELECT doc_id, pos, p
                         FROM read_parquet('{_BLOOM_PARA_DUMP}/*.parquet')),
            ins AS (SELECT DISTINCT p FROM pos WHERE doc_id % 2 = 0),
            verdict AS (
              SELECT pos.doc_id, pos.pos,
                     count(*) = count(ins.p) AS seen
              FROM pos LEFT JOIN ins ON pos.p = ins.p
              GROUP BY pos.doc_id, pos.pos
            ),
            split AS (
              SELECT doc_id,
                     string_split(
                       'subscribe to our newsletter for updates'
                       || chr(10) || substring(text, 1, 80) || chr(10)
                       || 'unique tail for document '
                       || CAST(doc_id AS VARCHAR),
                       chr(10)) AS l
              FROM documents
            ),
            paras AS (
              SELECT doc_id, i AS pos, l[i + 1] AS para
              FROM (SELECT doc_id, l,
                           unnest(range(0, len(l))) AS i FROM split)
              WHERE trim(l[i + 1]) <> ''
            )
            SELECT d.doc_id,
                   coalesce(string_agg(
                       CASE WHEN NOT v.seen THEN p.para END,
                       chr(10) ORDER BY p.pos), '') AS clean_text,
                   count(p.pos) AS n_paras,
                   count(CASE WHEN v.seen THEN 1 END) AS n_dropped
            FROM documents d
            LEFT JOIN paras p ON p.doc_id = d.doc_id
            LEFT JOIN verdict v ON v.doc_id = p.doc_id AND v.pos = p.pos
            GROUP BY d.doc_id
        """,
        # UniMax mixing: re-derive the 8-hex keep threshold from the
        # dumped integer ppm (rate_ppm * 2^32 // 1e6 — bit-identical to
        # operators/mixing.threshold_hex) and replay the md5 filter;
        # rate 1e6 is the keep-everything sentinel ('g' > any hex char)
        "unimax_mix": f"""
            WITH thr AS (
              SELECT lang, rate_ppm,
                     CASE WHEN rate_ppm = 1000000 THEN 'g'
                          ELSE lpad(lower(to_hex(
                                 (rate_ppm * 4294967296) // 1000000)),
                               8, '0')
                     END AS t
              FROM read_parquet('{_MIX_DUMP}/*.parquet')
            )
            SELECT d.doc_id, d.lang, thr.rate_ppm
            FROM documents d JOIN thr USING (lang)
            WHERE substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                  < thr.t
        """,
        # independent line derivation (list ops, no chr(10) split), then
        # the full dedup replay: dup-key set, ordered string_agg
        # reassembly, integer-exact char accounting and the 30% kill rule
        "line_dedup": f"""
            WITH toks AS (SELECT doc_id, {tok} AS w FROM documents),
            lined AS (
              SELECT doc_id,
                     list_concat(
                       CASE WHEN doc_id % 3 = 0
                            THEN ['{_LINE_BANNER}'] ELSE [] END,
                     list_concat(
                       list_transform(range(1, len(w) // 8 + 1),
                         i -> array_to_string(w[(i-1)*8+1 : i*8], ' ')),
                     list_concat(
                       CASE WHEN len(w) > (len(w) // 8) * 8
                            THEN [array_to_string(
                                    w[(len(w) // 8) * 8 + 1 : len(w)], ' ')]
                            ELSE [] END,
                       CASE WHEN doc_id % 5 = 0
                            THEN ['{_LINE_FOOTER}'] ELSE [] END))) AS ls
              FROM toks
            ),
            lines AS (
              -- blank slots excluded like the engine's doc_lines (a
              -- whitespace-only doc yields a '' tail line here; counting
              -- it would diverge on n_lines/dup-set/clean_text)
              SELECT doc_id, i AS idx, ls[i] AS line
              FROM (SELECT doc_id, ls,
                           unnest(range(1, len(ls) + 1)) AS i FROM lined)
              WHERE ls[i] <> ''
            ),
            dup AS (
              SELECT md5(line) AS lk FROM lines
              GROUP BY md5(line) HAVING count(DISTINCT doc_id) >= 2
            ),
            fl AS (
              SELECT doc_id, idx, line,
                     md5(line) IN (SELECT lk FROM dup) AS is_dup
              FROM lines
            ),
            agg AS (
              SELECT doc_id,
                     count(*) AS n_lines,
                     count(*) FILTER (WHERE is_dup) AS n_dropped,
                     CAST(sum(length(line)) AS BIGINT) AS chars_total,
                     CAST(coalesce(sum(length(line))
                            FILTER (WHERE is_dup), 0) AS BIGINT)
                       AS chars_dropped,
                     string_agg(CASE WHEN NOT is_dup THEN line END,
                                chr(10) ORDER BY idx) AS clean_text
              FROM fl GROUP BY doc_id
            )
            SELECT l.doc_id,
                   coalesce(a.clean_text, '') AS clean_text,
                   coalesce(a.n_lines, 0) AS n_lines,
                   coalesce(a.n_dropped, 0) AS n_dropped,
                   coalesce(a.chars_total, 0) AS chars_total,
                   coalesce(a.chars_dropped, 0) AS chars_dropped,
                   coalesce(a.chars_dropped, 0) * 10
                     <= coalesce(a.chars_total, 0) * 3 AS kept
            FROM lined l LEFT JOIN agg a USING (doc_id)
        """,
        "training_shards": """
            WITH k AS (
              SELECT doc_id,
                     md5('r6:' || CAST(doc_id AS VARCHAR)) AS hk
              FROM documents
            ),
            a AS (
              SELECT doc_id, hk,
                     CAST(CAST('0x' || substring(hk, 1, 15) AS BIGINT) % 16
                          AS INTEGER) AS shard
              FROM k
            )
            SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY shard
                                      ORDER BY hk, doc_id) AS pos
            FROM a
        """,
        # full ExactSubstr replay: shifted-companion plant, overlapping
        # 8-gram flag set (>=2 distinct docs), covered-position expansion,
        # merged-interval count, ordered string_agg reassembly, the
        # integer-exact 30% kill rule
        "exact_substring_removal": f"""
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 20000000 AS doc_id,
                     array_to_string(
                       list_concat(['intro', 'filler'], ({tok})[1:30]),
                       ' ') AS text
              FROM documents WHERE doc_id % 4 = 0
            ),
            toks AS (SELECT doc_id, {tok} AS w FROM docs),
            g AS (
              SELECT doc_id, i AS start,
                     md5(array_to_string(w[i : i+7], ' ')) AS gk
              FROM (SELECT doc_id, w,
                           unnest(range(1, len(w) - 8 + 2)) AS i
                    FROM toks)
            ),
            dup AS (
              SELECT gk FROM g GROUP BY gk
              HAVING count(DISTINCT doc_id) >= 2
            ),
            st AS (
              SELECT doc_id, start FROM g
              WHERE gk IN (SELECT gk FROM dup)
            ),
            spans AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN prev IS NULL OR start > prev + 7
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
              FROM (SELECT doc_id, start,
                           lag(start) OVER (PARTITION BY doc_id
                                            ORDER BY start) AS prev
                    FROM st)
              GROUP BY doc_id
            ),
            dropped AS (
              SELECT DISTINCT doc_id, unnest(range(start, start + 8)) AS idx
              FROM st
            ),
            tk AS (
              SELECT doc_id, i AS idx, w[i] AS tok
              FROM (SELECT doc_id, w,
                           unnest(range(1, len(w) + 1)) AS i FROM toks)
              WHERE w[i] <> ''
            ),
            per AS (
              SELECT t.doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN d.idx IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dropped,
                     string_agg(CASE WHEN d.idx IS NULL THEN t.tok END,
                                ' ' ORDER BY t.idx) AS clean_text
              FROM tk t
              LEFT JOIN dropped d ON t.doc_id = d.doc_id AND t.idx = d.idx
              GROUP BY t.doc_id
            )
            SELECT b.doc_id,
                   coalesce(p.clean_text, '') AS clean_text,
                   coalesce(p.n_tokens, 0) AS n_tokens,
                   coalesce(p.n_dropped, 0) AS n_dropped,
                   coalesce(s.n_spans, 0) AS n_spans,
                   coalesce(p.n_dropped, 0) * 10
                     <= coalesce(p.n_tokens, 0) * 3 AS kept
            FROM (SELECT doc_id FROM docs) b
            LEFT JOIN per p ON b.doc_id = p.doc_id
            LEFT JOIN spans s ON b.doc_id = s.doc_id
        """,
        # exact next-fit replay: md5 shard/pos permutation, then a
        # recursive CTE carries (bin, fill) along each shard's pos walk —
        # one iteration per pos level, all shards advance in lockstep
        "sequence_packing": f"""
            WITH RECURSIVE base AS (
              SELECT doc_id,
                     CAST(len(list_filter({tok}, x -> x <> ''))
                          AS BIGINT) AS n_tokens,
                     md5('pack:' || CAST(doc_id AS VARCHAR)) AS hk
              FROM documents
            ),
            sh AS (
              SELECT doc_id, n_tokens, hk,
                     CAST(CAST('0x' || substring(hk, 1, 15) AS BIGINT) % 8
                          AS INTEGER) AS shard
              FROM base
            ),
            ordered AS (
              SELECT doc_id, n_tokens, shard,
                     CAST(row_number() OVER (PARTITION BY shard
                                             ORDER BY hk, doc_id)
                          AS BIGINT) AS pos
              FROM sh
            ),
            walk AS (
              SELECT shard, pos, doc_id, n_tokens,
                     CAST(1 AS BIGINT) AS bin,
                     CAST(0 AS BIGINT) AS bin_offset,
                     n_tokens AS fill
              FROM ordered WHERE pos = 1
              UNION ALL
              SELECT o.shard, o.pos, o.doc_id, o.n_tokens,
                     CASE WHEN w.fill + o.n_tokens <= 200
                          THEN w.bin ELSE w.bin + 1 END,
                     CASE WHEN w.fill + o.n_tokens <= 200
                          THEN w.fill ELSE CAST(0 AS BIGINT) END,
                     CASE WHEN w.fill + o.n_tokens <= 200
                          THEN w.fill + o.n_tokens ELSE o.n_tokens END
              FROM walk w
              JOIN ordered o ON o.shard = w.shard AND o.pos = w.pos + 1
            )
            SELECT doc_id, shard, pos, n_tokens, bin, bin_offset,
                   n_tokens > 200 AS oversize
            FROM walk
        """,
    }
