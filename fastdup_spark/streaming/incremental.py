"""Incremental (batch-over-snapshot) updates — the streaming analog.

The reference has no streaming operators; its closest analogs are the
`resume` flag, sharded extraction offsets, and `search()` against a prebuilt
index (SURVEY §2.8). For webtext the natural shape is incremental batches of
new WARC pages, keyed by a `warc_ts` high-water mark:

  * docs/signatures/buckets for NEW pages only (append to stage tables);
  * candidate pairs = new-doc band hashes joined against the FULL bucket
    index (so new docs pair with both old and new docs) — the same plan a
    Structured Streaming foreachBatch sink would run;
  * verify on the new pairs only (append to pairs_scored/similarity);
  * connected components re-resolved globally over the edge table (edges are
    tiny relative to the corpus; at 10^12-doc scale this global step is the
    documented cost of exact cluster semantics under insertion).

This gives exactly-once semantics per batch via the stage-store markers: a
batch id (the new high-water mark) stamps each appended increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdup_spark.functions.extract import split_extracted
from fastdup_spark.functions.signatures import with_signatures
from fastdup_spark.functions.similarity import exact_jaccard_expr, hamming_expr, sig_jaccard_expr
from fastdup_spark.operators.cc import connected_components
from fastdup_spark.operators.lsh import band_buckets


def high_water_mark(docs: DataFrame, ts_col: str = "warc_ts"):
    """Latest ingested event time (resume cursor)."""
    return docs.agg(F.max(ts_col).alias("hwm")).collect()[0]["hwm"]


def incremental_update(fd, new_pages: DataFrame) -> dict:
    """Ingest a new batch of pages into an existing FastdupSpark work_dir.

    Only rows with warc_ts strictly greater than the current high-water mark
    are processed (idempotent re-delivery safe). Returns counters.
    """
    cfg = fd.config
    spark = fd.spark
    store = fd.store

    docs_old = fd.docs()
    hwm = high_water_mark(docs_old)
    fresh = new_pages.filter(F.col("warc_ts") > F.lit(hwm)) if hwm else new_pages

    ok, bad = split_extracted(fresh, cfg.min_text_chars)
    new_docs = ok.withColumn("doc_id", F.xxhash64("url")).select(
        "doc_id", "url", "warc_ts", "lang", "text")
    # drop urls already ingested (idempotency on replays)
    new_docs = new_docs.join(docs_old.select("doc_id"), "doc_id", "left_anti")
    n_new = new_docs.count()
    if n_new == 0:
        return {"new_docs": 0, "new_pairs": 0, "hwm": str(hwm)}
    new_docs = new_docs.localCheckpoint(eager=True)
    n_new_bad = bad.count()

    new_sigs = with_signatures(new_docs, cfg).select(
        "doc_id", "minhash", "simhash", "shingles", "n_shingles"
    ).localCheckpoint(eager=True)
    new_buckets = band_buckets(new_sigs, cfg.lsh_bands, cfg.lsh_rows) \
        .withColumn("salt", F.lit(0))

    # probe: new docs vs the FULL index (old buckets ∪ new buckets)
    old_buckets = store.read(spark, "buckets")
    all_buckets = old_buckets.select("doc_id", "band_id", "bucket") \
        .unionByName(new_buckets.select("doc_id", "band_id", "bucket"))
    cand = (
        new_buckets.select("band_id", "bucket", F.col("doc_id").alias("a"))
        .join(all_buckets.select("band_id", "bucket", F.col("doc_id").alias("b")),
              ["band_id", "bucket"])
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    # drop pairs already scored
    old_scored = store.read(spark, "pairs_scored")
    cand = cand.join(old_scored.select("src", "dst"), ["src", "dst"], "left_anti")

    all_sigs_narrow = store.read(spark, "signatures") \
        .select("doc_id", "minhash", "simhash", "shingles") \
        .unionByName(new_sigs.select("doc_id", "minhash", "simhash", "shingles"))
    scored_new = (
        cand
        .join(all_sigs_narrow.select(F.col("doc_id").alias("src"),
                                     F.col("minhash").alias("mh_a"),
                                     F.col("simhash").alias("sh_a"),
                                     F.col("shingles").alias("g_a")), "src")
        .join(all_sigs_narrow.select(F.col("doc_id").alias("dst"),
                                     F.col("minhash").alias("mh_b"),
                                     F.col("simhash").alias("sh_b"),
                                     F.col("shingles").alias("g_b")), "dst")
        .withColumn("sig_jaccard", sig_jaccard_expr(F.col("mh_a"), F.col("mh_b")))
        .filter(F.col("sig_jaccard") >= cfg.sig_jaccard_prefilter)
        .withColumn("hamming", hamming_expr(F.col("sh_a"), F.col("sh_b")))
        .withColumn("jaccard", exact_jaccard_expr(F.col("g_a"), F.col("g_b")))
        .select("src", "dst", "sig_jaccard", "hamming", "jaccard")
        .localCheckpoint(eager=True)
    )
    n_pairs = scored_new.count()

    # append increments to the stage tables
    new_extracted = new_docs.select(
        "doc_id", "url", "warc_ts", "lang", "text",
        F.lit("").alias("error_code"), F.lit(True).alias("is_valid"),
    ).unionByName(bad.select(
        F.xxhash64("url").alias("doc_id"), "url", "warc_ts", "lang",
        F.lit(None).cast("string").alias("text"),
        "error_code", F.lit(False).alias("is_valid"),
    ))
    new_extracted.write.mode("append").format(store.fmt) \
        .partitionBy("is_valid").save(store.table_path("extracted"))
    counts = store.read_json("extract_counts") or {"valid": 0, "bad": 0}
    store.write_json({"valid": counts["valid"] + int(n_new),
                      "bad": counts["bad"] + int(n_new_bad)}, "extract_counts")
    for stage, df in [
        ("signatures", new_sigs),
        ("buckets", new_buckets),
        ("pairs_scored", scored_new),
        ("similarity", scored_new.filter(F.col("jaccard") >= cfg.threshold)
                                 .select("src", "dst", "jaccard", "sig_jaccard", "hamming")),
    ]:
        df.write.mode("append").format(store.fmt).save(store.table_path(stage))

    # global re-resolution of components over the (small) edge table
    edges = store.read(spark, "pairs_scored") \
        .filter(F.col("jaccard") >= cfg.cc_threshold).select("src", "dst")
    docs_all = fd.docs()
    asg = connected_components(edges, vertices=docs_all.select("doc_id"))
    store.write(asg, "assignments", fd._chash)
    info = asg.groupBy("component_id").agg(F.count("*").alias("count"))
    store.write(info, "component_info", fd._chash)

    return {"new_docs": int(n_new), "new_pairs": int(n_pairs),
            "hwm": str(high_water_mark(docs_all))}
