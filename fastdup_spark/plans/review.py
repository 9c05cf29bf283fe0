"""Human-review round-trip for duplicate decisions — the text analog of
the reference's CVAT annotation-tool integration
(/root/reference/fastdup/cvat.py:1-302: export image tasks into a labeling
tool, then re-import the completed annotations into the pipeline).

Here the review unit is a candidate duplicate PAIR. The loop:

  1. ``export_review_tasks`` writes the decision band of scored pairs
     (both texts + urls + the scored jaccard + the model's suggested
     verdict) as Label-Studio-style task JSON — one task object per line,
     the LS "JSON tasks" import format: ``{"id": ..., "data": {...}}``.
     The write is a distributed Spark JSON sink (no driver collect), so a
     100-TB run can export its full decision band; ``limit`` bounds it to
     the strongest N pairs via TakeOrderedAndProject when a head is all a
     review team can process. doc_ids are exported as STRINGS — they are
     64-bit hashes and JSON consumers (labeling UIs run on JS doubles)
     corrupt int64 precision.
  2. A human marks each pair ``duplicate`` / ``not_duplicate``.
  3. ``read_review_results`` ingests either the completed Label-Studio
     export (``annotations[].result[].value.choices``) or a flat
     ``{"src","dst","verdict"}`` JSONL, normalizing to one verdict per
     canonical (src<dst) pair.
  4. ``apply_review`` persists the verdicts as the ``review_overrides``
     stage table (newest verdict wins per pair).
  5. ``reviewed_components`` re-resolves connected components with the
     overrides applied: rejected edges are removed, confirmed pairs add
     edges even when scored below ``cc_threshold`` — so human review
     corrects both false positives and false negatives of the automatic
     clustering.

All joins against the overrides broadcast the (human-review-sized) verdict
table; the pair table is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERDICTS = ("duplicate", "not_duplicate")
REVIEW_TABLE = "review_overrides"


def _band_pairs(fd, lo: float | None, hi: float | None,
                limit: int | None) -> DataFrame:
    """Scored pairs in the [lo, hi) jaccard decision band, strongest first
    when limited (TakeOrderedAndProject, not a global sort)."""
    pairs = fd.store.read(fd.spark, "pairs_scored")
    if lo is not None:
        pairs = pairs.filter(F.col("jaccard") >= lo)
    if hi is not None:
        pairs = pairs.filter(F.col("jaccard") < hi)
    if limit is not None:
        pairs = pairs.orderBy(F.desc("jaccard"), "src", "dst").limit(limit)
    return pairs


def export_review_tasks(fd, path: str, lo: float | None = None,
                        hi: float | None = None,
                        limit: int | None = None) -> int:
    """Write Label-Studio-style review tasks for the decision band.

    Default band: everything within 0.1 below the clustering threshold and
    up — the pairs where a human verdict can actually flip an edge. Returns
    the number of tasks written.
    """
    cfg = fd.config
    if lo is None:
        lo = max(0.0, cfg.cc_threshold - 0.1)
    pairs = _band_pairs(fd, lo, hi, limit)
    docs = fd.docs().select("doc_id", "url", "text")
    lcs = None
    try:
        lcs = fd.store.read(fd.spark, "containment") \
            .select("src", "dst", "lcs_len")
    except Exception:
        pass  # lcs disabled / stage absent — tasks just omit the field
    tasks = (
        pairs.join(docs.select(F.col("doc_id").alias("src"),
                               F.col("url").alias("url_a"),
                               F.col("text").alias("text_a")), "src")
             .join(docs.select(F.col("doc_id").alias("dst"),
                               F.col("url").alias("url_b"),
                               F.col("text").alias("text_b")), "dst")
    )
    if lcs is not None:
        tasks = tasks.join(lcs, ["src", "dst"], "left")
    else:
        tasks = tasks.withColumn("lcs_len", F.lit(None).cast("long"))
    out = tasks.select(
        F.concat_ws(":", F.col("src").cast("string"),
                    F.col("dst").cast("string")).alias("id"),
        F.struct(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
            "url_a", "url_b", "text_a", "text_b",
            F.round("jaccard", 6).alias("jaccard"),
            "lcs_len",
            F.when(F.col("jaccard") >= cfg.cc_threshold, "duplicate")
             .otherwise("review").alias("predicted"),
        ).alias("data"),
    )
    out = out.localCheckpoint(eager=True)
    out.write.mode("overwrite").json(path)
    # count the pinned frame — re-reading the written JSON would pay a
    # schema-inference pass over every text payload just to count rows
    return out.count()


def read_review_results(spark: SparkSession, path: str) -> DataFrame:
    """Completed review -> (src, dst, verdict) with canonical src<dst.

    Accepts BOTH shapes on the same path:
      * Label-Studio completed-task export: the task's ``data.src/dst``
        plus ``annotations[].result[].value.choices[0]`` (the LAST
        annotation wins, matching LS overwrite semantics);
      * flat JSONL: ``{"src": ..., "dst": ..., "verdict": ...}``.
    """
    raw = spark.read.json(path)
    cols = set(raw.columns)
    if "verdict" in cols:
        out = raw.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
            F.col("verdict").cast("string").alias("verdict"))
    elif "annotations" in cols and "data" in cols:
        last_ann = F.element_at(F.col("annotations"), -1)
        choice = F.element_at(
            F.element_at(last_ann.getField("result"), 1)
            .getField("value").getField("choices"), 1)
        out = raw.select(
            F.col("data.src").cast("bigint").alias("src"),
            F.col("data.dst").cast("bigint").alias("dst"),
            choice.cast("string").alias("verdict"))
    else:
        raise ValueError(
            f"unrecognized review-results schema: {sorted(cols)} — expected "
            "either a flat src/dst/verdict JSONL or a Label-Studio "
            "completed-task export (data + annotations)")
    # NULL-safe: ~NULL.isin(...) is NULL under three-valued logic and
    # would slip past the filter — a task with an empty annotations list
    # must fail validation, not vanish silently
    bad = out.filter(F.col("verdict").isNull()
                     | ~F.col("verdict").isin(*VERDICTS)
                     | F.col("src").isNull() | F.col("dst").isNull())
    first_bad = bad.head(1)
    if first_bad:
        raise ValueError(f"invalid review row: {first_bad[0].asDict()} — "
                         f"verdict must be one of {VERDICTS}")
    return out.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "verdict",
    ).dropDuplicates(["src", "dst"])


def apply_review(fd, verdicts: DataFrame) -> int:
    """Persist verdicts into the ``review_overrides`` stage table.

    Newest verdict wins per pair: existing rows for re-reviewed pairs are
    replaced. Returns the total override count after the merge."""
    verdicts = verdicts.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "verdict").dropDuplicates(["src", "dst"]) \
        .localCheckpoint(eager=True)
    try:
        old = fd.store.read(fd.spark, REVIEW_TABLE)
        merged = old.join(F.broadcast(verdicts.select("src", "dst")),
                          ["src", "dst"], "left_anti") \
            .unionByName(verdicts).localCheckpoint(eager=True)
    except Exception:
        merged = verdicts
    fd.store.write_table(merged, REVIEW_TABLE)
    fd.store.refresh_marker(REVIEW_TABLE, fd._chash)
    return fd.store.read_marker(REVIEW_TABLE)["rows"]


def override_edges(edges: DataFrame, rejected: DataFrame,
                   confirmed: DataFrame) -> DataFrame:
    """The override edge algebra, storeless form (oracle-checked by the
    driver query ``review_override_components``): (edges ∖ rejected) ∪
    confirmed, canonical src<dst assumed on all three inputs. A pair
    carrying both verdicts resolves to confirmed (the union re-adds it)."""
    return (
        edges.join(F.broadcast(rejected), ["src", "dst"], "left_anti")
             .unionByName(confirmed)
             .dropDuplicates(["src", "dst"])
    )


def reviewed_edges(fd) -> DataFrame:
    """Clustering edge set with human overrides applied: automatic edges
    (jaccard >= cc_threshold) minus rejected pairs, plus confirmed pairs
    (even those scored below the threshold)."""
    cfg = fd.config
    edges = fd.store.read(fd.spark, "pairs_scored") \
        .filter(F.col("jaccard") >= cfg.cc_threshold).select("src", "dst")
    try:
        ov = fd.store.read(fd.spark, REVIEW_TABLE)
    except Exception:
        return edges
    rejected = ov.filter(F.col("verdict") == "not_duplicate") \
        .select("src", "dst")
    confirmed = ov.filter(F.col("verdict") == "duplicate") \
        .select("src", "dst")
    return override_edges(edges, rejected, confirmed)


def reviewed_components(fd, include_singletons: bool = False) -> DataFrame:
    """components() recomputed over the override-corrected edge set:
    (doc_id, component_id, count, url). A rejected bridge edge splits its
    component; a confirmed below-threshold pair merges one."""
    from fastdup_spark.operators.cc import connected_components
    asg = connected_components(reviewed_edges(fd),
                               vertices=fd.docs().select("doc_id"))
    info = asg.groupBy("component_id").agg(F.count("*").alias("count"))
    df = asg.join(F.broadcast(info.filter(
        F.col("count") >= (1 if include_singletons else 2))), "component_id")
    return df.join(fd.docs().select("doc_id", "url"), "doc_id")
